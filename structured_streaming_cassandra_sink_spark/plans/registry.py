"""Query registry — the driver-facing operator surface.

Each implemented operator from SURVEY.md §2.3 registers here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string. ``__spark_entry__.py`` exposes these via ``queries()`` /
``oracle_sql()``.

Contract reminders (driver compare, __spark_entry__.py docstring):
- Columns are sorted by NAME before value hashing — every computed column
  must carry the SAME alias in the Spark plan and the oracle SQL.
- Floating aggregates are rounded identically on both sides so partial-
  aggregation order (Spark) vs sequential order (DuckDB) cannot flip bits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries with ``oracle=None`` get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: LSH banding, pandas-UDF
    surfaces, approximate sketches whose value differs by implementation).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver records correctness rows for only the FIRST 50 registered
# queries per round.
#
# Round-10 rotation (optimization round): slots 1-16 retire the LAST of
# the r3 evidence-refresh debt (r9 verdict "Next round" #1 — after this
# round no registered query's newest driver row predates r4); slots 17-50
# are the queries whose PLANS this optimization round restructured
# (vectorized LSH verify, broadcast-centroid kmeans, materialized-edge
# recursion, collect_set pair generation, shingle pipeline, spread
# percentile inputs, eager=False iterative checkpoints) — each lands a
# fresh driver row in the same round its plan changed, the zipf/heaps
# convert-on-evidence discipline applied to plan shape.
_PRIORITY_R10 = [
    # -- r3 refresh debt, retired completely (1-16)
    "array_ops",
    "boolean_agg",
    "dup_graph_degree",
    "dup_graph_triangles",
    "first_last_nonnull",
    "gaps_islands",
    "mixture_interleave",
    "running_distinct",
    "string_agg_ordered",
    "subquery_exists",
    "tokenize_to_ids",
    "try_functions",
    "udtf_sentence_split",
    "variant_ops",
    "window_ntile",
    "dedup_pipeline_keep_canonical",
    # -- r10 restructured plans (17-50)
    "dedup_embedding_lsh",
    "kmeans_lloyd",
    "session_chain_recursive",
    "winnow_dup_pairs",
    "market_basket_pairs",
    "graph_sssp_weighted",
    "graph_kcore",
    "graph_assortativity",
    "link_prediction_adamic_adar",
    "knn_classify_eval",
    "tfidf_cosine_pairs",
    "dedup_ngram_jaccard",
    "shingle_containment",
    "dedup_near_minhash",
    "minhash_recall_report",
    "heavy_hitters",
    "winsorize_clip",
    "exact_percentiles",
    "approx_quantiles",
    "ngram_novelty_score",
    "contamination_check",
    "graph_hits_bipartite",
    "dbscan_grid_clusters",
    "dedup_cluster_assign",
    "dup_graph_bfs_depth",
    "dup_graph_pagerank",
    "edit_distance_clusters",
    "doc_winnow_fingerprint",
    "source_overlap_matrix",
    "sequence_packing",
    "skyline_pareto",
    "late_data_audit",
    "surrogate_key_assign",
    "pq_encode",
]

def load_all() -> None:
    """Import every module that registers queries (idempotent), then
    rotate this round's priority queries to the front of the registry
    (dict insertion order is what the driver sees)."""
    from . import flagship  # noqa: F401
    from ..operators import (  # noqa: F401
        relational,
        windows,
        setops,
        scalar,
        dedup,
        similarity,
        text,
        multimodal,
        curation,
        timeseries,
        mleval,
        clustering,
        sketches,
        geo,
    )
    from ..streaming import batch_equiv, stream_rows  # noqa: F401

    missing = set(_PRIORITY_R10) - set(QUERIES)
    if missing:
        # A typo here silently burns one of the 50 driver-evidence slots
        # the round's budget depends on (ADVICE r4) — fail loudly instead.
        raise AssertionError(
            f"_PRIORITY_R10 names unknown queries: {sorted(missing)}"
        )
    front = {n: QUERIES[n] for n in _PRIORITY_R10}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)
