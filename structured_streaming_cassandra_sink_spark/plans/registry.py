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
# queries per round. Round-8 rotation (r7 verdict "Next round" #2-#3):
#
# Slots 1-2: NEW executed stream-stream join evidence — real
#   StreamingQueries join the views stream to the clicks stream across
#   micro-batches (streaming/stream_rows.py): the INNER interval join
#   (cross-batch state matching) and the LEFT OUTER variant
#   (watermark-driven expiry emission) — the one major streaming
#   operator class that previously had only batch-twin + pytest
#   evidence.
# Slots 3-23: ALL 21 queries whose only driver rows date from round 1
#   (oldest evidence in the ledger).
# Slots 24-50: 27 of the 46 queries whose newest rows date from round 2,
#   float-contract-bearing ones first (rounded aggregates, distance
#   argmins, ratio scores — the class the r5 heaps_law_fit driver-env
#   flip proved needs freshest evidence), then structural ones.
#
# Remaining refresh debt after this round (19 r2-only rows, all
# exact-contract — strings, int64 counts, md5 hash-bucket sampling,
# rows-only multimodal — the lowest driver-env flip risk; r9 slots):
#   fixed_size_sample, length_histogram, multimodal_cols,
#   multimodal_decode, multimodal_dedup, multimodal_frame_sample,
#   multimodal_resize, negative_sample, ngram_counts,
#   repetition_filter, scalar_string_math, sequence_packing,
#   source_budget_sample, stratified_sample, text_clean,
#   text_pii_scrub, token_count, train_val_split,
#   doc_winnow_fingerprint (bumped for the left-outer join slot; its
#   winnowing machinery is also evidenced by winnow_dup_pairs, r3+)
_PRIORITY_THIS_ROUND = [
    # -- new executed stream-stream joins (1-2)
    "stream_stream_funnel_join",
    "stream_stream_left_join_expiry",
    # -- r1-only evidence refresh (3-23)
    "dedup_cluster_assign",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "exact_percentiles",
    "lang_id_heuristic",
    "quality_score",
    "scalar_date_funcs",
    "set_except",
    "set_intersect",
    "set_union",
    "sim_search_ann_ivf",
    "sim_search_ann_lsh",
    "sim_search_topk",
    "sort_limit_topk",
    "text_stats",
    "window_distribution",
    "window_frame",
    "window_lag_lead",
    "window_rank",
    # -- r2-only refresh, float-contract first (24-50)
    "bm25_score",
    "lm_score",
    "outlier_mad",
    "word_pmi",
    "tfidf_top_terms",
    "quality_quantile_filter",
    "text_stats_by_lang",
    "table_profile",
    "time_rollup",
    "join_multiway_revenue",
    "join_interval_funnel",
    "join_asof",
    "window_range_interval",
    "multimodal_meta_agg",
    "embedding_cluster_assign",
    "source_overlap_matrix",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "sessionize_assign",
    "heavy_hitters",
    "join_full_outer",
    "contamination_check",
    "curation_pipeline",
    "dedup_incremental",
    "doc_chunking",
    "doc_fingerprint",
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

    missing = set(_PRIORITY_THIS_ROUND) - set(QUERIES)
    if missing:
        # A typo here silently burns one of the 50 driver-evidence slots
        # the round's budget depends on (ADVICE r4) — fail loudly instead.
        raise AssertionError(
            f"_PRIORITY_THIS_ROUND names unknown queries: {sorted(missing)}"
        )
    front = {n: QUERIES[n] for n in _PRIORITY_THIS_ROUND}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)
