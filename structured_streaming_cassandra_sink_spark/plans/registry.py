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
# queries (round 1: CORRECTNESS_r01.json truncated at 50 of 71, leaving 21
# queries with no driver signal). Until every query has had a green driver
# row, rotate: the names below register FIRST this round — the 21 queries
# the round-1 file never reached, plus the 3 whose oracles were fixed this
# round and need a fresh green row. Rotate again next round if any query
# still lacks a row.
# flagship_latest_event_per_user already has a green r1 row — dropped from
# the priority rotation to stay within the driver's 50-row cap.
_PRIORITY_THIS_ROUND = [
    # round-1 hash FAILs, oracles fixed in round 2 — need green rows
    "scalar_string_math",
    "text_stats_by_lang",
    "token_count",
    # the 21 queries with no CORRECTNESS_r01 row (driver cap), r1 order
    "doc_fingerprint",
    "doc_winnow_fingerprint",
    "text_clean",
    "text_pii_scrub",
    "multimodal_cols",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_meta_agg",
    "multimodal_resize",
    "train_val_split",
    "stratified_sample",
    "curation_pipeline",
    "dedup_incremental",
    "doc_chunking",
    "sequence_packing",
    "fixed_size_sample",
    "join_asof",
    "join_interval_funnel",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    # new in round 2 — no driver row yet
    "tfidf_top_terms",
    "ngram_counts",
    "embedding_centroid",
    "quality_quantile_filter",
    "multimodal_dedup",
    "contamination_check",
    "repetition_filter",
    "source_budget_sample",
    # upgraded rows-only -> oracle in round 2; needs a green oracle row
    "groupwise_zscore_pandas",
    "join_multiway_revenue",
    "embedding_quantize",
    "source_overlap_matrix",
    "window_range_interval",
    "sessionize_assign",
    "heavy_hitters",
    "bm25_score",
    "word_pmi",
    "embedding_cluster_assign",
    "time_rollup",
    "join_full_outer",
    "outlier_mad",
    "table_profile",
    "embedding_dim_stats",
    "length_histogram",
    "negative_sample",
    "lm_score",
    "tokenize_to_ids",
    "cube_agg",
    # late round-2 adds — anything past the driver's 50-row cap spills to
    # the round-3 rotation (the cap cuts this list at 50 in order)
    "join_shipping_priority",
    "column_corr",
    "array_ops",
    "source_entropy",
    "winnow_dup_pairs",
    "gap_fill",
    "running_distinct",
    "string_agg_ordered",
    "anomaly_rolling_z",
    "udtf_sentence_split",
    "regression_agg",
    "ohlc_bars",
    "time_weighted_avg",
    "embedding_pca_project",
    "subquery_exists",
    "subquery_correlated_scalar",
    "window_ntile",
    "median_by_group",
    "argminmax_agg",
    "shingle_containment",
    "edit_distance_pairs",
    "skew_profile",
    "histogram_width_bucket",
    "boolean_agg",
    "topk_per_group_agg",
    "zorder_cluster",
    "mode_by_group",
    "gaps_islands",
    "retention_cohort",
    "share_of_group",
    "dup_graph_degree",
    "dedup_rate_by_source",
    "dedup_pipeline_keep_canonical",
    "mixture_interleave",
    "order_count_distribution",
    "moments_agg",
    "set_intersect_all",
    "set_except_all",
    "try_functions",
    "join_shuffle_hash_hint",
    "data_freshness_report",
    "funnel_conversion_rate",
    "dup_graph_triangles",
    "hll_partial_merge",
    "first_last_nonnull",
    "edit_distance_clusters",
    "incremental_stats_merge",
    "variant_ops",
    "session_chain_recursive",
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
    )
    from ..streaming import batch_equiv  # noqa: F401

    front = {n: QUERIES[n] for n in _PRIORITY_THIS_ROUND if n in QUERIES}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)
