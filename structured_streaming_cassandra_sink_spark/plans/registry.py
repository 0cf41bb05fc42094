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
# queries per round. Round-9 rotation (r8 verdict "Next round" #1/#3/#4):
#
# Slot 1: stream_stream_funnel_join RE-DERIVED with a bounded watermark
#   (r8 verdict #3 — the r8 row ran with a 3650-day watermark, i.e.
#   unbounded state, the one configuration that cannot scale; the
#   re-derivation needs a fresh driver row because bounded expiry
#   changes the emission contract).
# Slots 2-20: ALL 19 queries whose newest driver rows date from round 2
#   (the enumerated r8 refresh debt — retired completely this round).
# Slots 21-22: zipf_fit + heaps_law_fit — their ln() libm kernel was
#   replaced by the shared-series expansion this round (r8 verdict #4),
#   so the kernel-free contract gets driver evidence the same round it
#   lands.
# Slots 23-50: 28 of the 44 queries whose newest rows date from round 3,
#   float-contract-bearing ones first (rounded aggregates, ratios,
#   distances, entropy — the class the r5 heaps_law_fit driver-env flip
#   proved needs freshest evidence), then structural ones.
#
# Remaining refresh debt after this round (16 r3 rows, all
# exact-contract or repeatedly pytest-pinned — the lowest flip risk;
# r10 slots): array_ops, boolean_agg, dup_graph_degree,
#   dup_graph_triangles, first_last_nonnull, gaps_islands,
#   mixture_interleave, running_distinct, string_agg_ordered,
#   subquery_exists, tokenize_to_ids, try_functions,
#   udtf_sentence_split, variant_ops, window_ntile,
#   dedup_pipeline_keep_canonical
_PRIORITY_THIS_ROUND = [
    # -- re-derived bounded-watermark stream-stream join (1)
    "stream_stream_funnel_join",
    # -- r2-only evidence refresh, retired completely (2-20)
    "doc_winnow_fingerprint",
    "fixed_size_sample",
    "length_histogram",
    "multimodal_cols",
    "multimodal_decode",
    "multimodal_dedup",
    "multimodal_frame_sample",
    "multimodal_resize",
    "negative_sample",
    "ngram_counts",
    "repetition_filter",
    "scalar_string_math",
    "sequence_packing",
    "source_budget_sample",
    "stratified_sample",
    "text_clean",
    "text_pii_scrub",
    "token_count",
    "train_val_split",
    # -- libm-kernel retirement lands with fresh rows (21-22)
    "zipf_fit",
    "heaps_law_fit",
    # -- r3 refresh, float-contract first (23-50)
    "time_weighted_avg",
    "share_of_group",
    "source_entropy",
    "skew_profile",
    "retention_cohort",
    "funnel_conversion_rate",
    "median_by_group",
    "dedup_rate_by_source",
    "data_freshness_report",
    "order_count_distribution",
    "ohlc_bars",
    "gap_fill",
    "embedding_centroid",
    "embedding_quantize",
    "embedding_pca_project",
    "shingle_containment",
    "dedup_near_minhash",
    "edit_distance_pairs",
    "edit_distance_clusters",
    "histogram_width_bucket",
    "hll_partial_merge",
    "subquery_correlated_scalar",
    "mode_by_group",
    "zorder_cluster",
    "winnow_dup_pairs",
    "argminmax_agg",
    "join_shipping_priority",
    "topk_per_group_agg",
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
