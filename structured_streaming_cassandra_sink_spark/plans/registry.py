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
# queries per round. Round-7 rotation (r6 verdict "Next round" #1-#3):
#
# Slots 1-10: the LAST never-driver-seen queries — after this round
#   every one of the 300 registered components has driver evidence.
#   sim_search_pq_adc is rows-only (no oracle) and takes the driver's
#   weaker rows-only check; its oracle-hashed companion
#   ann_recall_report went green in r4.
# Slots 11-19: the nine converted float-kernel stat queries (r7 purge:
#   engine corr/covar/stddev/regr/skew/kurt kernels -> quantized exact
#   int64 moments + shared double expressions) — fresh rows for the
#   new contracts, retiring the only driver-FAIL class ever recorded
#   (r5 heaps_law_fit).
# Slots 20-22: the three r6-converted queries whose contracts hardened
#   this round per ADVICE (hi/lo carrier replaces DECIMAL/HUGEINT,
#   widen-before-multiply, degenerate-group guards).
# Slots 23-27: NEW streaming-evidence rows that EXECUTE the streaming
#   engine to convergence (update-mode PK-upsert — the reference's
#   exact shape — dropDuplicatesWithinWatermark, the custom
#   applyInPandasWithState accumulator, the quarantine bad-records
#   split, and append-mode closed-window emission),
#   streaming/stream_rows.py.
# Slots 28-34: the sum_exact/avg_exact/cusum users whose shared carrier
#   switched from DECIMAL(38,0)/HUGEINT to hi/lo int64 this round.
# Slots 35-50: evidence refresh — the queries whose only driver rows
#   date from r1, oldest first in registry order.
_PRIORITY_THIS_ROUND = [
    # -- never-seen (1-10)
    "kmeans_lloyd",
    "pq_encode",
    "dbscan_grid_clusters",
    "countmin_sketch_report",
    "geo_grid_hotspots",
    "geo_radius_join",
    "geo_knn_within_radius",
    "stream_tumbling_distinct",
    "stream_enrich_static",
    "sim_search_pq_adc",
    # -- r7 kernel-purge conversions (11-19)
    "column_corr",
    "regression_agg",
    "moments_agg",
    "zipf_fit",
    "anomaly_rolling_z",
    "groupwise_zscore_pandas",
    "incremental_stats_merge",
    "embedding_dim_stats",
    "pca_variance_report",
    # -- ADVICE-hardened contracts (20-22)
    "ttest_welch",
    "cuped_adjustment",
    "delta_method_ratio_ci",
    # -- new streaming-execution rows (23-27)
    "stream_update_upsert_state",
    "stream_dedup_watermark",
    "stream_running_totals_state",
    "stream_quarantine_audit",
    "stream_append_closed_windows",
    # -- hi/lo carrier-swap users (28-34)
    "groupby_agg",
    "grouping_sets",
    "cube_agg",
    "rollup_agg",
    "join_skew_salted",
    "conditional_agg",
    "cusum_changepoint",
    # -- oldest-evidence refresh, r1-only rows (35-50)
    "flagship_latest_event_per_user",
    "scan_project_cast",
    "filter_predicate",
    "json_extract",
    "split_explode",
    "date_derive",
    "dedup_by_key",
    "join_inner_broadcast",
    "join_left",
    "join_semi",
    "join_anti",
    "join_range",
    "pivot_agg",
    "unpivot_melt",
    "map_ops",
    "join_null_safe",
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
