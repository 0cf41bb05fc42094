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
# queries per round. Round-6 rotation: slot 1 is the heaps_law_fit
# RE-ROW — its r5 driver row was the project's first FAIL (engine regr_*
# kernel ulps flipping a round(,6) boundary in the driver environment;
# every local sweep was green) and its contract was rebuilt this round as
# quantized-int64 OLS moments + one shared double expression
# (operators/text.py, bit-identical across engines by construction, pinned
# by a pure-IEEE replay test). Slots 2-50 continue the committed rotation
# debt in registry order (r4 verdict "Next round" #1).
#
# ROUND-7 ROTATION DEBT — the 9 never-driver-seen oracle queries left
# after this round's front-50 (operator additions stay FROZEN until the
# debt clears; round 7 finishes it with 41 slots to spare):
#   kmeans_lloyd, pq_encode, dbscan_grid_clusters,
#   countmin_sketch_report, geo_grid_hotspots, geo_radius_join,
#   geo_knn_within_radius, stream_tumbling_distinct,
#   stream_enrich_static,
# plus the lone rows-only unseen query sim_search_pq_adc (excluded from
# any front-50 by the "hash-checkable only" rule; its oracle-checked
# companion ann_recall_report went driver-green in r4).
_PRIORITY_THIS_ROUND = [
    "heaps_law_fit",
    "dau_wau_stickiness",
    "holt_linear_smooth",
    "running_balance_floor",
    "conformal_forecast_interval",
    "var_cvar_report",
    "late_data_audit",
    "cohort_ltv_curve",
    "join_asof_nearest",
    "time_decay_attribution",
    "sax_encode",
    "mann_kendall_trend_test",
    "pinball_loss_eval",
    "survival_c_index",
    "roc_auc",
    "gini_lorenz",
    "ks_statistic",
    "calibration_bins",
    "psi_drift",
    "target_encode_smoothed",
    "chi2_independence",
    "feature_hash",
    "jackknife_ci",
    "confusion_report",
    "lift_band_report",
    "ttest_welch",
    "mutual_information",
    "cramers_v",
    "hhi_concentration",
    "quantile_normalize",
    "winsorize_clip",
    "bootstrap_ci_poisson",
    "sprt_sequential_test",
    "emd_drift",
    "spearman_corr",
    "kendall_tau",
    "anova_oneway",
    "cohens_kappa",
    "pr_auc",
    "log_loss_brier",
    "naive_bayes_train",
    "naive_bayes_score",
    "isotonic_calibration",
    "cuped_adjustment",
    "delta_method_ratio_ci",
    "feature_info_gain",
    "qini_uplift_curve",
    "kruskal_wallis",
    "levene_brown_forsythe",
    "brier_decomposition",
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
    from ..streaming import batch_equiv  # noqa: F401

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
