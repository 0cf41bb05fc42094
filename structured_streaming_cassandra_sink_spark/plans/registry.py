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
# queries per round. Round-3 rotation: EXACTLY the 53 queries with no green
# r01/r02 driver row — the 2 r2 FAILs (array shapes, fixed this round) and
# the 2 shape-audited latent fails first, then the 49 never-driver-seen
# queries. 53 > the 50-row cap, so the 3 at the tail (trivial variants of
# already-proven ops: set_ops pass r1, broadcast/salted joins pass r1)
# spill to round 4. Everything green in r01/r02 is dropped from the list.
#
# ROUND-4 ROTATION DEBT (build the next _PRIORITY_THIS_ROUND from this):
# - the 4 spilled below: session_chain_recursive, set_intersect_all,
#   set_except_all, join_shuffle_hash_hint;
# - the geo family (operators/geo.py), never driver-seen:
#   geo_grid_hotspots, geo_radius_join, geo_knn_within_radius;
# - record_linkage_fs (operators/dedup.py), never driver-seen;
# - max_concurrency_sweep, proration_largest_remainder,
#   t_closeness_check, multi_touch_attribution, interval_union_time,
#   dau_wau_stickiness, never driver-seen;
# - the round-3 driver-session additions, never driver-seen:
#   kmeans_lloyd, pq_encode, countmin_sketch_report, rolling_median,
#   survival_kaplan_meier, ngram_novelty_score, k_anonymity_check,
#   ivm_delta_apply, theil_sen_trend, forecast_snaive_backtest,
#   lateral_topn;
# - queries whose contract CHANGED after their last driver row and which
#   sit past this round's cap: approx_distinct, approx_quantiles (rows-only
#   -> tolerance-banded oracle), udf_surface (rows-only -> full oracle),
#   dedup_simhash (rows-only -> portable md5-nibble sketch, full oracle);
# - the continuation-session additions, never driver-seen:
#   bootstrap_ci_poisson, mrr_map_at_k, sim_search_pq_adc,
#   stream_enrich_static, tfidf_cosine_pairs, rrf_fusion, skyline_pareto,
#   dbscan_grid_clusters, link_prediction_adamic_adar, cdc_chunk_dedup,
#   sprt_sequential_test, emd_drift;
# - the round-3 additions, never driver-seen: scd2_build,
#   split_leakage_safe, ann_recall_report, weighted_sample_topk,
#   union_schema_evolution, pca_variance_report, minhash_recall_report,
#   join_bloom_prefilter, join_dpp_prune, rollup_agg, cdc_apply,
#   ewma_smooth, compaction_plan, decimal_money_agg, dup_graph_pagerank,
#   markov_transitions, interpolate_linear, bpe_merge_step,
#   impute_group_median, hard_negative_topk, vocab_coverage,
#   bigram_lm_probs, dp_noisy_counts, aqp_sampled_agg,
#   cusum_changepoint, period_over_period, stream_tumbling_distinct,
#   weighted_percentile, max_drawdown, table_diff,
#   last_touch_attribution, cluster_quality_report, market_basket_pairs,
#   top_event_paths, dedup_survivorship_merge, right_to_erasure_apply,
#   pseudonymize_keys, ab_test_readout, dq_rule_check, join_asof_forward,
#   scd2_point_in_time_join, benford_check, dup_graph_bfs_depth,
#   temporal_split_embargo, histogram2d_heatmap, cep_pattern_match,
#   window_rolling_corr, fk_orphan_check, surrogate_key_assign,
#   roc_auc, gini_lorenz, ks_statistic, calibration_bins, psi_drift,
#   target_encode_smoothed, chi2_independence, feature_hash,
#   jackknife_ci, confusion_report, lift_band_report, acf_lags,
#   seasonal_decompose, ttest_welch, mutual_information, cramers_v,
#   hhi_concentration, ndcg_at_k, quantile_normalize,
#   winsorize_clip, zipf_fit;
# - the round-3 second-session additions, never driver-seen:
#   spearman_corr, kendall_tau, anova_oneway, cohens_kappa, pr_auc,
#   log_loss_brier, graph_hits_bipartite, graph_sssp_weighted,
#   epoch_shuffle_assign, js_divergence_sources, naive_bayes_train,
#   naive_bayes_score, isotonic_calibration, cuped_adjustment,
#   delta_method_ratio_ci, holt_linear_smooth, feature_info_gain,
#   rfm_segmentation, running_balance_floor, graph_assortativity,
#   graph_kcore;
# - the round-3 third-session additions, never driver-seen:
#   kruskal_wallis, levene_brown_forsythe, collocation_g2,
#   subquery_double_exists, join_asof_nearest, time_decay_attribution,
#   sax_encode, knn_classify_eval, heaps_law_fit, brier_decomposition,
#   equi_depth_histogram, graph_clustering_coeff, subquery_anti_scalar,
#   mann_kendall_trend_test, pinball_loss_eval, arrow_map_surface,
#   survival_c_index, ips_offpolicy_eval, layout_rle_report (+ any later round-3 additions
#   — diff OPERATORS.md against CORRECTNESS_r0*).
# That list now EXCEEDS the 50-row cap on its own (~40 never-driver-seen
# rows after this session's additions): round 4 should spend its whole
# budget on them plus the 3 spilled + 3 contract-changed rows, and any
# re-confirmation of stale green rows waits for round 5.
_PRIORITY_THIS_ROUND = [
    # contract upgraded this round: rows-only -> full brute-force oracle
    # (recall measured 1.0 at all SFs) — give the flagship near-dup op
    # its first hash-checked row
    "dedup_near_minhash",
    # r2 driver FAILs — array outputs made driver-hashable this round
    "embedding_centroid",
    "embedding_quantize",
    # shape-audited latent fails — same fix, need first green rows
    "array_ops",
    "tokenize_to_ids",
    # never driver-seen (registered past the r2 cap), r2 registry order
    "cube_agg",
    "join_shipping_priority",
    "column_corr",
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
    "try_functions",
    "data_freshness_report",
    "funnel_conversion_rate",
    "dup_graph_triangles",
    "hll_partial_merge",
    "first_last_nonnull",
    "edit_distance_clusters",
    "incremental_stats_merge",
    "variant_ops",
    # --- 50-row cap lands here; the 4 below spill to round 4 ---
    # (session_chain_recursive spilled to make room for the
    # dedup_near_minhash contract upgrade: its window-sessionizer twin
    # sessionize_assign is already hash-proven, so it loses the least)
    "session_chain_recursive",
    "set_intersect_all",
    "set_except_all",
    "join_shuffle_hash_hint",
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

    front = {n: QUERIES[n] for n in _PRIORITY_THIS_ROUND if n in QUERIES}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)
