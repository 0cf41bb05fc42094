#!/usr/bin/env python
"""Registry-wide physical-plan guard — the scale anti-pattern sweep.

tests/test_plans.py pins ~70 hand-picked shapes; this tool sweeps EVERY
registered query's formatted plan for the patterns that break at 100 TB:

- CartesianProduct           -> never allowed
- BroadcastNestedLoopJoin    -> allowed only on the documented allowlist
                                (broadcast 1-row ride-alongs, intentional
                                query-set x corpus products)
- Window without PARTITION BY-> allowed only on the documented allowlist
                                (windows over provably bounded frames:
                                vocabulary ranks, day grids, ranker
                                output, partition-count tables)
- BatchEvalPython/ArrowEval  -> allowed only where pandas is the DESIGN
                                (grouped-map recurrences, multimodal
                                decoders, explicit pandas surfaces)

Usage:  python tools/plan_guard.py [--json PLAN_GUARD.json] [query ...]
Exit 1 on any violation outside the allowlists.

Plans are built (not executed) — but note that SOME query constructors
run bounded driver jobs (two-pass offsets, index builds, Lloyd rounds);
the sweep therefore costs a few minutes, not seconds.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

# BroadcastNestedLoopJoin: every entry is a deliberate broadcast product.
BNLJ_ALLOWED = {
    "sim_search_topk",        # tiny query set x corpus scan (by design)
    "sim_search_pq_adc",      # probe set x coarse cells
    "hard_negative_topk",     # probe set x corpus scan
    "ndcg_at_k",              # probe set x corpus scan
    "mrr_map_at_k",           # probe set x corpus scan
    "ann_recall_report",      # exact arm of the recall comparison
    "minhash_recall_report",  # 1-row truth scalars ride-along
    "dedup_embedding_cosine", # block-pair pruning lower bound (1-row stats)
    "embedding_pca_project",  # broadcast moment row
    "pca_variance_report",    # broadcast moment row
    "table_diff",             # 1-row count ride-alongs
    "tfidf_top_terms",        # broadcast 1-row corpus count
    "bm25_score",             # broadcast 1-row stats
    "rrf_fusion",             # broadcast 1-row stats + probe vector
    "lm_score",               # broadcast 1-row corpus totals
    "word_pmi",               # broadcast 1-row totals
    "source_entropy",         # broadcast 1-row totals
    "zipf_fit",               # broadcast 1-row regression moments
    "quality_quantile_filter",# broadcast threshold row
    "outlier_mad",            # broadcast 1-row MAD row per group lattice
    "contamination_check",    # broadcast eval-set stats row
    "vocab_coverage",         # broadcast 1-row vocab size
    "shingle_containment",    # broadcast 1-row df cap stats
    "winnow_dup_pairs",       # broadcast 1-row df cap stats
    "bootstrap_ci_poisson",   # broadcast 1-row replicate normalizers
    "jackknife_ci",           # broadcast 1-row block totals
    "aqp_sampled_agg",        # broadcast 1-row scale factor
    "psi_drift",              # broadcast global binning row
    "ks_statistic",           # broadcast group-total row
    "gini_lorenz",            # broadcast group-total row
    "mutual_information",     # broadcast 1-row N
    "chi2_independence",      # broadcast 1-row N
    "cramers_v",              # broadcast 1-row N
    "hhi_concentration",      # broadcast group totals
    "lift_band_report",       # broadcast base-rate row
    "calibration_bins",       # broadcast 1-row totals
    "roc_auc",                # broadcast class-count row
    "benford_check",          # broadcast 1-row N
    "length_histogram",       # broadcast 1-row bin width
    "histogram2d_heatmap",    # broadcast 1-row grid bounds
    "quantile_normalize",     # broadcast 1-row N
    "weighted_percentile",    # broadcast 1-row weight total
    "order_count_distribution",  # broadcast 1-row total
    "share_of_group",         # broadcast 1-row grand total
    "period_over_period",     # broadcast 1-row anchor
    "data_freshness_report",  # broadcast 1-row now()
    "source_budget_sample",   # broadcast budget row
    "stratified_sample",      # broadcast strata rates
    "mixture_interleave",     # broadcast source sizes
    "negative_sample",        # broadcast 1-row rate
    "fixed_size_sample",      # broadcast 1-row threshold
    "train_val_split",        # broadcast 1-row counts (report columns)
    "curation_pipeline",      # broadcast quality threshold row
    "dedup_rate_by_source",   # broadcast 1-row totals
    "cluster_quality_report", # broadcast centroid stats
    "dup_graph_triangles",    # broadcast 1-row totals
    "cusum_changepoint",      # broadcast 1-row mean
    "theil_sen_trend",        # broadcast 1-row median slope
    "forecast_snaive_backtest",  # broadcast 1-row split ts
    "acf_lags",               # broadcast 1-row moments
    "seasonal_decompose",     # broadcast 1-row grand mean
    "ttest_welch",            # 2-group moment rows
    "ab_test_readout",        # 2-group moment rows
    "embedding_dim_stats",    # broadcast 1-row corpus n
    "embedding_centroid",     # broadcast 1-row corpus n
    "tokenize_to_ids",        # broadcast 1-row vocab size
    "udf_surface",            # broadcast 1-row scalar
    "incremental_stats_merge",# broadcast 1-row merged moments
    "moments_agg",            # broadcast 1-row lattice totals
    "column_corr",            # broadcast 1-row moments
    "regression_agg",         # broadcast 1-row moments
    "table_profile",          # broadcast 1-row n_rows
    "skew_profile",           # broadcast 1-row totals
    "zorder_cluster",         # broadcast 1-row grid bounds
    "compaction_plan",        # broadcast 1-row target size
    "k_anonymity_check",      # broadcast 1-row thresholds
    "dp_noisy_counts",        # broadcast 1-row epsilon scale
    "survival_kaplan_meier",  # broadcast 1-row censor horizon
    "funnel_conversion_rate", # broadcast step-total rows
    "retention_cohort",       # broadcast cohort-size rows
    "gap_fill",               # broadcast 1-row grid bounds
    "time_weighted_avg",      # broadcast 1-row horizon
    "anomaly_rolling_z",      # broadcast 1-row fallback stats
    "bigram_lm_probs",        # broadcast 1-row unigram total
    "countmin_sketch_report", # broadcast 1-row eps/width guarantee row
    "embedding_cluster_assign",  # K-row centroid broadcast product (argmin)
    "kmeans_lloyd",           # K-row centroid broadcast product per round
    "fk_orphan_check",        # three 1-row audit-count ride-alongs
    "target_encode_smoothed", # broadcast global-mean row
    "temporal_split_embargo", # broadcast boundary-timestamp row
}

# Window with an empty PARTITION BY: every entry names the BOUNDED frame
# the window actually orders (never the raw fact table).
UNPART_WINDOW_ALLOWED = {
    "tokenize_to_ids",        # zipf-bounded vocabulary rank
    "vocab_coverage",         # vocabulary rank
    "bpe_merge_step",         # alphabet^2 pair rank
    "ngram_counts",           # top-20 cut over the gram lattice
    "word_pmi",               # bounded pair lattice rank
    "tfidf_top_terms",        # (ranked per doc — guard matches global cuts)
    "heavy_hitters",          # bounded candidate rank
    "market_basket_pairs",    # |types|^2 pair rank
    "top_event_paths",        # bounded path lattice rank
    "ohlc_bars",              # day-grid windows
    "time_rollup",            # day-grid windows
    "period_over_period",     # day-grid lag
    "acf_lags",               # day-grid leads
    "seasonal_decompose",     # day-grid centered trend
    "forecast_snaive_backtest",  # day-grid
    "ewma_smooth",            # (oracle parity cap; per-key in pandas)
    "theil_sen_trend",        # median over bounded slope lattice
    "cusum_changepoint",      # day-grid running extrema
    "max_drawdown",           # day-grid running max
    "rolling_median",         # day-grid frames
    "window_rolling_corr",    # hour-grid frames
    "interpolate_linear",     # day-grid neighbors
    "histogram_width_bucket", # bucket lattice
    "length_histogram",       # bin lattice
    "histogram2d_heatmap",    # grid lattice
    "gini_lorenz",            # per-group lattice cut (grouped variant)
    "ks_statistic",           # distinct-score lattice
    "roc_auc",                # distinct-score lattice
    "quantile_normalize",     # distinct-score lattice
    "calibration_bins",       # bin lattice
    "lift_band_report",       # decile lattice
    "psi_drift",              # bin lattice
    "benford_check",          # 9-digit lattice
    "zipf_fit",               # vocabulary rank
    "weighted_percentile",    # bounded group lattice
    "exact_percentiles",      # percentile lattice
    "countmin_sketch_report", # key lattice
    "hll_partial_merge",      # shard lattice
    "source_overlap_matrix",  # source-pair lattice
    "source_entropy",         # source lattice
    "dedup_rate_by_source",   # source lattice
    "order_count_distribution",  # count lattice
    "funnel_conversion_rate", # step lattice
    "retention_cohort",       # cohort-week lattice
    "mixture_interleave",     # bounded source rank
    "kmeans_lloyd",           # K-row centroid rank
    "pq_encode",              # codebook rank
    "sim_search_pq_adc",      # per-probe rank over candidate cells
    "embedding_cluster_assign",  # K-row rank
    "cluster_quality_report", # K-row rank
    "rrf_fusion",             # ranker-output rank (depth-bounded)
    "skyline_pareto",         # (per-__pid; guard regex is conservative)
    "surrogate_key_assign",   # per-range-partition rank
    "running_distinct",       # day-grid running distinct
    "gaps_islands",           # (per-user; conservative match)
    "data_freshness_report",  # source lattice
    "table_diff",             # key-space lattice
    "dq_rule_check",          # rule lattice
    "ab_test_readout",        # 2-arm lattice
    "confusion_report",       # 4-cell lattice
    "bigram_lm_probs",        # vocab^2 lattice
    "lateral_topn",           # bounded per-group cut
    "join_shipping_priority", # top-N lattice cut
    "ann_recall_report",      # probe-set rank
    "minhash_recall_report",  # 1-row report
    "mrr_map_at_k",           # probe-set rank
    "ndcg_at_k",              # probe-set rank
    "hard_negative_topk",     # probe-set rank
    "weighted_sample_topk",   # per-stratum rank (conservative match)
    "aqp_sampled_agg",        # band lattice
    "jackknife_ci",           # block lattice
    "bootstrap_ci_poisson",   # replicate lattice
    "quality_quantile_filter",# quantile lattice
    "stream_tumbling_distinct",  # window-grid lattice
    "edit_distance_clusters", # candidate-pair lattice
    "dup_graph_pagerank",     # node lattice rank
    "dup_graph_bfs_depth",    # frontier lattice
    "survival_kaplan_meier",  # duration lattice
    "markov_transitions",     # |types|^2 lattice
    "cep_pattern_match",      # pattern lattice
    "last_touch_attribution", # campaign lattice
    "sequence_packing",       # pack-boundary lattice (two-pass bounded)
    "doc_chunking",           # per-doc chunk grid (conservative match)
    "ngram_novelty_score",    # first-occurrence rank
    "winnow_dup_pairs",       # fingerprint-pair lattice
    "shingle_containment",    # pair lattice
    "dedup_pipeline_keep_canonical",  # canonical rank over dup clusters
    "dedup_survivorship_merge",  # field-rank over dup clusters
    "decimal_money_agg",      # bounded currency lattice
    "moments_agg",            # bounded lattice
    "udtf_sentence_split",    # bounded demo slice
    "variant_ops",            # bounded keys
    "pca_variance_report",    # dim-lattice (<=64 rows)
    "embedding_pca_project",  # dim-lattice
    "embedding_dim_stats",    # dim-lattice
    "chi2_independence",      # contingency lattice
    "cramers_v",              # contingency lattice
    "mutual_information",     # contingency lattice
    "hhi_concentration",      # group lattice
    "ivm_delta_apply",        # group lattice
    "k_anonymity_check",      # quasi-identifier lattice
    "string_agg_ordered",     # bounded group output
    "first_last_nonnull",     # bounded group output
    "grouping_sets",          # level lattice
    "cube_agg",               # level lattice
    "rollup_agg",             # level lattice
    "pivot_agg",              # pivot lattice
    "unpivot_melt",           # stack lattice
    "approx_quantiles",       # group lattice
    "stratified_sample",      # strata lattice
    "source_budget_sample",   # budget lattice
    "train_val_split",        # report lattice
    "split_leakage_safe",     # fingerprint-group lattice
    "temporal_split_embargo", # boundary lattice
    "fk_orphan_check",        # key-space audit lattice
    "compaction_plan",        # file lattice
    "zorder_cluster",         # demo head cut
    "dup_graph_triangles",    # triangle lattice
    "gap_fill",               # per-user grid (conservative match)
    "anomaly_rolling_z",      # per-user frames (conservative match)
    "sprt_sequential_test",   # day-lattice running LLR + stop flag
}

# Python eval (BatchEvalPython / ArrowEvalPython / FlatMapGroupsInPandas
# / MapInPandas): allowed where pandas IS the operator's design.
PYTHON_ALLOWED = {
    "groupwise_zscore_pandas",  # the grouped-map pandas surface, by name
    "ewma_smooth",              # sequential recurrence (grouped-map)
    "udf_surface",              # the pandas-UDF demo surface
    "udtf_sentence_split",      # the UDTF demo surface
    "multimodal_decode",        # binary decoder (mapInPandas)
    "multimodal_resize",        # binary resize (mapInPandas)
    "multimodal_frame_sample",  # 1->N frame sampler (mapInPandas)
    "embedding_pca_project",    # driver eigh -> projection UDF
    "pca_variance_report",      # driver eigh
    "edit_distance_clusters",   # levenshtein verify batches
    "edit_distance_pairs",      # levenshtein verify batches
    "heavy_hitters",            # Misra-Gries per-partition partial (mapInPandas
                                # mg_partial) — the mergeable-summary design
}


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if args and args[0] == "--json":
        out_path = args[1]
        args = args[2:]

    from structured_streaming_cassandra_sink_spark.plans import registry
    from structured_streaming_cassandra_sink_spark.session import get_spark

    registry.load_all()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    names = args or sorted(registry.QUERIES)
    report, violations = {}, []
    for name in names:
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            report[name] = {"error": str(exc)[:200]}
            violations.append((name, "plan_failed"))
            continue

        cartesian = "CartesianProduct" in plan
        bnlj = plan.count("(") and len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
        # Window nodes: formatted Arguments prints [exprs], [partition],
        # [order] for partitioned windows but OMITS the partition group
        # entirely when empty — so count top-level bracket groups: 2
        # groups == unpartitioned. (The earlier empty-"[]" regex never
        # matched anything; caught when a known-unpartitioned window
        # scored 0.)
        unpart = 0
        for m in re.finditer(r"\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)", plan):
            a = m.group(1)
            depth, groups = 0, 0
            for ch in a:
                if ch == "[":
                    if depth == 0:
                        groups += 1
                    depth += 1
                elif ch == "]":
                    depth -= 1
            if groups <= 2:
                unpart += 1
        python_nodes = len(
            re.findall(
                r"\(\d+\) (BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|"
                r"MapInPandas|FlatMapGroupsInPandasWithState)",
                plan,
            )
        )
        row = {
            "cartesian": cartesian,
            "bnlj": bnlj,
            "unpartitioned_windows": unpart,
            "python_nodes": python_nodes,
        }
        report[name] = row
        if cartesian:
            violations.append((name, "cartesian"))
        if bnlj and name not in BNLJ_ALLOWED:
            violations.append((name, f"bnlj={bnlj}"))
        if unpart and name not in UNPART_WINDOW_ALLOWED:
            violations.append((name, f"unpartitioned_windows={unpart}"))
        if python_nodes and name not in PYTHON_ALLOWED:
            violations.append((name, f"python_nodes={python_nodes}"))

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(
                {"queries": report, "violations": [f"{n}:{v}" for n, v in violations]},
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {out_path}")
    for n, v in violations:
        print(f"VIOLATION {n}: {v}")
    print(f"{len(names)} plans checked, {len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
