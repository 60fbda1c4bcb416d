"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Usage: python bench.py [--all]  (--all benches every registered query;
default benches the headline set the driver tracks round-over-round).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arkflow_spark.queries import QUERIES
from arkflow_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "agg_stats_family",
    "window_ranking",
    "events_tumbling_window",
    "events_session_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "text_tfidf",
    "ann_cosine_topk",
    "ann_ivf_assign",
    "ann_ivf_search",
    # round-3 operators (first benched in BENCH_r03)
    "events_gapfill_locf",
    "events_anomaly_zscore",
    "text_line_dedup",
    "text_unigram_logprob",
    "lineitem_zorder_layout",
    "ann_pq_topk",
    "documents_training_mix",
    # round-3 second-session operators (first benched in BENCH_r03)
    "text_bigram_logprob",
    "events_counter_rate",
    "graph_pagerank_bipartite",
    # round-3 third-session operators (first benched in BENCH_r03)
    "events_sequence_pattern",
    "events_session_capped",
    "events_survival_km",
    "dedup_prefix_filter",
    "ann_mips_topk",
    "graph_triangle_count",
    # round-3 fourth-session operators (first benched in BENCH_r03)
    "window_rolling_median",
    "dedup_containment",
    "events_attribution",
    "events_cusum_alarm",
    "ann_knn_classify",
    "events_holt_trend",
    "text_bm25_search",
    "events_m4_downsample",
    "events_time_weighted_avg",
    "agg_heavy_hitters_mg",
    "events_burst_hysteresis",
    "events_ddsketch_quantile",
    "dq_profile_columns",
    "part_hierarchy_recursive",
    "events_geo_grid_hotspots",
    "orders_cohort_revenue_ltv",
    "events_dau_mau_stickiness",
    "events_drift_psi",
    "orders_snapshot_diff",
    # round-4 operators (first benched in BENCH_r04)
    "graph_pagerank_bucketed",
    "events_bootstrap_ci",
    "documents_rag_chunks",
    "dedup_band_sweep",
    "events_lateness_watermark_audit",
    "orders_backlog_timeseries",
    # round-4 batches 30-32 (first benched in BENCH_r04)
    "dedup_substring_spans",
    "documents_ccnet_ppl_buckets",
    "dedup_edit_distance_blocked",
    "events_theil_sen_trend",
    "events_gini_concentration",
    "ann_sq8_topk",
    "ann_binary_hamming_topk",
    "embedding_label_outliers",
    # round-4 batches 33-35 (first benched in BENCH_r04)
    "documents_filter_funnel",
    "events_topk_drift_jaccard",
    "supplier_lead_time_scorecard",
    "lineitem_abc_xyz_matrix",
    "documents_domain_cap_sample",
    "text_bigram_kn_logprob",
    "text_repeated_ngram_fractions",
    "events_hourweek_profile",
    "orders_eoq_replenishment",
    "events_hampel_outliers",
    # round-4 batches 36-40 (first benched in BENCH_r04)
    "ann_ivf_pq_search",
    "events_ks_test",
    "events_mann_whitney",
    "lineitem_scd2_pit_revenue",
    "events_spearman_corr",
    "lineitem_newsvendor_qstar",
    "graph_link_prediction_ra",
    "events_sax_motifs",
    "dedup_semantic_cluster",
    "events_chi_square_independence",
    "events_markov_entropy_rate",
    "events_holt_winters",
    "customer_bgnbd_palive",
    "orders_weibull_cycletime_fit",
    "events_ljung_box",
    "supplier_wilson_otd_ci",
    "documents_survivorship_golden",
    "events_winsorized_stats",
    "ann_ivf_pq_rerank",
    "events_gpd_pot_fit",
    # round-4 batch 41 (first benched in BENCH_r04)
    "ann_ivf_pq_recall_eval",
    "text_js_divergence_sources",
    "orders_littles_law_audit",
    "events_circular_hour_stats",
    # round-4 batch 42 (first benched in BENCH_r04)
    "orders_croston_forecast",
    "documents_temperature_mix_weights",
    "events_running_records",
    "text_mattr_lexical_diversity",
    # round-4 batch 43 (first benched in BENCH_r04)
    "graph_community_label_prop",
    "events_decayed_rate",
    "lineitem_price_index",
    "embedding_intrinsic_dim_twonn",
    # round-4 batch 44 (first benched in BENCH_r04)
    "text_vocab_coverage_curve",
    "events_threshold_flappiness",
    "customer_clv_discounted",
    "part_dual_sourcing_shares",
    # round-4 batch 45 (first benched in BENCH_r04)
    "text_char_entropy",
    "events_inspection_paradox",
    "embedding_anisotropy",
    "events_activation_time_to_n",
    # round-5: bucketed twin for the slowest r4 headline (VERDICT #5)
    "graph_community_label_prop_bucketed",
    # round-5: distributed-rank conversions (VERDICT #1) — benched so
    # the plan change's cost is tracked round-over-round
    "customer_rfm_segments",
    "lineitem_abc_pareto",
    "documents_curriculum_order",
    "orders_skyline_2d",
    "text_pmi_cooccurrence",
    # round-5 batches 46-47 (first benched in BENCH_r05)
    "events_page_hinkley_drift",
    "orders_interrupted_time_series",
    "dedup_bloom_prefilter",
    "events_tail_codependence",
    "text_heaps_law_fit",
    "multimodal_duplicate_frames",
    "documents_cross_shard_overlap",
    "ann_cosine_range_search",
    "events_mann_kendall_trend",
    "lineitem_return_shrinkage",
    "text_stopword_stylometry",
    "embedding_silhouette_simplified",
    "embedding_matryoshka_prefix_recall",
    "dedup_minhash_bbit_calibration",
    "documents_license_screen",
    "events_gpd_return_levels",
    "events_hourly_type_entropy",
    # round-5 batches 51-56 (first benched in BENCH_r05)
    "events_kruskal_wallis",
    "events_wilcoxon_signed_rank",
    "events_benjamini_hochberg",
    "events_dbscan_grid_1d",
    "events_kde_silverman_grid",
    "orders_chain_ladder",
    "part_entity_resolution_fs",
    "agg_count_min_sketch",
    "events_granger_hourly",
    "lineitem_kendall_tau",
    "events_allan_variance",
    "embedding_jl_distortion",
    "events_isotonic_hourly",
    "events_friedman_daily",
    "events_spectral_entropy",
    "lineitem_theil_decomposition",
    "events_segmentation_2cp_daily",
    "events_eb_shrinkage",
    "supplier_topsis_scorecard",
    "embedding_centroid_classifier",
    "events_erlang_staffing",
    "text_mojibake_garbage_screen",
    "multimodal_shot_boundaries",
    "events_mutual_information",
    "events_sample_entropy",
    "ann_retrieval_ndcg",
    "documents_bradley_terry_sources",
    "events_conformal_interval",
    "events_sliding_rate_limit_audit",
    "part_demand_classification_syntetos",
    "events_markov_hitting_time",
    "ann_mmr_rerank",
    "events_otsu_threshold",
    "customer_decile_gains",
    "events_shapley_attribution",
    "events_gumbel_block_maxima",
    "text_structured_extraction_rates",
    "events_scan_statistic",
    "part_safety_stock_service_levels",
    "events_twoway_anova_unweighted",
    "embedding_hubness_knn",
    "events_negbin_fit_userday",
    "text_word_burstiness",
    "lineitem_segmented_price_quantity",
    "events_energy_distance_cohorts",
    "events_kmeans1d_binned",
    "documents_length_mixture_em",
    "events_runs_test",
    "documents_quality_knee_kneedle",
    # round-5 batches 68-71 (first benched in BENCH_r05)
    "events_hurst_aggvar",
    "events_brier_calibration",
    "orders_market_basket_lift",
    "documents_cohen_kappa",
    "text_good_turing",
    "documents_token_budget_pack",
    "events_roc_auc",
    "documents_importance_ess",
    "text_burrows_delta",
    "events_pacf_durbin",
    "events_pinball_quantile_eval",
    "events_split_rate_test",
    # round-5 batch 72 (first benched in BENCH_r05)
    "multimodal_ahash_near_dup",
    "events_poisson_surprise",
    "events_absence_anomaly",
    # round-5 batch 73 (first benched in BENCH_r05)
    "events_paired_t_hod",
    "embedding_triplet_violations",
    "lineitem_revenue_bridge",
    # round-5 batches 74-75 (first benched in BENCH_r05)
    "events_sample_ks_representativeness",
    "events_wasserstein_drift",
    "embedding_effective_dim_pr",
    "sketch_theta_intersection",
    "customer_value_migration",
    "lineitem_brand_concentration",
    # round-5 batch 76 (first benched in BENCH_r05)
    "events_interarrival_burstiness",
    "events_session_gap_sweep",
    "events_groupby_key_advisor",
    # round-5 batch 77 (first benched in BENCH_r05)
    "events_rare_transition_surprise",
    "customer_segment_nation_residuals",
    "events_k_anonymity_audit",
    # round-5 batch 78 (first benched in BENCH_r05)
    "embedding_length_centroid_corr",
    "embedding_source_cohesion",
    "ann_retrieval_length_bias",
    # round-5 batch 79 (first benched in BENCH_r05)
    "dq_referential_integrity",
    "multimodal_payload_entropy",
    "dedup_transitivity_audit",
    # round-5 batch 80 (first benched in BENCH_r05)
    "events_forecast_mase_seasonal_naive",
    "embedding_cluster_source_nmi",
    "lineitem_part_price_dispersion",
    # round-5 batch 81 (first benched in BENCH_r05)
    "events_icc_user_clustering",
    "documents_neyman_allocation",
    "events_median_polish_hourweek",
    # round-5 batch 82 (first benched in BENCH_r05)
    "lineitem_experience_curve",
    "events_u_chart_error_rate",
    "events_compound_poisson_check",
    # round-5 batch 83 (first benched in BENCH_r05)
    "graph_degree_assortativity",
    "events_extremal_index_runs",
    "documents_novelty_decay_fit",
    # round-5 batch 84 (first benched in BENCH_r05)
    "part_hedonic_price_2var",
    "events_user_activity_markov",
    "events_bounce_sessions",
    # round-5 batch 85 (first benched in BENCH_r05)
    "embedding_distance_concentration",
    "events_behavior_cooccurrence_lift",
    "customer_balance_order_propensity",
    # round-5 batch 86 (first benched in BENCH_r05)
    "orders_priority_lead_time",
    "orders_month_end_loading",
    "events_anderson_darling_2sample",
    # round-5 batch 87 (first benched in BENCH_r05)
    "embedding_fisher_ratio_dims",
    "dq_primary_key_uniqueness",
    "text_dispersion_dp",
    # round-5 batch 88 (first benched in BENCH_r05)
    "events_mean_cumulative_function",
    "events_record_surprise",
    "dq_intra_order_consistency",
    # round-5 batch 89 (first benched in BENCH_r05)
    "ann_knn_accuracy_sweep",
    "dq_temporal_ordering",
    "events_daily_mix_divergence",
    # round-5 batch 90 (first benched in BENCH_r05)
    "dq_last_digit_uniformity",
    "dq_id_time_monotonicity",
    "text_source_vocab_jaccard",
    # round-5 batch 91 (first benched in BENCH_r05)
    "orders_vintage_revenue_curves",
    "text_self_similarity_stride",
    "nation_trade_imbalance",
    # round-5 batch 92 (first benched in BENCH_r05)
    "events_arch_lm_test",
    "multimodal_aspect_ratio_audit",
    "events_run_length_geometric_fit",
    # round-5 batch 93 (first benched in BENCH_r05)
    "customer_whale_curve",
    "dq_timestamp_truncation",
    "part_demand_pooling_benefit",
    # round-5 batch 94 (first benched in BENCH_r05)
    "ann_ivf_bucket_balance",
    "text_positional_length_profile",
    "part_price_realization",
    # round-5 batch 95 (first benched in BENCH_r05)
    "customer_purchase_clumpiness",
    "lineitem_simpson_paradox_check",
    "dq_enum_domain_drift",
    # round-5 batch 96 (first benched in BENCH_r05)
    "orders_lognormal_fit_check",
    "events_user_concentration",
    "dq_embedding_coverage",
    # round-5 batch 97 (first benched in BENCH_r05)
    "graph_clustering_coefficient",
    "embedding_duplicate_vectors",
    "text_sentence_length_profile",
    # round-5 batch 98 (first benched in BENCH_r05)
    "events_seasonal_strength",
    "dedup_cluster_size_histogram",
    "text_char_trigram_lang_signature",
    # round-5 batch 99 (first benched in BENCH_r05)
    "events_peak_hour_stability",
    "lineitem_return_rate_by_delay",
    "orders_new_vs_returning_revenue",
    # round-5 batch 100 (first benched in BENCH_r05)
    "dq_order_line_status_consistency",
    "part_brand_price_positioning",
    "embedding_label_centroid_margin",
    # round-5 batch 101 (first benched in BENCH_r05)
    "text_herdan_richness_by_source",
    "text_bigram_entropy_rate",
    "supplier_share_shift",
    # round-5 batch 102 (first benched in BENCH_r05)
    "customer_value_trajectory",
    "orders_concentration_trend",
    "dedup_source_impact",
    # round-5 batch 103 (first benched in BENCH_r05)
    "events_session_basket_lift",
    "dq_decimal_precision_profile",
    "lineitem_line_position_profile",
    # round-5 batch 104 (first benched in BENCH_r05)
    "text_template_prefix_audit",
    "text_casing_style_profile",
    "dq_functional_dependency_strength",
    # round-5 batch 105 (first benched in BENCH_r05)
    "dq_event_retry_duplicates",
    "orders_trading_day_adjustment",
    "part_product_family_mix",
    # round-5 batch 106 (first benched in BENCH_r05)
    "orders_basket_size_profile",
    "text_brevity_law_check",
    "dq_id_gap_census",
    # round-5 batch 107 (first benched in BENCH_r05)
    "customer_churn_hazard_by_tenure",
    "lineitem_promo_intensity_trend",
    "dq_fanout_ratio_stability",
    # round-5 batch 108 (first benched in BENCH_r05)
    "documents_lang_source_residuals",
    "events_json_prop_profile",
    "text_line_structure_profile",
    # round-5 batch 109 (first benched in BENCH_r05)
    "supplier_top20_customer_overlap",
    "text_digit_token_profile",
    "graph_component_size_histogram",
    # round-5 batch 110 (first benched in BENCH_r05)
    "part_brand_loyalty_repeat_rate",
    "ann_probe_cost_distribution",
    "events_feature_adoption_breadth",
    # round-5 batch 111 (first benched in BENCH_r05)
    "supplier_revenue_volatility",
    "ann_ivf_assignment_stability",
    "orders_arpu_trend",
    # round-5 batch 112 (first benched in BENCH_r05)
    "dq_amount_reconciliation",
    "events_daily_amplitude",
    "customer_first_order_predictiveness",
    # round-6 batches 113-119 (first benched in BENCH_r06)
    "orders_bullwhip_ratio",
    "part_power_of_two_policy",
    "nation_gravity_model",
    "events_logrank_test",
    "documents_mcnemar_filters",
    "events_growth_accounting",
    "events_topk_rbo_drift",
    "graph_local_bridges",
    "graph_rich_club",
    "part_cross_price_elasticity",
    "dq_sentinel_values",
    "text_boilerplate_shingles",
    "nation_fisher_exact_deficit",
    "events_mantel_haenszel",
    "nation_rca_index",
    "events_multiwindow_burn_alerts",
    "text_dialog_format_share",
    "embedding_cka_blocks",
    "ann_knn_reciprocity",
    "layout_encoding_advisor",
    "events_alert_mttd",
    "events_quantile_treatment_effect",
    "events_cochran_armitage_trend",
    "ann_filtered_search_recall",
    "dq_format_inference",
    "events_boxcox_lambda",
    "documents_rrf_quality_fusion",
    "graph_community_modularity",
    "part_dead_stock_aging",
    "dq_sum_overflow_margin",
    "events_usl_scalability_fit",
    "supplier_leadtime_cvar",
    "part_price_ladder_gaps",
    "events_sprt_replay",
    "nation_trade_reciprocity",
    "embedding_lof_simplified",
    "events_var_backtest_kupiec",
    "graph_percolation_support_sweep",
    "documents_quality_length_residual",
    "ann_retrieval_alpha_ndcg",
    "events_ripley_k",
    "dedup_rate_by_length_band",
    "events_holm_stepdown",
    "graph_weak_tie_removal_impact",
    "events_cron_artifact_detection",
    "graph_ktruss_membership",
    "embedding_uniformity_alignment",
    "customer_brand_switching",
    "lineitem_promo_attach_rate",
    "graph_avg_neighbor_degree",
    # round-7 operators (first benched in BENCH_r07)
    "graph_community_conductance",
    "graph_brand_homophily",
    "graph_community_size_gini",
    "documents_dedup_quality_survivorship",
    "dedup_signature_slot_health",
    "dedup_cross_source_pairs",
    "events_error_minute_availability",
    "supplier_leadtime_cpk",
    "lineitem_minmax_pruning_sim",
    "nation_import_dependency_hhi",
    "text_tfidf_keywords_by_source",
    "events_gap_fill_interpolate",
    # round-8 operators (first benched in BENCH_r08) — PQ code-index
    # audits; the four PQ pipelines above now read the same index
    "ann_pq_quantization_error",
    "ann_pq_reconstruction_by_label",
    # round-8 cross-snapshot pipeline (two-directory dataflow)
    "dedup_snapshot_merge",
    "documents_snapshot_quality_drift",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    names = sorted(QUERIES) if "--all" in sys.argv else HEADLINE
    spark = get_spark("arkflow-bench")
    # warm the JVM + parquet footers so timings measure the queries
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()

    # Each query runs three times: the first (cold) run pays one-time
    # whole-stage-codegen compilation (~1-4s/plan, measured), which on a
    # real cluster amortizes over terabytes per stage; the warm figure is
    # the MIN of the two following runs — the steady-state per-query cost
    # the 100 TB design cares about, robust to one-off GC/load spikes
    # (BENCH_r02 recorded a warm run slower than its cold run purely from
    # ambient load; min-of-two suppresses that artifact).
    #
    # The two warm runs are TEMPORALLY SEPARATED (r7 judge item 3): the
    # r7 anchor recorded x7 outliers (events_otsu_threshold 6.66s vs
    # 0.96s on re-run) because both back-to-back warm runs sat inside
    # the same ambient-load window, so min-of-two couldn't reject it.
    # Warm pass 1 runs right after each query's cold run; warm pass 2
    # runs as a second sweep over ALL queries after the first loop
    # finishes — minutes apart, so one load spike cannot inflate both
    # samples of any query. The per-query spread (max/min of the two
    # warm samples) ships in the payload; scripts/bench_compare.py
    # flags entries whose spread exceeds ~1.3x as noise-suspect.
    #
    # Cache policy (r5 ADVICE): spark.catalog.clearCache() runs BEFORE
    # EVERY timed run. Without it, Spark's CacheManager substitutes the
    # cold run's still-persisted intermediates into the warm runs'
    # identical logical plans, so 'warm' silently excluded the cost of
    # building every .persist()ed intermediate AND MEMORY_AND_DISK
    # blocks accumulated unbounded across the whole headline loop. Warm
    # now measures steady-state RECOMPUTATION (codegen warm, caches
    # cold). Deliberate exception: materialized bucketed INDEX TABLES
    # (the co-purchase edge index, the IVF assignment, the pagerank /
    # label-prop indexes — functions/indexes.py) live on DISK and
    # survive clearCache by design: cross-run amortization is their
    # contract, the first (cold) run of each consumer pays the build.
    per_query: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    warm1: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        warm1[name] = time.perf_counter() - t0
    for name in names:  # second warm sweep, minutes after the first
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        w2 = time.perf_counter() - t0
        lo, hi = sorted((warm1[name], w2))
        per_query[name] = round(lo, 3)
        spread[name] = round(hi / lo, 2) if lo > 0 else 1.0
    total = round(sum(per_query.values()), 3)
    cold_total = round(sum(cold.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Key order matters: the driver records a truncated slice of this
    # line (BENCH_r03 lost the warm dict), so every scalar headline
    # number appears BOTH in the first ~200 bytes AND in the trailing
    # ~100 bytes — whichever side of the truncation survives carries
    # warm/cold totals. Dicts (warm first — the steady-state number the
    # 100 TB design cares about) sit in the middle.
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "warm_total": total,
        "cold_total": cold_total,
        "n_queries": len(per_query),
        "sf": sf_val,
        "queries": per_query,
        "cold_queries": cold,
        "warm_spread": spread,
        "tail_warm_total": total,
        "tail_cold_total": cold_total,
        "tail_sf": sf_val,
        "cache_policy": "clearCache-before-every-run",
    }
    # r9 (VERDICT r8 item 2): cap the one-line stdout payload so it
    # survives the driver's capture untruncated — BENCH_r07's tail was
    # unparseable and PERF_r08 got an empty common set. `cold_queries`
    # (~14 KB of the ~42 KB line) moves to the committed file only;
    # the contract dict (`queries`), the noise instrument
    # (`warm_spread`) and every scalar stay on stdout. No timing or
    # methodology change — the same numbers are measured and all of
    # them are persisted in BENCH_local.json below.
    stdout_payload = {
        k: v for k, v in payload.items() if k != "cold_queries"
    }
    print(json.dumps(stdout_payload))
    # The driver records only a truncated tail of stdout (BENCH_r03/r04
    # lost the per-query dicts), so ALSO persist the full result in-repo
    # — committed each round as the round-over-round per-query history
    # the judge asked for (VERDICT r4, missing #4 / next #3).
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
