"""Query registry: importing this package registers every named query.

Modules self-register into :data:`arkflow_spark.queries.base.QUERIES` /
``ORACLE`` via the ``@query`` decorator; ``__spark_entry__.py`` re-exports
them for the driver contract.
"""

from arkflow_spark.queries.base import ORACLE, QUERIES  # noqa: F401

# Import order is unimportant; each module registers on import.
from arkflow_spark.queries import relational  # noqa: F401,E402
from arkflow_spark.queries import stats  # noqa: F401,E402
from arkflow_spark.queries import windows_q  # noqa: F401,E402

for _mod in (
    "tpch",
    "relational2",
    "udf_q",
    "scalar_q",
    "scalar2_q",
    "events_q",
    "text_q",
    "dedup_q",
    "vector_q",
    "multimodal_q",
    "streaming_q",
    "ml_q",
    "timeseries_q",
    "corpus_q",
    "analytics_q",
    "layout_q",
    "pq_q",
    "relational3",
    "text2_q",
    "graph_q",
    "analytics2_q",
    "analytics3_q",
    "analytics4_q",
    "analytics5_q",
    "analytics6_q",
    "analytics7_q",
    "analytics8_q",
    "analytics9_q",
    "analytics10_q",
    "analytics11_q",
    "analytics12_q",
    "analytics13_q",
    "analytics14_q",
    "analytics15_q",
    "analytics16_q",
    "analytics17_q",
    "analytics18_q",
    "analytics19_q",
    "analytics20_q",
    "analytics21_q",
    "analytics22_q",
    "analytics23_q",
    "analytics24_q",
    "analytics25_q",
    "analytics26_q",
    "analytics27_q",
    "analytics28_q",
    "analytics29_q",
    "analytics30_q",
    "analytics31_q",
    "analytics32_q",
    "analytics33_q",
    "analytics34_q",
    "analytics35_q",
    "analytics36_q",
    "analytics37_q",
    "analytics38_q",
    "analytics39_q",
    "analytics40_q",
    "analytics41_q",
    "analytics42_q",
    "analytics43_q",
    "analytics44_q",
    "analytics45_q",
    "analytics46_q",
    "analytics47_q",
    "analytics48_q",
    "analytics49_q",
    "analytics50_q",
    "analytics51_q",
    "analytics52_q",
    "analytics53_q",
    "analytics54_q",
    "analytics55_q",
    "analytics56_q",
    "analytics57_q",
    "analytics58_q",
    "analytics59_q",
    "analytics60_q",
    "analytics61_q",
    "analytics62_q",
    "analytics63_q",
    "analytics64_q",
    "analytics65_q",
    "analytics66_q",
    "analytics67_q",
    "analytics68_q",
    "analytics69_q",
    "analytics70_q",
    "analytics71_q",
    "analytics72_q",
    "analytics73_q",
    "analytics74_q",
    "analytics75_q",
    "analytics76_q",
    "analytics77_q",
    "analytics78_q",
    "analytics79_q",
    "analytics80_q",
    "analytics81_q",
    "analytics82_q",
    "analytics83_q",
    "analytics84_q",
    "analytics85_q",
    "analytics86_q",
    "analytics87_q",
    "analytics88_q",
    "analytics89_q",
    "analytics90_q",
    "analytics91_q",
    "analytics92_q",
    "analytics93_q",
    "analytics94_q",
    "analytics95_q",
    "analytics96_q",
    "analytics97_q",
    "analytics98_q",
    "analytics99_q",
    "analytics100_q",
    "analytics101_q",
    "analytics102_q",
    "analytics103_q",
    "analytics104_q",
    "analytics105_q",
    "analytics106_q",
    "analytics107_q",
    "analytics108_q",
    "analytics109_q",
    "analytics110_q",
    "analytics111_q",
    "analytics112_q",
):
    try:  # modules land incrementally; missing ones are fine, bugs are not
        __import__(f"arkflow_spark.queries.{_mod}")
    except ModuleNotFoundError as e:
        if e.name != f"arkflow_spark.queries.{_mod}":
            raise


# The driver's per-round correctness check samples the FIRST 50 registry
# entries in insertion order. Round-4 head, per VERDICT r3 items 1/2/6:
# (a) the 10 HUGEINT-oracle offenders fixed this round (6 driver-red in
# r3 + 4 latent never-sampled) plus agg_filter_clause's decimal
# normalization — the driver must prove the bug class dead; (b) the
# flagship; (c) round-4 NEW operators as they land (freshest claims
# first); (d) families no driver round has ever sampled (multimodal,
# scd2/merge_upsert, window emulations, udf, asof, scalar families).
# Everything else follows; local `scripts/check_parity.py
# --driver-strict` covers the full registry with the driver's own
# type-sensitive hash. Cumulative driver coverage is tracked in
# COVERAGE.md.
_DRIVER_PRIORITY = (
    # ========== ROUND-5 HEAD (the driver samples the first 50) ==========
    # r6 staging note: this round's sample covers the r5 head below
    # (changed queries + batches 46-55); the r5 LATER-SESSION batches
    # 68-107 (Hurst .. fan-out stability, appended after batch 67
    # below) have never been driver-sampled and should lead the r6
    # head — newest last-session batches 97-107 first (freshest
    # claims), then 68-96, then batches 56-67 remnants past this
    # round's 50-cut. Queries optimized this session (persist/
    # broadcast recompute fixes: pagerank_bipartite, transitivity
    # audit, novelty decay, assortativity, kcore, burrows, granger,
    # brier, ...) kept their oracles bit-identical — no re-proof
    # priority needed beyond the normal rotation.
    # (a) queries CHANGED this round — the driver must re-prove them:
    # ADVICE r4 semantic fixes (GPD PWM weight, inspection-paradox
    # baseline, ragged-embedding filters), the five corpus-scaled
    # window queries converted to functions/distributed_rank, three
    # more conversions found by the new gate (activation, KM, skyline),
    # two limit-before-rank rewrites, the session-addressed bucketed
    # indexes, and the NEW bucketed label-prop twin.
    "events_gpd_pot_fit",
    "events_inspection_paradox",
    "embedding_intrinsic_dim_twonn",
    "embedding_anisotropy",
    "customer_rfm_segments",
    "lineitem_abc_pareto",
    "lineitem_abc_migration",
    "lineitem_abc_xyz_matrix",
    "documents_curriculum_order",
    "events_activation_time_to_n",
    "events_survival_km",
    "orders_skyline_2d",
    "text_pmi_cooccurrence",
    "text_vocab_topk",
    "graph_pagerank_bucketed",
    "graph_community_label_prop_bucketed",
    "graph_community_label_prop",
    # (b) round-5 NEW operators (batches 46-47 — freshest claims first)
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
    # (b) round-5 batch 51 (hypothesis tests; kruskal + wilcoxon also
    # re-prove the distributed_rank permutation fix through the driver)
    "events_kruskal_wallis",
    "events_levene_bf",
    "events_jarque_bera",
    "events_wilcoxon_signed_rank",
    "events_benjamini_hochberg",
    # (b) round-5 batch 52 (density & structure)
    "events_dbscan_grid_1d",
    "events_kde_silverman_grid",
    "orders_chain_ladder",
    "events_quantile_normalization_map",
    # (b) round-5 batch 53 (linkage, CMS, lead-lag)
    "part_entity_resolution_fs",
    "agg_count_min_sketch",
    "events_granger_hourly",
    # (b) round-5 batch 54 (exact tau-b, Allan variance, turning points)
    "lineitem_kendall_tau",
    "events_allan_variance",
    "events_turning_points",
    # (b) round-5 batch 55 (JL audit, isotonic, Friedman, spectral H)
    "embedding_jl_distortion",
    "events_isotonic_hourly",
    "events_friedman_daily",
    "events_spectral_entropy",
    # (b) round-5 batch 56 (Theil decomposition, exact 2-changepoint,
    # EB shrinkage)
    "lineitem_theil_decomposition",
    "events_segmentation_2cp_daily",
    "events_eb_shrinkage",
    # (b) round-5 batch 57 (TOPSIS, centroid classifier, Erlang-C,
    # mojibake screen)
    "supplier_topsis_scorecard",
    "embedding_centroid_classifier",
    "events_erlang_staffing",
    "text_mojibake_garbage_screen",
    # (b) round-5 batch 58 (shot segmentation, MI, SampEn)
    "multimodal_shot_boundaries",
    "events_mutual_information",
    "events_sample_entropy",
    # (b) round-5 batch 59 (NDCG eval, Bradley-Terry, conformal)
    "ann_retrieval_ndcg",
    "documents_bradley_terry_sources",
    "events_conformal_interval",
    # (b) round-5 batch 60 (rate-limit audit, Syntetos-Boylan,
    # Markov hitting time)
    "events_sliding_rate_limit_audit",
    "part_demand_classification_syntetos",
    "events_markov_hitting_time",
    # (b) round-5 batch 61 (MMR rerank, Otsu, decile gains)
    "ann_mmr_rerank",
    "events_otsu_threshold",
    "customer_decile_gains",
    # (b) round-5 batch 62 (Shapley attribution, Gumbel EVT,
    # extraction rates)
    "events_shapley_attribution",
    "events_gumbel_block_maxima",
    "text_structured_extraction_rates",
    # (b) round-5 batch 63 (scan statistic, safety stock, 2-way ANOVA)
    "events_scan_statistic",
    "part_safety_stock_service_levels",
    "events_twoway_anova_unweighted",
    # (b) round-5 batch 64 (hubness, NB fit, word burstiness)
    "embedding_hubness_knn",
    "events_negbin_fit_userday",
    "text_word_burstiness",
    # (b) round-5 batch 65 (segmented OLS, energy distance)
    "lineitem_segmented_price_quantity",
    "events_energy_distance_cohorts",
    # (b) round-5 batch 66 (exact 1-D k-means, length mixture EM)
    "events_kmeans1d_binned",
    "documents_length_mixture_em",
    # (b) round-5 batch 67 (runs test, Kneedle knee)
    "events_runs_test",
    "documents_quality_knee_kneedle",
    # (b) round-5 batch 68 (Hurst, Brier calibration, market basket)
    "events_hurst_aggvar",
    "events_brier_calibration",
    "orders_market_basket_lift",
    # (b) round-5 batch 69 (Cohen's kappa, Good-Turing, budget pack)
    "documents_cohen_kappa",
    "text_good_turing",
    "documents_token_budget_pack",
    # (b) round-5 batch 70 (exact AUC, importance ESS, Burrows Delta)
    "events_roc_auc",
    "documents_importance_ess",
    "text_burrows_delta",
    # (b) round-5 batch 71 (PACF, pinball eval, split rate test)
    "events_pacf_durbin",
    "events_pinball_quantile_eval",
    "events_split_rate_test",
    # (b) round-5 batch 72 (aHash near-dup, Poisson surprise, absence)
    "multimodal_ahash_near_dup",
    "events_poisson_surprise",
    "events_absence_anomaly",
    # (b) round-5 batch 73 (paired t, triplet audit, revenue bridge)
    "events_paired_t_hod",
    "embedding_triplet_violations",
    "lineitem_revenue_bridge",
    # (b) round-5 batch 74 (sample KS, Wasserstein drift, PR dim)
    "events_sample_ks_representativeness",
    "events_wasserstein_drift",
    "embedding_effective_dim_pr",
    # (b) round-5 batch 75 (KMV intersection, value migration, CR4/HHI)
    "sketch_theta_intersection",
    "customer_value_migration",
    "lineitem_brand_concentration",
    # (b) round-5 batch 76 (burstiness B, gap sweep, key advisor)
    "events_interarrival_burstiness",
    "events_session_gap_sweep",
    "events_groupby_key_advisor",
    # (b) round-5 batch 77 (rare transitions, residuals, k-anonymity)
    "events_rare_transition_surprise",
    "customer_segment_nation_residuals",
    "events_k_anonymity_audit",
    # (b) round-5 batch 78 (cross-modal: length bias, cohesion)
    "embedding_length_centroid_corr",
    "embedding_source_cohesion",
    "ann_retrieval_length_bias",
    # (b) round-5 batch 79 (FK integrity, payload entropy, dedup QA)
    "dq_referential_integrity",
    "multimodal_payload_entropy",
    "dedup_transitivity_audit",
    # (b) round-5 batch 80 (MASE backtest, cluster-source NMI,
    # price dispersion)
    "events_forecast_mase_seasonal_naive",
    "embedding_cluster_source_nmi",
    "lineitem_part_price_dispersion",
    # (b) round-5 batch 81 (ICC, Neyman allocation, median polish)
    "events_icc_user_clustering",
    "documents_neyman_allocation",
    "events_median_polish_hourweek",
    # (b) round-5 batch 82 (experience curve, u-chart, compound
    # Poisson)
    "lineitem_experience_curve",
    "events_u_chart_error_rate",
    "events_compound_poisson_check",
    # (b) round-5 batch 83 (assortativity, extremal index, novelty
    # decay)
    "graph_degree_assortativity",
    "events_extremal_index_runs",
    "documents_novelty_decay_fit",
    # (b) round-5 batch 84 (hedonic OLS, activity Markov, bounces)
    "part_hedonic_price_2var",
    "events_user_activity_markov",
    "events_bounce_sessions",
    # (b) round-5 batch 85 (distance concentration, behavior lift,
    # balance propensity)
    "embedding_distance_concentration",
    "events_behavior_cooccurrence_lift",
    "customer_balance_order_propensity",
    # (b) round-5 batch 86 (priority fairness, month-end loading,
    # 2-sample AD)
    "orders_priority_lead_time",
    "orders_month_end_loading",
    "events_anderson_darling_2sample",
    # (b) round-5 batch 87 (Fisher dims, PK uniqueness, Gries DP)
    "embedding_fisher_ratio_dims",
    "dq_primary_key_uniqueness",
    "text_dispersion_dp",
    # (b) round-5 batch 88 (MCF, record surprise, intra-order DQ)
    "events_mean_cumulative_function",
    "events_record_surprise",
    "dq_intra_order_consistency",
    # (b) round-5 batch 89 (k sweep, temporal DQ, daily mix JS)
    "ann_knn_accuracy_sweep",
    "dq_temporal_ordering",
    "events_daily_mix_divergence",
    # (b) round-5 batch 90 (last-digit screen, id/time order,
    # vocab Jaccard)
    "dq_last_digit_uniformity",
    "dq_id_time_monotonicity",
    "text_source_vocab_jaccard",
    # (b) round-5 batch 91 (vintage curves, self-similarity, trade
    # imbalance)
    "orders_vintage_revenue_curves",
    "text_self_similarity_stride",
    "nation_trade_imbalance",
    # (b) round-5 batch 92 (ARCH LM, aspect audit, run lengths)
    "events_arch_lm_test",
    "multimodal_aspect_ratio_audit",
    "events_run_length_geometric_fit",
    # (b) round-5 batch 93 (whale curve, ts forensics, risk pooling)
    "customer_whale_curve",
    "dq_timestamp_truncation",
    "part_demand_pooling_benefit",
    # (b) round-5 batch 94 (IVF balance, positional style,
    # price realization)
    "ann_ivf_bucket_balance",
    "text_positional_length_profile",
    "part_price_realization",
    # (b) round-5 batch 95 (clumpiness, Simpson screen, enum drift)
    "customer_purchase_clumpiness",
    "lineitem_simpson_paradox_check",
    "dq_enum_domain_drift",
    # (b) round-5 batch 96 (lognormal check, bus factor, coverage)
    "orders_lognormal_fit_check",
    "events_user_concentration",
    "dq_embedding_coverage",
    # (b) round-5 batch 97 (transitivity, dup embeddings, sentences)
    "graph_clustering_coefficient",
    "embedding_duplicate_vectors",
    "text_sentence_length_profile",
    # (b) round-5 batch 98 (seasonal strength, cluster sizes, lang sig)
    "events_seasonal_strength",
    "dedup_cluster_size_histogram",
    "text_char_trigram_lang_signature",
    # (b) round-5 batch 99 (peak stability, transit profile, growth mix)
    "events_peak_hour_stability",
    "lineitem_return_rate_by_delay",
    "orders_new_vs_returning_revenue",
    # (b) round-5 batch 100 (status DQ, brand premium, label margins)
    "dq_order_line_status_consistency",
    "part_brand_price_positioning",
    "embedding_label_centroid_margin",
    # (b) round-5 batch 101 (richness, entropy rate, share shift)
    "text_herdan_richness_by_source",
    "text_bigram_entropy_rate",
    "supplier_share_shift",
    # (b) round-5 batch 102 (trajectories, HHI trend, dedup impact)
    "customer_value_trajectory",
    "orders_concentration_trend",
    "dedup_source_impact",
    # (b) round-5 batch 103 (session baskets, precision DQ, line bias)
    "events_session_basket_lift",
    "dq_decimal_precision_profile",
    "lineitem_line_position_profile",
    # (b) round-5 batch 104 (template prefixes, casing, FD strength)
    "text_template_prefix_audit",
    "text_casing_style_profile",
    "dq_functional_dependency_strength",
    # (b) round-5 batch 105 (retry dups, trading days, family mix)
    "dq_event_retry_duplicates",
    "orders_trading_day_adjustment",
    "part_product_family_mix",
    # (b) round-5 batch 106 (basket economics, brevity law, id gaps)
    "orders_basket_size_profile",
    "text_brevity_law_check",
    "dq_id_gap_census",
    # (b) round-5 batch 107 (churn hazard, promo trend, fan-out DQ)
    "customer_churn_hazard_by_tenure",
    "lineitem_promo_intensity_trend",
    "dq_fanout_ratio_stability",
    # (b) round-5 batch 108 (composition residuals, JSON profile, lines)
    "documents_lang_source_residuals",
    "events_json_prop_profile",
    "text_line_structure_profile",
    # (b) round-5 batch 109 (supplier overlap, digit semantics, CC)
    "supplier_top20_customer_overlap",
    "text_digit_token_profile",
    "graph_component_size_histogram",
    # (b) round-5 batch 110 (brand loyalty, probe cost, breadth)
    "part_brand_loyalty_repeat_rate",
    "ann_probe_cost_distribution",
    "events_feature_adoption_breadth",
    # (b) round-5 batch 111 (supplier volatility, IVF stability, ARPU)
    "supplier_revenue_volatility",
    "ann_ivf_assignment_stability",
    "orders_arpu_trend",
    # (b) round-5 batch 112 (money reconciliation, amplitude, LTV proxy)
    "dq_amount_reconciliation",
    "events_daily_amplitude",
    "customer_first_order_predictiveness",
    # (c) the staged never-driver-sampled rotation (r4 plan): batches
    # 39-42 remnants, then 44-45 remnants and earlier never-sampled
    # names
    "customer_bgnbd_palive",
    "orders_weibull_cycletime_fit",
    "events_ljung_box",
    "supplier_wilson_otd_ci",
    "documents_survivorship_golden",
    "events_winsorized_stats",
    "ann_ivf_pq_rerank",
    "ann_ivf_pq_recall_eval",
    "text_js_divergence_sources",
    "orders_littles_law_audit",
    "events_circular_hour_stats",
    "orders_croston_forecast",
    "documents_temperature_mix_weights",
    "events_running_records",
    "text_mattr_lexical_diversity",
    "events_decayed_rate",
    "lineitem_price_index",
    "text_vocab_coverage_curve",
    "events_threshold_flappiness",
    "customer_clv_discounted",
    "part_dual_sourcing_shares",
    "text_char_entropy",
    "orders_backlog_timeseries",
    "events_bootstrap_ci",
    "lineitem_price_elasticity",
    "documents_quality_threshold_sweep",
    "dedup_band_sweep",
    "events_lateness_watermark_audit",
    "customer_interpurchase_gaps",
    "lineitem_discount_anova",
    "events_uniform_sample_hashprio",
    "documents_rag_chunks",
    "events_hill_tail_index",
    # ========== below the 50-cut: round-4 driver-green head ==========
    # (a) round-3 HUGEINT fixes — six driver-red rows in CORRECTNESS_r03
    "events_apdex_score",
    "events_incident_mtbf",
    "documents_manifest_checksums",
    "events_dau_mau_stickiness",
    "events_error_budget_burn",
    "dedup_threshold_curve",
    # (a) the four latent HUGEINT oracles never yet sampled, now cast
    "documents_ngram_novelty",
    "documents_partition_advisor",
    "events_attribution",
    "events_concurrency_sweep",
    # (a) DECIMAL(38,2) -> DOUBLE normalization
    "agg_filter_clause",
    # (b) flagship
    "q1_pricing_summary",
    # (c) round-4 NEW operators, batches 35-38 (freshest claims first)
    "text_repeated_ngram_fractions",
    "events_hourweek_profile",
    "orders_eoq_replenishment",
    "events_hampel_outliers",
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
    # (d) one representative per never-driver-sampled FAMILY (verdict r3
    # item 6: breadth beats re-proving covered families; the rest of
    # each family stays below the cut for r5+ rotation)
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "multimodal_audio_frames",
    "multimodal_decode_stub",
    "orders_scd2_history",
    "orders_merge_upsert",
    "window_qualify_emulated",
    "window_count_distinct_emulated",
    "window_rolling_median",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_sql_registered",
    "udtf_word_explode",
    "events_asof_join",
    "join_range_interval",
    "join_lateral_topk",
    "scalar_date_bin",
    "scalar_json",
    "scalar_variant_shred",
    "sketch_rollup_hourly_daily",
    "ml_kmeans_ivf",
    "orders_otif_fill_rate",
    "dedup_substring_spans",
    "documents_ccnet_ppl_buckets",
    "dedup_edit_distance_blocked",
    "documents_tokenizer_fertility",
    "events_gini_concentration",
    "events_spc_xmr_chart",
    "events_theil_sen_trend",
    "events_burstiness_fano",
    "ann_sq8_topk",
    "ann_binary_hamming_topk",
    "embedding_label_outliers",
    "graph_degree_powerlaw",
    "documents_filter_funnel",
    "events_topk_drift_jaccard",
    "orders_open_aging_buckets",
    "text_mixed_script_ratio",
    "supplier_lead_time_scorecard",
    "documents_domain_cap_sample",
    "text_bigram_kn_logprob",
    "udf_pandas_window",
    "events_asof_join_tolerance",
    "events_asof_join_two_table",
    "pivot_event_types",
    "scalar_strings",
    "scalar_regex",
    "scalar_datetime",
    "events_skew_salted_agg",
    "text_lang_id",
    "text_token_count",
    "text_pii_redact",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_cluster_canonical",
    "documents_stratified_sample",
    "documents_pack_sequences",
    "documents_decontaminate",
    "events_markov_transitions",
    "part_fuzzy_name_join",
    "documents_dsir_weights",
    "embedding_pca_power",
    "lineitem_copurchase_pairs",
    # --- below the 50-cut from here (driver-green in earlier rounds or
    # covered by the full local strict parity sweep) ---
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_sketches",
    "events_cross_correlation",
    "events_top_paths",
    "events_trend_movers",
    "part_hierarchy_recursive",
    "window_ignore_nulls",
    "events_geo_grid_hotspots",
    "orders_incremental_agg_merge",
    "orders_cohort_revenue_ltv",
    "events_haar_wavelet",
    "events_periodogram",
    "text_readability_flesch",
    "events_diff_in_diff",
    "scalar_map_higher_order",
    "dedup_lsh_eval_pr",
    "text_langid_eval_confusion",
    "documents_weighted_sample_ares",
    "events_feature_crosses_hashed",
    "ann_hard_negatives",
    "events_power_analysis",
    "events_ar2_forecast",
    "text_code_detection",
    "scalar_fiscal_calendar",
    "orders_snapshot_diff",
    "events_peak_detection",
    "events_drift_psi",
    "lineitem_margin_waterfall",
    "orders_mix_shift_decomposition",
    "graph_kcore_peel",
    "events_forecast_eval_wape",
    "events_lttb_downsample",
    "scalar_aes_pii_vault",
    "orders_duplicate_payments",
    "orders_seasonal_index",
    "lineitem_supplier_hhi",
    "events_percentile_bands",
    "events_retention_halflife",
    "events_cuped_adjustment",
    "events_burst_hysteresis",
    "agg_bitmap_distinct",
    "text_rake_keywords",
    "scalar_try_functions",
    "text_bm25_search",
    "events_time_weighted_avg",
    "events_m4_downsample",
    "agg_heavy_hitters_mg",
    "dedup_url_canonical",
    "dq_profile_columns",
    "dq_validation_suite",
    "events_ddsketch_quantile",
    "text_bpe_pair_merge",
    "dedup_containment",
    "documents_length_band_filter",
    "events_cusum_alarm",
    "scalar_url_parse",
    "ann_knn_classify",
    "dedup_chunk_overlap",
    "events_holt_trend",
    "events_mahalanobis_outlier",
    # round-3 second-session additions (freshest claims first)
    "distinct_on_latest",
    "events_ohlc_bars",
    "events_counter_rate",
    "text_zipf_slope",
    "text_hapax_ratio",
    "text_bigram_logprob",
    "events_value_histogram",
    "documents_quality_classifier",
    "events_changepoint_score",
    "scalar_lambda_higher_order",
    "sketch_sliding_distinct",
    "graph_pagerank_bipartite",
    # round-3 third-session additions (freshest claims first)
    "events_sequence_pattern",
    "agg_sketch_setops",
    "events_welch_ttest",
    "events_running_reset_sum",
    "events_seasonal_residual",
    "events_histogram_equidepth",
    "agg_geo_harmonic_mean",
    "graph_triangle_count",
    "events_autocorr",
    "events_benford_deviation",
    "events_conversion_latency",
    "agg_mad_robust",
    "agg_trimmed_mean",
    "dedup_prefix_filter",
    "ann_mips_topk",
    "events_session_capped",
    "events_user_entropy",
    "orders_cycle_time_percentiles",
    "events_seasonality_r2",
    "scalar_bitwise_ops",
    "ann_truncation_recall",
    # round-3 session additions: timeseries gap-fill, corpus passes,
    # analytics, quantization, layout, QUALIFY
    "events_gapfill_locf",
    "events_gapfill_interpolate",
    "text_gopher_quality",
    "text_unigram_logprob",
    "text_line_dedup",
    "documents_domain_mixture",
    "embedding_normalize_quantize",
    "events_ewma",
    "events_anomaly_zscore",
    "events_funnel",
    "events_retention_cohort",
    "lineitem_zorder_layout",
    "ann_pq_topk",
    "events_multires_rollup",
    "dedup_incremental_snapshot",
    "events_windowed_topk",
    "documents_training_mix",
    # prior-round additions never driver-checked
    # scalar families
    # events / streaming-shaped
    # text pipeline
    # dedup / vectors
    # multimodal
    # round-2/3 training-pipeline gates
)


def _reorder_for_driver() -> None:
    head = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    assert len(head) == len(_DRIVER_PRIORITY), (
        sorted(set(_DRIVER_PRIORITY) - set(QUERIES))
    )
    ordered = head + [n for n in QUERIES if n not in set(head)]
    snapshot = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(snapshot)
    osnap = {n: ORACLE[n] for n in ordered if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(osnap)


_reorder_for_driver()
