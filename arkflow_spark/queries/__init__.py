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
    "analytics113_q",
    "analytics114_q",
    "analytics115_q",
    "analytics116_q",
    "analytics117_q",
    "analytics118_q",
    "analytics119_q",
    "analytics120_q",
    "analytics121_q",
    "analytics122_q",
    "analytics123_q",
    "analytics124_q",
    "analytics125_q",
    "analytics126_q",
    "analytics127_q",
    "analytics128_q",
    "analytics129_q",
    "analytics130_q",
    "analytics131_q",
    "analytics132_q",
    "analytics133_q",
    "analytics134_q",
    "analytics135_q",
    "analytics136_q",
):
    try:  # modules land incrementally; missing ones are fine, bugs are not
        __import__(f"arkflow_spark.queries.{_mod}")
    except ModuleNotFoundError as e:
        if e.name != f"arkflow_spark.queries.{_mod}":
            raise


# The driver's per-round correctness check samples the FIRST 50 registry
# entries in insertion order. ROUND-8 HEAD, per VERDICT r7 item 1:
# the three deferred changed-dataflow re-proofs + the two r8
# closure-index conversions, then the 12 never-sampled r7 operators
# (batches 131-134), then oldest-never-sampled — 45 first-ever samples
# (cumulative ever-sampled reaches 325). driver_ledger.json is the
# authoritative sampled/never-sampled record (regenerate with
# scripts/driver_ledger.py; integrity pinned by
# tests/test_driver_ledger.py, which also asserts this head spends its
# slots on debt or changed dataflows, not idle re-proofs).
_DRIVER_PRIORITY = (
    # ---- r9 head (the driver samples the FIRST 50 registry entries).
    # 9 re-proof slots + 41 first-ever samples (cumulative ever-sampled
    # reaches 366 if all land). Re-proof slots go to dataflows REWRITTEN
    # in r8/r9 that the driver has not hash-checked since the rewrite —
    # the protection the correctness gate exists for — before first-ever
    # coverage: graph_kcore_peel (r8 index adoption + r9 gather-form
    # peel), ann_ivf_assignment_stability (r9 argmin aggregate),
    # graph_triangle_count / graph_clustering_coefficient (r8 degree
    # orientation + r9 exchange-free degrees),
    # documents_dedup_quality_survivorship (r9 cluster-labels index
    # read), dedup_cluster_canonical (r8 signature carry + r9 refactor),
    # and VERDICT r8 item 8's named rewritten-but-never-resampled
    # trio q2_min_cost_supplier / events_hampel_outliers /
    # dq_sentinel_values. Then the 4 never-sampled r8 bench operators
    # + the 3 never-sampled r8 rewrites the VERDICT named, then the
    # oldest never-sampled backlog in registry order (the dq_intra /
    # median_polish entries double as r8-rewrite re-proofs):
    "graph_kcore_peel",
    "ann_ivf_assignment_stability",
    "graph_triangle_count",
    "graph_clustering_coefficient",
    "documents_dedup_quality_survivorship",
    "dedup_cluster_canonical",
    "q2_min_cost_supplier",
    "events_hampel_outliers",
    "dq_sentinel_values",
    "ann_pq_quantization_error",
    "ann_pq_reconstruction_by_label",
    "dedup_snapshot_merge",
    "documents_snapshot_quality_drift",
    "orders_littles_law_audit",
    "embedding_pca_power",
    "events_theil_sen_trend",
    "ann_pq_topk",
    "ann_ivf_pq_rerank",
    "ann_ivf_pq_recall_eval",
    "dq_last_digit_uniformity",
    "events_daily_mix_divergence",
    "dq_temporal_ordering",
    "ann_knn_accuracy_sweep",
    "dq_intra_order_consistency",
    "events_record_surprise",
    "events_mean_cumulative_function",
    "text_dispersion_dp",
    "dq_primary_key_uniqueness",
    "embedding_fisher_ratio_dims",
    "events_anderson_darling_2sample",
    "orders_month_end_loading",
    "orders_priority_lead_time",
    "customer_balance_order_propensity",
    "events_behavior_cooccurrence_lift",
    "events_bounce_sessions",
    "events_user_activity_markov",
    "part_hedonic_price_2var",
    "documents_novelty_decay_fit",
    "events_extremal_index_runs",
    "graph_degree_assortativity",
    "events_compound_poisson_check",
    "events_u_chart_error_rate",
    "lineitem_experience_curve",
    "events_median_polish_hourweek",
    "documents_neyman_allocation",
    "events_icc_user_clustering",
    "lineitem_part_price_dispersion",
    "embedding_cluster_source_nmi",
    "events_forecast_mase_seasonal_naive",
    "dedup_transitivity_audit",
    # ---- positions 51-52: r8/r9-touched but value-identical by
    # construction (customer_brand_switching: r8 struct-min arg-max,
    # interleaved-A/B + strict-parity proven; dedup_minhash_bbit_
    # calibration: r9 persist drop only, plan-level change, driver
    # green at r8 post-rewrite) — queued first for a future head
    # rather than displacing first-ever samples (the r7/r8 precedent).
    "customer_brand_switching",
    "dedup_minhash_bbit_calibration",
    # ---- remaining registry entries keep registration order (the
    # _reorder_for_driver fallback); the full per-round sampling
    # record lives in driver_ledger.json.
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
