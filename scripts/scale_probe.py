"""Scale probe: run the heavy pipeline operators on a 10x corpus.

Synthesizes a 10x-documents / 10x-embeddings dataset from the sf0.1 test
tables (copies with perturbed ids/text/vectors — probe data for RUNTIME
scaling only; correctness stays pinned to the driver's oracle tables),
then times the bucketed-scale-path queries on sf0.1 vs 10x. Near-dup
structure is preserved across copies so LSH candidate volume grows
realistically (~10x), not degenerately.

Usage: python scripts/scale_probe.py [out_dir]
Prints one JSON line: {"queries": {name: {"sf0.1": s, "x10": s, "ratio": r}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arkflow_spark.queries import QUERIES
from arkflow_spark.session import get_spark
from arkflow_spark.tables import load

BASE = "/root/testdata/sf0.1"
PROBE_QUERIES = (
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "ann_ivf_assign",
    "ann_ivf_search",
    "text_tfidf",
    "dedup_exact",
    "text_quality_score",
    # round-3 corpus operators
    "text_line_dedup",
    "text_unigram_logprob",
    "text_gopher_quality",
    "documents_domain_mixture",
    "embedding_normalize_quantize",
    "ann_pq_topk",
    "dedup_incremental_snapshot",
    # round-3 second-session corpus operators
    "text_bigram_logprob",
    "text_zipf_slope",
    "text_hapax_ratio",
    "documents_quality_classifier",
    # round-3 fourth-session corpus operators
    "text_bm25_search",
    "dedup_url_canonical",
    "text_bpe_pair_merge",
    "dedup_containment",
    "documents_ngram_novelty",
    "text_readability_flesch",
    # round-4 corpus operators
    "dedup_semantic_cluster",
    "ann_ivf_pq_search",
    "ann_ivf_pq_rerank",
    "documents_survivorship_golden",
    "text_repeated_ngram_fractions",
    "text_js_divergence_sources",
    # round-5 corpus operators
    "text_heaps_law_fit",
    "dedup_minhash_bbit_calibration",
    "dedup_bloom_prefilter",
    "documents_cross_shard_overlap",
    "text_stopword_stylometry",
    # multimodal_* is NOT probe-compatible: the synthesized corpus
    # suffixes doc_id with "#c{i}" (string ids keep text near-dup
    # structure), so the multimodal family's CAST(doc_id AS BIGINT)
    # nulls out and the Arrow batch dtype collapses. Its scale story
    # is the payload-bounded frame fan-out (plan-evidenced in
    # SCALE.md), not corpus growth.
    "embedding_matryoshka_prefix_recall",
    "embedding_silhouette_simplified",
    "ann_cosine_range_search",
    "documents_curriculum_order",
    # round-7 conversions + index consumers: the blocked exact-kNN
    # audits (previously driver-collect / all-pairs — the probe shows
    # the new dataflow's growth), the signature-table family, and the
    # labels-index rollups
    "embedding_hubness_knn",
    "embedding_lof_simplified",
    "dedup_signature_slot_health",
    "documents_dedup_quality_survivorship",
    # round-8: PQ code-index consumers (stored codes scale with the
    # corpus; the audits are rollups of the stored table) and the
    # cross-snapshot pipeline (current side grows 10x, previous side
    # is the fixed fixture). The probe's string vec_ids exercise the
    # numeric coercion in the codebook filter; doc-id-joining
    # dedup_snapshot_merge sees every probe copy classify as 'new'
    # (string ids match nothing in the BIGINT previous snapshot) —
    # valid growth shape for the fingerprint join.
    "ann_pq_quantization_error",
    "ann_pq_reconstruction_by_label",
    "dedup_snapshot_merge",
    "documents_snapshot_quality_drift",
)
# relational shapes: facts scale 10x (offset keys keep joins consistent),
# dims stay fixed — the realistic 100 TB growth pattern
RELATIONAL_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "window_ranking",
    "events_tumbling_window",
    # round-3 analytics/timeseries/layout operators
    "events_gapfill_locf",
    "events_anomaly_zscore",
    "events_ewma",
    "events_funnel",
    "events_retention_cohort",
    "orders_scd2_history",
    "lineitem_zorder_layout",
    "events_multires_rollup",
    "events_windowed_topk",
    "orders_merge_upsert",
    # round-3 second-session relational/timeseries operators
    "join_lateral_topk",
    "distinct_on_latest",
    "events_ohlc_bars",
    "events_counter_rate",
    "events_value_histogram",
    "events_changepoint_score",
    "customer_rfm_segments",
    "sketch_rollup_hourly_daily",
    # round-3 fourth-session events/relational operators
    "events_m4_downsample",
    "events_time_weighted_avg",
    "agg_heavy_hitters_mg",
    "events_ddsketch_quantile",
    "events_geo_grid_hotspots",
    "events_top_paths",
    "orders_cohort_revenue_ltv",
    # round-4 analytics/supply/graph operators
    "graph_link_prediction_ra",
    "events_ks_test",
    "events_mann_whitney",
    "events_spearman_corr",
    "events_holt_winters",
    "events_sax_motifs",
    "events_winsorized_stats",
    "events_gpd_pot_fit",
    "events_ljung_box",
    "lineitem_newsvendor_qstar",
    "customer_bgnbd_palive",
    "lineitem_scd2_pit_revenue",
    "supplier_wilson_otd_ci",
    "orders_weibull_cycletime_fit",
    "events_hampel_outliers",
    "events_hourweek_profile",
    "orders_littles_law_audit",
    "events_circular_hour_stats",
    # round-5 distributed-rank conversions + new operators
    "lineitem_abc_pareto",
    "lineitem_abc_xyz_matrix",
    "events_survival_km",
    "events_activation_time_to_n",
    "orders_skyline_2d",
    "events_page_hinkley_drift",
    "orders_interrupted_time_series",
    "events_tail_codependence",
    "events_mann_kendall_trend",
    "lineitem_return_shrinkage",
    "graph_community_label_prop_bucketed",
    # round-8: closure-index consumers — 10x facts keep the part
    # catalog fixed, so the co-purchase graph DENSIFIES (support
    # counts scale ~10x and more edges clear the threshold): the
    # degree-oriented wedge join and the bounded propagation rounds
    # face superlinear edge growth, the shape the 100 TB story must
    # survive
    "graph_local_bridges",
    "graph_weak_tie_removal_impact",
    "graph_triangle_count",
)


def build(spark, out_dir: str, copies: int = 10) -> None:
    docs = load(spark, BASE, "documents")
    emb = load(spark, BASE, "embeddings")
    id_cols = {f.name for f in docs.schema.fields}
    doc_parts = []
    for i in range(copies):
        d = docs.withColumn("doc_id", F.concat(F.col("doc_id"), F.lit(f"#c{i}")))
        if i > 0 and "text" in id_cols:
            # perturb the tail so copies are near- (not exact-) duplicates
            d = d.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" probe variant {i}"))
            )
        doc_parts.append(d)
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb_parts = []
    for i in range(copies):
        # ids stay numeric: ann queries select the query set via
        # `vec_id < N` (numeric comparison) — offset, don't suffix
        e = emb.withColumn(
            "vec_id",
            (F.col("vec_id").cast("long") + F.lit(i * 100_000_000)).cast(
                "string"
            ),
        )
        if i > 0:
            # nudge one dimension so vectors are near- not exact-duplicates
            e = e.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: F.when(j == 0, x + 0.001 * i).otherwise(x),
                ),
            )
        emb_parts.append(e)
    out_e = emb_parts[0]
    for p in emb_parts[1:]:
        out_e = out_e.unionByName(p)
    out_e.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def _union_copies(df, copies, offset_cols: dict[str, int]):
    parts = []
    for i in range(copies):
        d = df
        for col, off in offset_cols.items():
            d = d.withColumn(col, F.col(col) + i * off)
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_relational(spark, out_dir: str, copies: int = 10) -> None:
    """10x facts (offset join keys keep referential consistency), fixed
    dims — the realistic growth pattern: at 100 TB it is lineitem/orders/
    events that grow, not nation/region/part."""
    KEY = 100_000_000
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"):
        load(spark, BASE, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    _union_copies(
        load(spark, BASE, "orders"), copies, {"o_orderkey": KEY}
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    _union_copies(
        load(spark, BASE, "lineitem"), copies, {"l_orderkey": KEY}
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    _union_copies(
        load(spark, BASE, "events"), copies, {"event_id": KEY}
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))


def main() -> None:
    relational = "--relational" in sys.argv
    only = [
        a.split("=", 1)[1].split(",")
        for a in sys.argv[1:]
        if a.startswith("--only=")
    ]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else (
        "/tmp/scale_probe_rel_x10" if relational else "/tmp/scale_probe_x10"
    )
    spark = get_spark("scale-probe")
    if relational:
        if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
            build_relational(spark, out_dir)
        probe_set = RELATIONAL_QUERIES
    else:
        if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
            build(spark, out_dir)
        probe_set = PROBE_QUERIES
    if only:
        probe_set = tuple(n for n in probe_set if n in set(only[0]))

    results = {}
    for name in probe_set:
        times = {}
        for label, sf_dir in (("sf0.1", BASE), ("x10", out_dir)):
            # cold-ish: fresh plan each call; min of 2 to drop codegen noise
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            times[label] = round(min(runs), 2)
        times["ratio"] = round(times["x10"] / max(times["sf0.1"], 1e-9), 1)
        results[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    metric = "scale_probe_relational_x10" if relational else "scale_probe_x10"
    print(json.dumps({"metric": metric, "queries": results}))


if __name__ == "__main__":
    main()
