"""Aggregate-function surface: stats family, distinct, approx sketches.

Parity targets: docs/docs/sql/5-aggregate_functions.md — var/stddev/corr/
covar/regr_* (:397-741), median (:303), approx_distinct (:749),
approx_percentile_cont (:795). Variance-family results are rounded to 4
decimals in both engines: relative FP error from differing reduction order
is ~1e-12, far below the rounding quantum, so hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query, r4
from arkflow_spark.tables import load


@query(
    "agg_stats_family",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
           ROUND(var_samp(l_extendedprice), 4) AS var_price,
           ROUND(stddev_pop(l_extendedprice), 4) AS stdp_price,
           ROUND(var_pop(l_extendedprice), 4) AS varp_price,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qty_price,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qty_price,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/var/corr/covar/regr_* family
    (reference: docs/docs/sql/5-aggregate_functions.md:397-741)."""
    li = load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            r4(F.stddev_samp(p), "std_price"),
            r4(F.var_samp(p), "var_price"),
            r4(F.stddev_pop(p), "stdp_price"),
            r4(F.var_pop(p), "varp_price"),
            r4(F.corr(q, p), "corr_qty_price"),
            r4(F.covar_samp(q, p), "covs_qty_price"),
            r4(F.covar_pop(q, p), "covp_qty_price"),
            r4(F.regr_slope(p, q), "slope"),
            r4(F.regr_intercept(p, q), "intercept"),
            r4(F.regr_r2(p, q), "r2"),
            F.regr_count(p, q).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_minmax_bool_bit",
    oracle="""
    SELECT o_orderstatus,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           bit_and(o_orderkey) AS band,
           bit_or(o_orderkey) AS bor,
           bit_xor(o_orderkey) AS bxor
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_minmax_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max + bool_and/bool_or + bit_and/or/xor
    (reference: docs/docs/sql/5-aggregate_functions.md:91-150)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.bit_and("o_orderkey").alias("band"),
            F.bit_or("o_orderkey").alias("bor"),
            F.bit_xor("o_orderkey").alias("bxor"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT CAST(floor(value) AS BIGINT)) AS n_int_values
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ...) — exact distinct aggregation
    (reference: docs/docs/sql/5-aggregate_functions.md:173)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            # explicit floor: Spark's double->int cast truncates while
            # DuckDB's rounds, so neither cast is oracle-safe
            F.countDistinct(F.floor("value")).alias("n_int_values"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_median_percentile",
    oracle="""
    SELECT event_type,
           ROUND(median(value), 4) AS med_value,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.90), 4) AS p90,
           ROUND(CAST(quantile_disc(value, 0.5) AS DOUBLE), 4) AS p50_disc
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median + continuous/discrete percentiles
    (reference: docs/docs/sql/5-aggregate_functions.md:303,795).

    Exact `percentile` (not approx_percentile) so values equal DuckDB's
    quantile_cont/quantile_disc bit-for-bit before rounding.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            r4(F.median("value"), "med_value"),
            r4(F.percentile("value", F.lit(0.25)), "p25"),
            r4(F.percentile("value", F.lit(0.90)), "p90"),
            r4(
                F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").cast(
                    "double"
                ),
                "p50_disc",
            ),
        )
        .orderBy("event_type")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS users_within_bound,
           COUNT(DISTINCT value) AS exact_values,
           TRUE AS values_within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++)
    (reference: docs/docs/sql/5-aggregate_functions.md:749 approx_distinct).

    Sketch estimates are engine-specific, so the hashable output is the
    exact distinct plus a deterministic ``within_bound`` verdict: the HLL
    estimate must land within 3x its configured rsd of the exact count
    (0.15 for the default rsd=0.05, 0.03 for rsd=0.01). The oracle asserts
    the same exact counts and expects every verdict TRUE — an out-of-bound
    sketch hash-mismatches the driver row. At 100 TB HLL is the right
    default for distincts: it partial-aggregates map-side and merges
    associatively, while exact distinct shuffles all the keys.

    Plan note: the two exact COUNT(DISTINCT) columns exist purely for the
    verification gate and cost an Expand + 3 exchanges; the production
    shape (approx columns alone) is a single partial-aggregated exchange.
    """
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("_ap_u"),
        F.countDistinct("value").alias("exact_values"),
        F.approx_count_distinct("value", rsd=0.01).alias("_ap_v"),
    )
    return g.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_ap_u") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("users_within_bound"),
        "exact_values",
        (
            F.abs(F.col("_ap_v") - F.col("exact_values"))
            <= 0.03 * F.col("exact_values")
        ).alias("values_within_bound"),
    ).orderBy("event_type")


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT event_type,
           ROUND(CAST(quantile_disc(value, 0.5) AS DOUBLE), 4) AS p50_exact,
           TRUE AS p50_within_bound,
           ROUND(CAST(quantile_disc(value, 0.99) AS DOUBLE), 4) AS p99_exact,
           TRUE AS p99_within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch)
    (reference: docs/docs/sql/5-aggregate_functions.md:795).

    Hashable output = exact discrete percentile + a deterministic
    ``within_bound`` verdict: percentile_approx (which, like
    quantile_disc, returns an actual data value) must land within 5%
    relative of the exact discrete percentile. The oracle computes the
    same exact values and expects TRUE verdicts.
    """
    ev = load(spark, sf_dir, "events")

    def _disc(q: float) -> F.Column:
        return F.expr(
            f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)"
        ).cast("double")

    g = ev.groupBy("event_type").agg(
        _disc(0.5).alias("_p50_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("_p50_ap"),
        _disc(0.99).alias("_p99_exact"),
        F.percentile_approx("value", 0.99, 10000).alias("_p99_ap"),
    )

    def _ok(ap: str, ex: str) -> F.Column:
        return F.abs(F.col(ap) - F.col(ex)) <= (
            0.05 * (F.abs(F.col(ex)) + F.lit(1e-6))
        )

    return g.select(
        "event_type",
        F.round("_p50_exact", 4).alias("p50_exact"),
        _ok("_p50_ap", "_p50_exact").alias("p50_within_bound"),
        F.round("_p99_exact", 4).alias("p99_exact"),
        _ok("_p99_ap", "_p99_exact").alias("p99_within_bound"),
    ).orderBy("event_type")


@query(
    "agg_first_last_string",
    oracle="""
    SELECT user_id,
           first(event_type ORDER BY ts, event_id) AS first_event,
           last(event_type ORDER BY ts, event_id) AS last_event,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
           COUNT(*) AS n
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    LIMIT 100
    """,
)
def agg_first_last_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/string_agg as aggregates
    (reference: docs/docs/sql/5-aggregate_functions.md:203,253,349).

    Spark's first/last are order-nondeterministic, so order is imposed via
    min_by/max_by on a unique (ts, event_id) rank; string_agg is rebuilt
    deterministically with sort_array + array_join over a collected set.
    """
    ev = load(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_type", ordkey).alias("first_event"),
            F.max_by("event_type", ordkey).alias("last_event"),
            F.array_join(
                F.sort_array(F.collect_set("event_type")), ","
            ).alias("types_csv"),
            F.count("*").alias("n"),
        )
        .orderBy("user_id")
        .limit(100)
    )


@query(
    "agg_weighted_percentile",
    oracle="""
    WITH ordered AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS cum_w,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) FILTER (WHERE cum_w >= 0.5 * tot_w)
             AS weighted_median,
           MIN(l_extendedprice) FILTER (WHERE cum_w >= 0.9 * tot_w)
             AS weighted_p90
    FROM ordered
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted percentiles (median, p90) of price weighted by
    quantity — closes the approx_percentile_cont_with_weight gap
    (docs/docs/sql/5-aggregate_functions.md:820) with the exact
    cumulative-weight construction: first value whose running weight
    crosses q * total_weight.

    Scale notes: one window sort per group (same shuffle for both running
    and total sums, and quantities are integral doubles so sums are exact);
    the final aggregation is a conditional MIN — no second sort. At 100 TB
    swap in approx_percentile on pre-weighted expansion only if exactness
    can be traded away.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    part = Window.partitionBy("l_returnflag")
    ordered = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity")
        .over(part.orderBy("l_extendedprice", "l_orderkey", "l_linenumber"))
        .alias("cum_w"),
        F.sum("l_quantity").over(part).alias("tot_w"),
    )
    return (
        ordered.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(F.col("cum_w") >= 0.5 * F.col("tot_w"), F.col("l_extendedprice"))
            ).alias("weighted_median"),
            F.min(
                F.when(F.col("cum_w") >= 0.9 * F.col("tot_w"), F.col("l_extendedprice"))
            ).alias("weighted_p90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rnk
      FROM counts
    )
    SELECT user_id, event_type AS mode_event, n AS mode_count
    FROM ranked WHERE rnk = 1
    ORDER BY user_id
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mode()` aggregate (DataFusion aggregate docs surface; Spark 4
    `mode(col, deterministic=true)` = lowest value among ties, replicated
    in the oracle with an explicit count + deterministic-rank construction
    so both engines break frequency ties identically)."""
    e = load(spark, sf_dir, "events")
    modes = e.groupBy("user_id").agg(
        F.mode("event_type", True).alias("mode_event")
    )
    counts = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("mode_count")
    )
    return (
        modes.join(
            counts,
            (modes.user_id == counts.user_id)
            & (modes.mode_event == counts.event_type),
        )
        .select(modes.user_id, "mode_event", "mode_count")
        .orderBy("user_id")
    )


@query(
    "agg_sketches",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS exact_users,
           CAST(LEAST(3, COUNT(DISTINCT event_type)) AS INTEGER) AS topk_size,
           TRUE AS hll_union_within_bound,
           TRUE AS hll_direct_within_bound,
           TRUE AS theta_within_bound
    FROM events
    """,
)
def agg_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch surface (Spark 4 datasketches): per-group HLL
    sketches unioned into a global distinct estimate, theta sketch
    estimate, and approx_top_k frequent items — the 100 TB distinct-count
    shape (sketches partial-aggregate map-side and merge associatively,
    so the shuffle carries kilobyte sketches, not raw keys; the exact
    counterpart is `agg_count_distinct`/`agg_approx_distinct`).

    Hashable output = exact distinct count + per-sketch deterministic
    ``within_bound`` verdicts (5% relative of exact, ~3x the default HLL
    lgK=12 error) and the exact expected top-k size; the oracle asserts
    the same exact values with every verdict TRUE, so a drifting sketch
    hash-mismatches the driver row. Estimate accuracy is additionally
    asserted numerically in tests/test_components.py."""
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("ev_sk")
    return spark.sql(
        """
        WITH per_group AS (
          SELECT event_type, hll_sketch_agg(user_id) AS hll
          FROM ev_sk GROUP BY event_type
        ),
        est AS (
          SELECT
            (SELECT COUNT(DISTINCT user_id) FROM ev_sk) AS exact_users,
            (SELECT hll_sketch_estimate(hll_union_agg(hll)) FROM per_group)
              AS hll_union,
            (SELECT hll_sketch_estimate(hll_sketch_agg(user_id)) FROM ev_sk)
              AS hll_direct,
            (SELECT theta_sketch_estimate(theta_sketch_agg(user_id))
             FROM ev_sk) AS theta,
            (SELECT size(approx_top_k(event_type, 3)) FROM ev_sk)
              AS topk_size_raw
        )
        SELECT exact_users,
               CAST(topk_size_raw AS INT) AS topk_size,
               abs(hll_union - exact_users) <= 0.05 * exact_users
                 AS hll_union_within_bound,
               abs(hll_direct - exact_users) <= 0.05 * exact_users
                 AS hll_direct_within_bound,
               abs(theta - exact_users) <= 0.05 * exact_users
                 AS theta_within_bound
        FROM est
        """
    )


@query(
    "sketch_rollup_hourly_daily",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_bound
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, day
    """,
)
def sketch_rollup_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical sketch rollup: persist HOURLY HLL sketches, answer
    DAILY distinct-user questions by merging them — the continuous-
    aggregate pattern for distincts, where `events_multires_rollup`'s
    exact sums cannot work (distincts don't add across buckets; sketches
    union losslessly). At 100 TB the hourly sketch table IS the
    materialization: kilobytes per (series, hour), one raw-data pass,
    every coarser rollup derived by re-merge without touching raw events.

    Hashable output = exact daily distincts + a deterministic
    within-bound verdict on the merged estimate (5% relative, ~3x HLL
    lgK=12 error), plus the hour-bucket count that proves the daily row
    really came from 24-ish hourly partials.
    """
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    daily = hourly.groupBy("event_type", "day").agg(
        F.count("*").alias("n_hours"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    exact = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        daily.join(exact, ["event_type", "day"])
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_hours",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_within_bound"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "sketch_sliding_distinct",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS h, user_id FROM events
    ),
    win AS (
      SELECT event_type, h + to_hours(o.off) AS window_end, user_id
      FROM e, unnest(generate_series(0, 5)) o(off)
    )
    SELECT event_type,
           strftime(window_end, '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_bound
    FROM win
    GROUP BY event_type, window_end
    ORDER BY event_type, window_end
    """,
)
def sketch_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users (6-hour window, 1-hour slide) from
    MERGED HOURLY SKETCHES: each hourly HLL contributes to the 6 windows
    it falls in, so the slide costs a 6x fan-out of the tiny hourly
    sketch table — never a re-read or re-explode of raw events. This is
    the sliding-distinct pattern exact counts cannot sustain at scale:
    distincts don't subtract, sketches re-merge.

    The oracle computes the exact sliding distincts (raw events exploded
    into their 6 windows — affordable at verification scale, the very
    cost the sketch path avoids) and expects every merged estimate
    within 5% (≈3x HLL lgK=12 error).
    """
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    )
    slid = hourly.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(5))).alias("off"),
        "h",
        "sk",
    ).select(
        "event_type",
        (F.col("h") + F.make_interval(hours=F.col("off"))).alias(
            "window_end"
        ),
        "sk",
    )
    merged = slid.groupBy("event_type", "window_end").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = (
        e.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("off"),
            F.date_trunc("hour", "ts").alias("h"),
            "user_id",
        )
        .select(
            "event_type",
            (F.col("h") + F.make_interval(hours=F.col("off"))).alias(
                "window_end"
            ),
            "user_id",
        )
        .groupBy("event_type", "window_end")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        merged.join(exact, ["event_type", "window_end"])
        .select(
            "event_type",
            F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias(
                "window_end"
            ),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_within_bound"),
        )
        .orderBy("event_type", "window_end")
    )
