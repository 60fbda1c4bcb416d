"""Window-function surface: ranking, analytic, frames.

Parity targets: docs/docs/sql/6-window_functions.md — full ROWS/RANGE frame
syntax (:91-124), ranking (:138-182), lag/lead/first/last/nth (:198-250).
Every ORDER BY includes a unique tiebreaker so both engines rank
identically. GROUPS frames are a documented gap (unsupported in Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arkflow_spark.queries.base import DUCK_TS_FMT, SPARK_TS_FMT, query
from arkflow_spark.tables import load


@query(
    "window_ranking",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           ROUND(percent_rank() OVER w, 4) AS prank,
           ROUND(cume_dist() OVER w, 4) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY rn <= 5
    ORDER BY c_mktsegment, rn
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile/percent_rank/cume_dist
    (reference: docs/docs/sql/6-window_functions.md:138-182).

    Scale notes: per-partition top-k via row_number — the filter runs before
    any global ordering, so only 5 rows per segment leave the window stage.
    """
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("prank"),
            F.round(F.cume_dist().over(w), 4).alias("cdist"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           lag(event_type) OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           lag(value, 2, -1.0) OVER w AS prev2_value,
           ROUND(value - COALESCE(lag(value) OVER w, value), 4) AS delta
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offsets and defaults
    (reference: docs/docs/sql/6-window_functions.md:210,236)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value")), 4
        ).alias("delta"),
    ).orderBy("user_id", "event_id")


@query(
    "window_frames_rows",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_sum3,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4) AS centered_avg5,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 4) AS running_sum,
           first_value(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS first_type,
           nth_value(event_type, 2) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_type
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, event_id
    """,
)
def window_frames_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS BETWEEN frames: moving/centered/running aggregates + first/nth
    (reference: docs/docs/sql/6-window_functions.md:91-124,198,250).

    ROWS-frame sums accumulate in deterministic row order (identical in both
    engines given the unique tiebreaker), so plain rounding suffices.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(wo.rowsBetween(-2, 0)), 4).alias("moving_sum3"),
        F.round(F.avg("value").over(wo.rowsBetween(-2, 2)), 4).alias("centered_avg5"),
        F.round(
            F.sum("value").over(wo.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_sum"),
        F.first("event_type").over(wo).alias("first_type"),
        F.nth_value("event_type", 2)
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("second_type"),
    ).orderBy("user_id", "event_id")


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
             AS n_similar_price
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN value-based frame
    (reference: docs/docs/sql/6-window_functions.md:91-124)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_similar_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_agg_over",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROUND(CAST(l_quantity AS DOUBLE)
                 / SUM(l_quantity) OVER (PARTITION BY l_orderkey), 4)
             AS qty_share,
           ROUND(MAX(l_extendedprice) OVER (PARTITION BY l_orderkey), 4)
             AS max_line_price,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
    FROM lineitem
    WHERE l_orderkey < 1000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_agg_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary aggregates OVER unordered partitions (whole-partition frame)
    (reference: docs/docs/sql/6-window_functions.md:125).

    l_quantity is integral-valued => partition sums are exact doubles in any
    accumulation order; the share division is then IEEE-identical.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_quantity").cast("double") / F.sum("l_quantity").over(w), 4)
        .alias("qty_share"),
        F.round(F.max("l_extendedprice").over(w), 4).alias("max_line_price"),
        F.count("*").over(w).alias("n_lines"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "window_groups_frame_emulated",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, o_orderdate,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS gsum,
             COUNT(*) AS gn
      FROM orders WHERE o_custkey < 50
      GROUP BY o_orderpriority, o_orderdate
    ), gg AS (
      SELECT o_orderpriority, o_orderdate,
             gsum + COALESCE(LAG(gsum) OVER w, 0) AS fsum,
             gn + COALESCE(LAG(gn) OVER w, 0) AS fn
      FROM g
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)
    )
    SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice,
           CAST(gg.fsum AS DOUBLE) AS grp_frame_sum,
           gg.fn AS grp_frame_n
    FROM orders o
    JOIN gg ON o.o_orderpriority = gg.o_orderpriority
           AND o.o_orderdate = gg.o_orderdate
    WHERE o.o_custkey < 50
    ORDER BY o.o_orderpriority, o.o_orderkey
    """,
)
def window_groups_frame_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frames (docs/docs/sql/6-window_functions.md:91-124), which
    Spark SQL does not parse, emulated EXACTLY: ``GROUPS BETWEEN n PRECEDING
    AND CURRENT ROW`` over ORDER BY k == ``RANGE BETWEEN n PRECEDING AND
    CURRENT ROW`` over ORDER BY dense_rank(k) — peer rows share a dense
    rank, so rank-distance counts whole peer groups. DuckDB doesn't
    implement GROUPS frames either, so the oracle verifies through an
    independent construction: per-peer-group aggregation + group-level LAG
    joined back to rows.

    Scale notes: two window passes over the same partitioning — the second
    reuses the first's sort/shuffle (no extra Exchange in the plan).
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    part = Window.partitionBy("o_orderpriority")
    rnk = F.dense_rank().over(part.orderBy("o_orderdate"))
    frame = (
        part.orderBy("grp_rnk").rangeBetween(-1, Window.currentRow)
    )
    return (
        orders.withColumn("grp_rnk", rnk)
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .over(frame)
            .cast("double")
            .alias("grp_frame_sum"),
            F.count("*").over(frame).alias("grp_frame_n"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


@query(
    "window_qualify_emulated",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
    WHERE o_custkey < 30
    QUALIFY rk <= 3
    ORDER BY o_custkey, rk
    """,
)
def window_qualify_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-clause emulation: DuckDB/Snowflake/DataFusion accept
    ``QUALIFY <predicate over window fns>``; Spark SQL does not parse the
    clause, but the exact rewrite is mechanical — compute the window
    column in a subquery/projection, then filter on it. The oracle runs a
    literal QUALIFY so the rewrite is verified against the real clause.

    Scale notes: the rewrite plans identically to a native QUALIFY —
    one shuffle on the partition key, the filter applied post-window with
    no extra exchange. For top-k per key at extreme k/key skew the
    groupBy + min_by/slice pattern (see text_vocab_topk) avoids the full
    sort."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    rk = F.row_number().over(
        Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
    )
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", rk)
        .where("rk <= 3")
        .orderBy("o_custkey", "rk")
    )


@query(
    "window_count_distinct_emulated",
    oracle=f"""
    SELECT event_type, strftime(ts, '{DUCK_TS_FMT}') AS ts, event_id,
           count(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS running_users
    FROM events
    ORDER BY event_type, ts, event_id
    """,
)
def window_count_distinct_emulated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — Spark rejects distinct
    aggregates in window frames, but the exact rewrite is mechanical:
    flag each row that is its key's FIRST occurrence in the partition
    order (row_number over (partition, value) == 1), then running-sum
    the flags. DuckDB executes its native ``count(DISTINCT) OVER`` as
    the oracle, so the rewrite is verified against the real clause.

    Two window passes over one (event_type)-shuffle: the first-occurrence
    rank partitions by (event_type, user_id) — same top-level key, AQE
    keeps it one exchange + local sorts. State at 100 TB: nothing beyond
    the sort; contrast with the sketch path (`sketch_sliding_distinct`)
    when approximate running distincts suffice.
    """
    e = load(spark, sf_dir, "events")
    first_occ = (
        F.row_number().over(
            Window.partitionBy("event_type", "user_id").orderBy(
                "ts", "event_id"
            )
        )
        == 1
    ).cast("bigint")
    running = F.sum("__first").over(
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.select(
            "event_type",
            "ts",
            "event_id",
            first_occ.alias("__first"),
        )
        .select(
            "event_type",
            F.date_format("ts", SPARK_TS_FMT).alias("ts"),
            "event_id",
            running.alias("running_users"),
        )
        .orderBy("event_type", "ts", "event_id")
    )
