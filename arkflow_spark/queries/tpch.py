"""TPC-H-shaped query suite (q2,q4,q6..q22) over the reduced test schema.

The reference's SQL processor executes arbitrary DataFusion SQL per batch
(crates/arkflow-plugin/src/processor/sql.rs:244); its documented surface
(docs/docs/sql/2-select.md, 4-subqueries.md, 5-aggregate_functions.md)
covers every clause these queries exercise: correlated/uncorrelated
subqueries, EXISTS/NOT EXISTS, IN, scalar subqueries, multi-way joins,
disjunctive predicates, HAVING over scalar subqueries, CTEs.

The driver's test schema drops partsupp / commit+receipt dates / shipmode /
container / phone, so each classic query keeps its *operator shape* with an
adapted predicate:
- partsupp        -> "offers" = per (l_partkey, l_suppkey) min unit price
- late delivery   -> l_shipdate > o_orderdate + INTERVAL N DAY
- shipmode        -> l_linestatus (low-cardinality categorical)
- container       -> p_size buckets
- phone cntrycode -> c_nationkey % 10

Scale stance: every query is declarative (DataFrame or spark.sql), so
Catalyst applies pushdown/pruning/decorrelation; fixed-cardinality dims
(region=5, nation=25) are broadcast explicitly, everything else is left to
AQE so plans degrade gracefully from sf0.01 to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arkflow_spark.queries.base import (
    davg,
    dsum,
    o_davg,
    o_dsum,
    query,
)
from arkflow_spark.tables import load


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# --------------------------------------------------------------------- q2
_Q2_SQL = """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu_supplier AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_price
    FROM part
    JOIN offers ON l_partkey = p_partkey
    JOIN eu_supplier ON s_suppkey = l_suppkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND unit_price = (
        SELECT MIN(o2.unit_price)
        FROM offers o2 JOIN eu_supplier e2 ON e2.s_suppkey = o2.l_suppkey
        WHERE o2.l_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """


@query("q2_min_cost_supplier", oracle=_Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery over a derived
    part-supplier "offers" relation (partsupp analog).

    Scale notes (r8): Catalyst decorrelates the scalar MIN to an agg +
    self-join that rebuilt the offers rollup from lineitem TWICE; the
    min-cost filter is instead one window MIN over p_partkey on the
    already-joined frame — the join on partkey brings every EU offer
    of each surviving partkey, so the per-partkey window min equals
    the subquery's min exactly (same doubles, order-independent MIN).
    One lineitem pass; supplier/nation/region dims broadcast.
    """
    li = load(spark, sf_dir, "lineitem")
    offers = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price"
        )
    )
    eu = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    base = p.join(
        offers, F.col("l_partkey") == F.col("p_partkey")
    ).join(eu, F.col("s_suppkey") == F.col("l_suppkey"))
    wmin = Window.partitionBy("p_partkey")
    return (
        base.withColumn(
            "_minp", F.min("unit_price").over(wmin)
        )
        .filter(F.col("unit_price") == F.col("_minp"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "unit_price",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------- q4
_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


@query("q4_order_priority", oracle=_Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join (late shipment stands in for
    commitdate<receiptdate) + priority rollup.

    Scale notes: EXISTS plans as a left-semi hash join on orderkey; the
    quarter filter pushes to the orders scan and prunes before the join.
    """
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


# --------------------------------------------------------------------- q6
@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {o_dsum('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, the pushdown litmus test.

    Scale notes: no join, no groupBy key — partial aggregation reduces each
    partition to one row; all three predicates push to the parquet scan
    (min/max rowgroup pruning on l_shipdate).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --------------------------------------------------------------------- q7
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {o_dsum('volume', 'revenue')}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume, disjunctive cross-nation filter.

    Scale notes: both nation joins broadcast (25 rows); the disjunctive
    nation-pair predicate filters early; remaining joins shuffle on their
    natural keys (suppkey, orderkey, custkey) with AQE choosing broadcast
    when the filtered sides fit.
    """
    n1 = F.broadcast(load(spark, sf_dir, "nation")).alias("n1")
    n2 = F.broadcast(load(spark, sf_dir, "nation")).alias("n2")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    pair = (
        (F.col("n1.n_name") == "NATION_3") & (F.col("n2.n_name") == "NATION_7")
    ) | ((F.col("n1.n_name") == "NATION_7") & (F.col("n2.n_name") == "NATION_3"))
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair)
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------- q8
@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_6' THEN volume ELSE 0 END)
                        AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share = conditional-sum / sum per year.

    Scale notes: 8-way join where all fixed dims broadcast; the p_type
    filter prunes part before the fact join; exact decimal sums make the
    share reproducible across partition orders, rounded to 4dp for
    cross-engine hash equality.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    cust = load(spark, sf_dir, "customer")
    n1 = F.broadcast(load(spark, sf_dir, "nation")).alias("n1")
    n2 = F.broadcast(load(spark, sf_dir, "nation")).alias("n2")
    region = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    volume = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,6)")
    base = (
        part.join(li, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(region, F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    target = F.when(F.col("nation") == "NATION_6", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum("volume").cast("double"), 4
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------- q9
@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {o_dsum('amount', 'sum_profit')}
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by nation and year (LIKE filter
    on part name; no supplycost column so profit = discounted price).

    Scale notes: LIKE '%bolt%' can't push to parquet stats but prunes part
    (2k rows/sf-scaled) before it joins lineitem; nation broadcasts; the
    25x~7 result grid aggregates map-side first.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        part.join(li, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# -------------------------------------------------------------------- q10
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {o_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           c_acctbal, n_name, c_mktsegment
    FROM customer
    JOIN orders  ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation  ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter.

    Scale notes: both selective filters (quarter, returnflag) push to
    scans; nation broadcasts; top-k via TakeOrderedAndProject, never a
    global sort.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment"
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# -------------------------------------------------------------------- q11
_Q11_SQL = """
    WITH nation_value AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM nation_value
    WHERE part_value > (
      SELECT SUM(part_value) * 0.001 FROM nation_value
    )
    ORDER BY part_value DESC, ps_partkey
    """


@query("q11_important_parts", oracle=_Q11_SQL)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value share within one nation exceeds a
    fraction of the total (HAVING over an uncorrelated scalar subquery).

    Scale notes: the CTE aggregates once and is reused for both the rows
    and the global-threshold scalar; Catalyst plans the scalar as a 1-row
    broadcast, so no second scan of lineitem at scale.
    """
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


# -------------------------------------------------------------------- q12
@query(
    "q12_ship_class_priority",
    oracle="""
    SELECT l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > o_orderdate + INTERVAL 14 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_ship_class_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix per shipping class (linestatus stands
    in for shipmode; the late-ship predicate for commit/receipt dates).

    Scale notes: year filter pushes to the lineitem scan; the join-side
    predicate (shipdate vs orderdate+14d) evaluates post-join inside the
    same stage; 2-row output so the final agg is trivial.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 14 DAY"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# -------------------------------------------------------------------- q13
@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer-order-count histogram (double aggregation over a
    left outer join, zero-order customers included).

    Scale notes: the outer join shuffles on custkey; the second groupBy is
    on the tiny derived key (c_count) and combines map-side; no skew risk
    because custkey is near-uniform.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# -------------------------------------------------------------------- q14
@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0
           * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                  AS DOUBLE), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share in a month (conditional agg ratio).

    Scale notes: month filter pushes to the lineitem scan (rowgroup
    pruning); part joins broadcast while it fits, shuffle-hash beyond; the
    two decimal sums share one aggregation pass.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return li.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            100.0 * F.sum(promo).cast("double") / F.sum(disc).cast("double"), 4
        ).alias("promo_revenue")
    )


# -------------------------------------------------------------------- q15
_Q15_SQL = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """


@query("q15_top_supplier", oracle=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (CTE reused by
    both the join and the scalar MAX subquery).

    Scale notes: the revenue CTE aggregates once; the MAX scalar reduces
    to a 1-row broadcast; supplier join broadcasts the (tiny) matching
    rows.
    """
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


# -------------------------------------------------------------------- q16
_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """


@query("q16_supplier_part_variety", oracle=_Q16_SQL)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class with a
    NOT IN exclusion subquery (negative-balance suppliers stand in for
    complaint suppliers).

    Scale notes: NOT IN plans as a null-aware anti join against a tiny
    broadcast side; COUNT(DISTINCT) expands to a two-phase aggregate so
    the distinct dedup happens map-side first.
    """
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q16_SQL)


# -------------------------------------------------------------------- q17
_Q17_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size <= 10
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem
        WHERE l_partkey = p_partkey
      )
    """


@query("q17_small_qty_revenue", oracle=_Q17_SQL)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue via a correlated AVG
    subquery per part (p_size bucket stands in for container).

    Scale notes: Catalyst decorrelates the per-part AVG into an aggregate
    + join on partkey, so lineitem is scanned twice but shuffled on the
    same key both times; the brand filter prunes the probe side early.
    """
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


# -------------------------------------------------------------------- q18
_Q18_SQL = """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 270
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """


@query("q18_large_volume_customers", oracle=_Q18_SQL)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders (IN over a grouped
    HAVING subquery).

    Scale notes: the IN subquery is itself an aggregation on orderkey —
    it plans as a semi join co-partitioned with the outer lineitem shuffle
    (same key), so AQE coalesces into adjacent stages; top-k via
    TakeOrderedAndProject.
    """
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    spark_sql = _Q18_SQL.replace(
        "strftime(o_orderdate, '%Y-%m-%d')", "date_format(o_orderdate, 'yyyy-MM-dd')"
    )
    return spark.sql(spark_sql)


# -------------------------------------------------------------------- q19
@query(
    "q19_disjunctive_filter",
    oracle=f"""
    SELECT {o_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three-way disjunctive join predicate (brand x size x
    quantity bands).

    Scale notes: the OR-of-ANDs splits into a pushable part filter
    (brand/size union) and a residual join condition; Catalyst extracts
    the common p_partkey equi-key so this stays a hash join, not a
    nested-loop.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# -------------------------------------------------------------------- q20
_Q20_SQL = """
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
      )
    ORDER BY s_name
    """


@query("q20_part_promotion_suppliers", oracle=_Q20_SQL)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of 'small%' parts with significant
    shipped volume (nested IN subqueries + grouped HAVING).

    Scale notes: innermost part filter broadcasts into a semi join on
    partkey; the volume HAVING aggregates on suppkey before the outer
    semi join, so only qualifying suppkeys move; nation broadcast.
    """
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20_SQL)


# -------------------------------------------------------------------- q21
_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """


@query("q21_waiting_suppliers", oracle=_Q21_SQL)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier finished
    orders (EXISTS + NOT EXISTS, both correlated; late = shipped >60d
    after order date).

    Scale notes: the hardest plan in the suite — two correlated
    existentials over the fact table become a left-semi and a left-anti
    join, all three lineitem sides shuffled on orderkey so AQE reuses one
    exchange; nation + status filters shrink the driving side first.
    """
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q21_SQL)


# -------------------------------------------------------------------- q22
_Q22_SQL = """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c_nationkey % 10 AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_nationkey % 10 IN (1, 3, 5, 7)
        AND c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer
          WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7)
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
            AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
        )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """


@query("q22_idle_customers", oracle=_Q22_SQL)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-idle customers per country code
    (nationkey%10 stands in for the phone prefix; "idle" = no order since
    mid-2000 because every customer in this dataset has *some* order;
    scalar AVG subquery + NOT EXISTS anti join).

    Scale notes: the AVG scalar broadcasts as a single row; NOT EXISTS
    becomes a left-anti join on custkey. AVG here is the plain double mean
    in both engines; its partition-order sensitivity is avoided by
    comparing, not emitting, the value (it only gates the filter, and the
    gap between account balances dwarfs 1-ulp differences).

    The emitted totacctbal is an exact decimal sum.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)
