"""Correlated-lateral and DISTINCT ON query shapes.

Neither appears in the reference's DataFusion surface (no LATERAL or
DISTINCT ON in docs/docs/sql/2-select.md) — both are beyond-reference
extensions a Postgres/DuckDB migrant expects from an analytics engine,
verified against DuckDB's native implementations of the same clauses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arkflow_spark.functions.compat import translate_sql
from arkflow_spark.queries.base import query
from arkflow_spark.tables import load


@query(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 3
    ) o
    WHERE c.c_custkey < 200
    ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-3
    orders per customer) — the Postgres/DuckDB "lateral top-k" idiom,
    parsed natively by Spark's LATERAL subquery support and verified
    against DuckDB's literal LATERAL.

    Scale notes: Catalyst decorrelates the lateral into a window
    (row_number over o_custkey) + filter rather than a per-row nested
    loop, so the plan is one shuffle on the join key followed by a
    broadcast/sort-merge join — the same shape as the hand-written
    QUALIFY rewrite, with no row-at-a-time re-execution. An inner LIMIT
    bounds output to 3x customers regardless of order fan-in.
    """
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) o
        WHERE c.c_custkey < 200
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """
    )


@query(
    "distinct_on_latest",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice
    FROM orders
    WHERE o_custkey < 300
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def distinct_on_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres ``SELECT DISTINCT ON`` — latest order per customer with a
    deterministic (orderdate DESC, orderkey DESC) tie-break. The Spark
    side runs the *same statement text* through the dialect layer's
    DISTINCT ON rewrite (``functions/compat.translate_sql``:
    row_number-partition-filter expansion), so the rewrite itself is what
    the oracle adjudicates — DuckDB executes its native DISTINCT ON.

    Scale notes: the rewrite plans as a single shuffle on o_custkey with
    the rank filter applied post-window; with AQE the filter's
    selectivity (1 row per key) collapses the follow-up exchanges. The
    grouped max_by(struct) alternative trades the sort for a hash
    aggregate — both are one-exchange plans.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        translate_sql(
            """
            SELECT DISTINCT ON (o_custkey)
                   o_custkey, o_orderkey,
                   date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
                   o_totalprice
            FROM orders
            WHERE o_custkey < 300
            ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
            """
        )
    )


@query(
    "part_fuzzy_name_join",
    oracle="""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           a.n_parts AS parts_a, b.n_parts AS parts_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
)
def part_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (edit-distance) self-join on part names — the
    entity-resolution workhorse: candidate pairs come from an equi-join
    on a cheap blocking key (here the head noun), and the expensive
    levenshtein predicate verifies only within blocks. All-pairs edit
    distance is corpus-quadratic; blocking makes the cost
    sum-of-block-sizes², which is what every dedupe/record-linkage
    system (and the reference's levenshtein scalar, docs
    7-scalar_functions.md:1113) is actually used for at scale.

    The name table is pre-aggregated (distinct names + part counts), so
    the join runs over entities, not rows; at 100 TB the same plan holds
    with the block key salted if one noun dominates.
    """
    from pyspark.sql import functions as F

    p = load(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count("*").alias("n_parts"))
    noun = lambda c: F.element_at(F.split(F.col(c), " "), 2)
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("parts_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("parts_b")
    )
    return (
        a.join(
            b,
            (noun("name_a") == noun("name_b"))
            & (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= 3),
        )
        .select(
            "name_a",
            "name_b",
            "parts_a",
            "parts_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .orderBy("name_a", "name_b")
    )
