"""Data-layout operator: Z-order (Morton) clustering index over two join
keys — the multi-dimensional sort a 100 TB table is rewritten into so
min/max file statistics prune scans on EITHER key.

A single-column sort gives perfect pruning on one key and none on the
other; interleaving the key bits (Morton code) bounds every file's
(partkey, suppkey) rectangle, so filters on either dimension skip most
files (Delta/Iceberg `OPTIMIZE ZORDER BY` do exactly this before writing).
The query computes the code and proves the locality property the layout
relies on: each Z-bucket's min/max span on both dimensions is a small
fraction of the key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load

_BITS = 16  # keys masked to 16 bits -> 32-bit Morton code


def _morton_sql(x: str, y: str) -> str:
    """DuckDB expression interleaving the low 16 bits of x (even positions)
    and y (odd positions)."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _morton_col(x, y):
    """Spark twin of :func:`_morton_sql` (same bit placement)."""
    z = F.lit(0).cast("bigint")
    for i in range(_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


@query(
    "lineitem_zorder_layout",
    oracle=f"""
    WITH mx AS (
      SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem
    ),
    s AS (
      SELECT l_partkey, l_suppkey,
             CAST(l_partkey * 65535 // mp AS BIGINT) AS xs,
             CAST(l_suppkey * 65535 // ms AS BIGINT) AS ys
      FROM lineitem CROSS JOIN mx
    ),
    z AS (
      SELECT l_partkey, l_suppkey, xs, ys,
             ({_morton_sql("xs", "ys")}) AS zval
      FROM s
    )
    SELECT zval >> 24 AS zbucket, count(*) AS n_rows,
           min(l_partkey) AS part_min, max(l_partkey) AS part_max,
           min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max,
           ((max(xs) - min(xs)) <= 16384)
             AND ((max(ys) - min(ys)) <= 16384) AS bounded_rectangle
    FROM z GROUP BY zbucket ORDER BY zbucket
    """,
)
def lineitem_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code layout over (l_partkey, l_suppkey): compute the 32-bit
    Z-value, bucket by its top 8 bits (the file boundary a writer would
    use), and emit per-bucket min/max spans on both dimensions.

    ``bounded_rectangle`` asserts the property that makes the layout
    worth a rewrite: the top 8 Morton bits are the 4 high bits of each
    key, so every bucket's span on BOTH keys is <= 2^14 of the 2^16 key
    space — i.e. min/max file stats prune on either key. The code is a
    narrow projection (zero shuffles); the bucket aggregation is the
    usual map-side-combinable count. To actually lay out a table:
    ``df.repartitionByRange(n, zval).sortWithinPartitions(zval)`` then
    write — same expression, no new machinery."""
    li = load(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    )
    s = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey",
        "l_suppkey",
        # integer division (`div`), matching DuckDB's `//` exactly — a
        # double-division path could round a near-multiple across the floor
        F.expr("(l_partkey * 65535) div mp").alias("xs"),
        F.expr("(l_suppkey * 65535) div ms").alias("ys"),
    )
    z = s.withColumn("zval", _morton_col(F.col("xs"), F.col("ys")))
    return (
        z.groupBy(F.shiftright("zval", 24).alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("part_min"),
            F.max("l_partkey").alias("part_max"),
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
            (
                ((F.max("xs") - F.min("xs")) <= 16384)
                & ((F.max("ys") - F.min("ys")) <= 16384)
            ).alias("bounded_rectangle"),
        )
        .orderBy("zbucket")
    )
