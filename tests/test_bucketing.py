"""Bucketing: pre-shuffled storage so repeated joins/aggs on the bucket key
run with NO exchange — the standard 100 TB co-location technique."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf, set in session.py's builder
    orders = spark.range(10000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 100).alias("o_custkey")
    )
    lineitem = spark.range(40000).select(
        (F.col("id") % 10000).alias("l_orderkey"), F.col("id").alias("l_qty")
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast so the sort-merge path (what a 100 TB x 100 TB join
    # uses) is exercised; bucketing must then eliminate both exchanges
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert joined.count() == 40000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the shuffle happened once, at write time: no runtime Exchange
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join on plain frames has exchanges — proving the
    bucketing (not the data size) removed them."""
    a = spark.table("b_orders").select(F.col("o_orderkey") + 0)  # strip bucketing
    plan = (
        spark.table("b_orders")
        .select((F.col("o_orderkey") + 0).alias("k"))
        .join(
            spark.table("b_lineitem").select(
                (F.col("l_orderkey") + 0).alias("k2")
            ),
            F.col("k") == F.col("k2"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan
