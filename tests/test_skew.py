from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arkflow_spark.functions.skew import (
    salted_agg,
    salted_broadcast_join,
    with_salt,
)


def test_salted_agg_matches_plain(spark):
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    plain = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": F.sum("v"), "n": F.count("v"), "mx": F.max("v")},
            n_salts=16,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_nondecomposable(spark):
    df = spark.range(10).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"a": F.avg("v")})


def test_salted_broadcast_join_matches_plain(spark):
    big = spark.range(5000).select(
        (F.when(F.col("id") < 4500, 1).otherwise(F.col("id") % 10)).alias("k"),
        F.col("id").alias("v"),
    )  # key 1 is hot (90% of rows)
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], "k BIGINT, name STRING"
    )
    plain = big.join(small, "k").groupBy("name").count()
    salted = salted_broadcast_join(big, small, "k", n_salts=4).groupBy(
        "name"
    ).count()
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_deterministic_salt(spark):
    df = spark.range(100).select(F.col("id"))
    a = with_salt(df, 8, deterministic_by="id").collect()
    b = with_salt(df, 8, deterministic_by="id").collect()
    assert a == b
