"""File-format round trips through the engine's file source/sink
(reference: input/file.rs supports Avro/Arrow/JSON/CSV/Parquet; Spark covers
parquet/csv/json/orc/text natively; avro needs the spark-avro jar)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arkflow_spark.registry import INPUTS, OUTPUTS, load_all


@pytest.mark.parametrize("fmt,options", [
    ("parquet", {}),
    ("orc", {}),
    ("json", {}),
    ("csv", {"header": "true", "inferSchema": "true"}),
])
def test_roundtrip(spark, tmp_path, fmt, options):
    load_all()
    path = str(tmp_path / fmt)
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id BIGINT, s STRING, v DOUBLE"
    )
    OUTPUTS.build(
        {"type": "file", "path": path, "format": fmt, "mode": "overwrite",
         "options": options}
    ).write_batch(df)
    back = INPUTS.build(
        {"type": "file", "path": path, "format": fmt, "options": options}
    ).read_batch(spark)
    got = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_file_source_sql_at_read(spark, tmp_path):
    """SQL-at-read option (reference: input/file.rs 'sql' config)."""
    load_all()
    path = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    ).write.parquet(path)
    src = INPUTS.build(
        {"type": "file", "path": path,
         "sql": "SELECT k, count(*) AS n FROM flow GROUP BY k"}
    )
    rows = {r["k"]: r["n"] for r in src.read_batch(spark).collect()}
    assert rows == {i: 20 for i in range(5)}


def test_partitioned_write(spark, tmp_path):
    load_all()
    path = str(tmp_path / "part")
    df = spark.range(40).select(F.col("id"), (F.col("id") % 4).alias("dt"))
    OUTPUTS.build(
        {"type": "file", "path": path, "partition_by": ["dt"],
         "mode": "overwrite"}
    ).write_batch(df)
    # partition pruning: reading one partition touches one directory
    one = spark.read.parquet(path).filter(F.col("dt") == 2)
    assert one.count() == 10
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan or "dt#" in plan
