"""parallelize_fanout: the pre-fan-out repartition guard.

Single-row-group parquet gives Spark ONE input split, so a per-row
fan-out (explode xB, broadcast-join scoring) runs on one task no matter
the cluster size. The guard repartitions small-split inputs to the
default parallelism and is a no-op once the input already has enough
splits — verified against both shapes here, plus the two hot queries
that carry it (bootstrap CI, kNN classify) keeping a round-robin
exchange in their plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arkflow_spark.functions.fanout import parallelize_fanout
from arkflow_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_small_input_is_repartitioned(spark):
    one = spark.range(100).coalesce(1)
    out = parallelize_fanout(one)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # values survive the round-robin exchange
    assert out.agg(F.sum("id")).collect()[0][0] == 4950


def test_wide_input_is_left_alone(spark):
    p = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(p)
    out = parallelize_fanout(wide)
    assert out is wide  # identity, no added exchange


def test_fanout_queries_parallelize_the_scan(spark):
    # the two fan-out-heavy carriers must keep a round-robin exchange
    # ahead of their heavy stage when reading single-split test files
    for name in ("events_bootstrap_ci", "ann_knn_classify"):
        plan = (
            QUERIES[name](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "RoundRobinPartitioning" in plan, name
