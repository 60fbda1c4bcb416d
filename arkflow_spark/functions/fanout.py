"""Pre-fan-out repartition guard for small-split inputs.

A per-row fan-out (explode xB, shingle generation, broadcast-join
scoring) multiplies work WITHIN the stage that reads the source, so its
parallelism is capped at the number of input splits — and a small
single-row-group parquet file is ONE split no matter how many cores the
cluster has. At test scale this silently serializes an 80M-row explode
onto one task; at 100 TB the input already has thousands of splits and
no repartition is needed.

``parallelize_fanout`` adds the round-robin exchange ONLY when the
input's split count is below the cluster's parallelism — the shuffle
moves the small pre-fan-out rows (cheap), never the fan-out output. At
scale the guard sees enough splits and becomes a no-op, so the same
code is right at both ends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_fanout(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the cluster's default
    parallelism iff it currently has fewer than half that many
    partitions. Call immediately BEFORE a large per-row fan-out.

    Only safe when downstream results don't depend on row order within
    a partition (exact/keyed aggregations, total-order windows) — which
    is every oracled query in this repo by construction.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
