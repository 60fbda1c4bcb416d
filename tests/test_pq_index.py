"""functions/pq — the materialized PQ code index (sixth index family).

The stored (vec_id, s, code, d2) table must equal the inline
broadcast-codebook argmin it replaced row-for-row (same fixed-order
double fold, same struct-min tie-break), materialize bucketed on
vec_id, and short-circuit on the second call.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arkflow_spark.functions.pq import (
    K,
    d2,
    pq_codes,
    subspaces,
)
from arkflow_spark.tables import load
from tests.conftest import SF_SMOKE


def _inline_codes(spark):
    e = load(spark, SF_SMOKE, "embeddings")
    cb = subspaces(e.filter(F.col("vec_id") < K), "code")
    return (
        subspaces(e, "vec_id")
        .join(F.broadcast(cb.withColumnRenamed("sub", "cb_sub")), "s")
        .select(
            "vec_id",
            "s",
            F.struct(
                d2(F.col("sub"), F.col("cb_sub")).alias("d2"),
                F.col("code").alias("code"),
            ).alias("dc"),
        )
        .groupBy("vec_id", "s")
        .agg(F.min("dc").alias("best"))
        .select(
            "vec_id",
            "s",
            F.col("best.code").alias("code"),
            F.col("best.d2").alias("d2"),
        )
    )


def test_pq_codes_equal_inline_assignment(spark):
    stored = {tuple(r) for r in pq_codes(spark, SF_SMOKE).collect()}
    live = {tuple(r) for r in _inline_codes(spark).collect()}
    assert stored == live and stored  # exact doubles, by construction


def test_pq_codes_materialize_bucketed_and_short_circuit(spark):
    pq_codes(spark, SF_SMOKE)
    df = pq_codes(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_pq_codes_b" in plan
    # a served read is a bare table scan — no argmin join in the plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    from arkflow_spark.functions.indexes import index_table_name

    nb = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    table = index_table_name(
        spark, f"{SF_SMOKE}#pq4x16", nb, "_pq_codes_b"
    )
    desc = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in desc}
    assert info.get("Bucket Columns") == "[`vec_id`]", info
