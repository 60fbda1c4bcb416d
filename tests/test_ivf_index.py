"""The materialized IVF assignment index (r6: VERDICT r5 item 6).

`ann_ivf_assign` now serves from a session-addressed table bucketed on
`assigned_label`; `ann_ivf_search` and the other six assignment
consumers share one build per session.
"""

from __future__ import annotations

from arkflow_spark.functions.indexes import index_table_name
from arkflow_spark.queries import QUERIES
from arkflow_spark.queries.vector_q import ivf_assignment
from tests.conftest import SF_SMOKE


def test_assignment_materializes_once(spark):
    ivf_assignment(spark, SF_SMOKE)
    nb = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    table = index_table_name(spark, SF_SMOKE, nb, "_ivf_assign_b")
    assert spark.catalog.tableExists(table)
    desc = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in desc}
    assert info.get("Bucket Columns") == "[`assigned_label`]", info


def test_search_reads_the_stored_index(spark):
    df = QUERIES["ann_ivf_search"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both probe sides scan the materialized table, not a re-derived
    # centroid pipeline (no posexplode/centroid aggregate in this plan)
    assert plan.count("_ivf_assign_b") >= 2, plan[:2000]
    assert "posexplode" not in plan.lower()
