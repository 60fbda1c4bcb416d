"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`arkflow_spark.queries` — the driver runs ``entry`` as a
smoke check, then each ``queries()[name]`` against ``oracle_sql()[name]``
via DuckDB at sf=0.01 (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from arkflow_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from arkflow_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from arkflow_spark.queries import ORACLE

    return dict(ORACLE)
