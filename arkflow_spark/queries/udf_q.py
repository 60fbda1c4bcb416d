"""UDF surface: Arrow-vectorized pandas UDFs (scalar + grouped aggregate).

Parity targets: the reference's UDF registries (udf/scalar_udf.rs,
udf/aggregate_udf.rs, docs/docs/sql/9-udf.md) and the python processor
(processor/python.rs). Spark's pandas UDFs are the vectorized equivalent;
deterministic formulas let the DuckDB oracle verify the full UDF execution
path, not just that it ran. Window UDFs have no Python surface in Spark —
documented gap (SURVEY §2.7), approximated via grouped-map when needed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load


def _quality_scalar_udf():
    # defined lazily: pandas_udf decoration needs an active SparkSession
    @pandas_udf("double")
    def quality_scalar_udf(event_id: pd.Series, value: pd.Series) -> pd.Series:
        """Vectorized scalar UDF with an exact closed form (oracle-checkable)."""
        return (value * 2.0 + event_id % 7).astype("float64")

    return quality_scalar_udf


def _geomean_agg_udf():
    @pandas_udf("double")
    def geomean_agg_udf(v: pd.Series) -> float:
        """Grouped-aggregate pandas UDF: geometric mean = exp(mean(ln(v)))."""
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    return geomean_agg_udf


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, ROUND(value * 2.0 + CAST(event_id % 7 AS DOUBLE), 4)
             AS score
    FROM events
    WHERE user_id < 20
    ORDER BY event_id
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (the reference's scalar UDF slot,
    udf/scalar_udf.rs:33-63). Stays vectorized end-to-end: one Arrow
    transfer per batch, no per-row Python."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    udf = _quality_scalar_udf()
    return ev.select(
        "event_id",
        F.round(udf(F.col("event_id"), F.col("value")), 4).alias("score"),
    ).orderBy("event_id")


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT event_type,
           ROUND(exp(avg(ln(value))), 4) AS geo_mean
    FROM events
    WHERE value > 0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the reference's aggregate UDF slot,
    udf/aggregate_udf.rs:14-40): per-group Arrow batch -> scalar."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    udf = _geomean_agg_udf()
    # note: Spark forbids mixing grouped-agg pandas UDFs with JVM aggregates
    # in one agg() — keep the aggregation pandas-only
    return (
        ev.groupBy("event_type")
        .agg(F.round(udf(F.col("value")), 4).alias("geo_mean"))
        .orderBy("event_type")
    )


@query(
    "udtf_word_explode",
    oracle="""
    SELECT r_regionkey, w.word AS word, length(w.word) AS word_len
    FROM region, LATERAL unnest(string_split(lower(r_name), ' ')) AS w(word)
    ORDER BY r_regionkey, word
    """,
)
def udtf_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 3.5+): one input row -> N output
    rows — the Python counterpart of the reference's table-function slot
    (DataFusion UDTFs are Rust-only; this exceeds the YAML surface)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, word_len int")
    class WordSplit:
        def eval(self, name: str):
            for w in name.lower().split(" "):
                yield (w, len(w))

    spark.udtf.register("word_split", WordSplit)
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r_regionkey, s.word, s.word_len
        FROM region, LATERAL word_split(r_name) s
        ORDER BY r_regionkey, word
        """
    )


@query(
    "udf_sql_registered",
    oracle="""
    SELECT p_partkey, upper(substr(p_name, 1, 3)) || '-' ||
           CAST(p_size AS VARCHAR) AS part_code
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.udf.register — the SQL-visible registration slot
    (docs/docs/sql/9-udf.md): UDFs callable from SQL text like built-ins."""

    def part_code(name: str, size: int) -> str:
        return f"{name[:3].upper()}-{size}"

    spark.udf.register("part_code", part_code, "string")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, part_code(p_name, p_size) AS part_code
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
        """
    )


def _gcd_lcm_udfs():
    @pandas_udf("long")
    def gcd_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.gcd(a.astype("int64"), b.astype("int64")))

    @pandas_udf("long")
    def lcm_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.lcm(a.astype("int64"), b.astype("int64")))

    return gcd_udf, lcm_udf


@query(
    "udf_gcd_lcm",
    oracle="""
    SELECT l_partkey, l_suppkey,
           gcd(l_partkey, l_suppkey) AS g,
           lcm(l_partkey, l_suppkey) AS l
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_partkey, l_suppkey
    """,
)
def udf_gcd_lcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gcd/lcm (docs/docs/sql/7-scalar_functions.md math surface) — no
    Spark builtin, closed with Arrow-vectorized numpy pandas UDFs and
    oracled against DuckDB's native gcd/lcm.

    Scale notes: numpy's np.gcd is a vectorized ufunc over the Arrow batch
    — the one sanctioned shape for Python in the hot path (no per-row
    Python, no shuffle; a narrow projection)."""
    gcd_udf, lcm_udf = _gcd_lcm_udfs()
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.select(
            "l_partkey",
            "l_suppkey",
            gcd_udf("l_partkey", "l_suppkey").alias("g"),
            lcm_udf("l_partkey", "l_suppkey").alias("l"),
        )
        .orderBy("l_partkey", "l_suppkey")
    )


@query(
    "udf_pandas_window",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
    FROM events
    ORDER BY user_id, event_id
    """,
)
def udf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python *window* UDF — the one UDF flavor the reference registers
    (udf/window_udf.rs:14-40) that has no direct Spark registry: expressed
    as applyInPandas over the partition key, computing a rolling aggregate
    with pandas inside the group, oracled against DuckDB's windowed AVG
    (ROWS 4 PRECEDING). 4dp rounding absorbs pandas' sliding-sum vs fresh
    5-term-sum FP difference.

    Scale notes: one shuffle on the window partition key (user_id), then
    Arrow-batched per-group pandas — group sizes are per-user event counts
    (bounded); this is the sanctioned shape for custom window logic Spark
    lacks, and exactly how a python window UDF would run on a cluster."""
    e = load(spark, sf_dir, "events")

    def rolling(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["rolling_avg"] = (
            pdf["value"].rolling(5, min_periods=1).mean().round(4)
        )
        return pdf[["user_id", "event_id", "rolling_avg"]]

    return (
        e.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(rolling, "user_id BIGINT, event_id BIGINT, rolling_avg DOUBLE")
        .orderBy("user_id", "event_id")
    )
