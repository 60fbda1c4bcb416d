"""Test-data catalog: load the driver's parquet tables and register views.

Tables (TPC-H-ish star schema + events/documents/embeddings) live at
``/root/testdata/sf*/{name}.parquet`` per TESTDATA.md. ``region`` and
``nation`` are fixed-size dimensions at every scale factor — always
broadcast-able; the rest scale with sf, so their join strategy is left to
Catalyst/AQE (which will still broadcast them when small enough).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions with scale-factor-independent cardinality (5 / 25 rows): safe to
# broadcast unconditionally even at 100 TB.
ALWAYS_BROADCAST = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Inferred parquet schemas, memoized per (sf_dir, table). Plan-time
# METADATA only — the exact struct a production catalog/metastore would
# serve instead of a footer read — never data or results: every action
# still scans the parquet files. Reading a footer costs ~0.1s per
# spark.read.parquet call (measured, r8 optimization round); a bench
# pass calls load() ~2x per query x 3 runs x 391 queries, so inference
# alone was tens of seconds of pure planning overhead per sweep. The
# test datasets are immutable fixtures, so keying by path is safe; a
# changed dataset means a new sf_dir.
_SCHEMA_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver passes its own SparkSession, which won't carry our session
    # defaults — set the nanos knob dynamically so TIMESTAMP(NANOS) parquet
    # (events.ts) is readable under any session. One py4j round-trip pair
    # per session (flag below), not per load call.
    if not getattr(spark, "_arkflow_session_confs", False):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ->LTZ ts cast below (and every epoch-aligned consumer:
        # F.window, session_window, unix_micros in date_bin) is
        # value-preserving only under a UTC session timezone; pin it here
        # so any driver-provided session matches DuckDB's naive-timestamp
        # arithmetic.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            spark._arkflow_session_confs = True
        except AttributeError:
            pass
    path = os.path.join(sf_dir, f"{name}.parquet")
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    # TIMESTAMP(NANOS) parquet columns arrive as int64 nanos (see
    # spark.sql.legacy.parquet.nanosAsLong in session.py); convert to
    # microsecond timestamps with integer arithmetic — double division would
    # lose precision above 2^53 ns. DuckDB truncates ns->us the same way.
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and f.dataType.simpleString() == "timestamp_ntz":
            # Parquet micros with isAdjustedToUTC=false arrive as
            # TIMESTAMP_NTZ; normalize to TIMESTAMP so time functions that
            # require LTZ (unix_micros, to_utc_timestamp, ...) work. The
            # session timezone is pinned to UTC, so wall values are
            # unchanged and DuckDB (naive timestamps) agrees.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view; return them by name."""
    out: dict[str, DataFrame] = {}
    for t in TABLES:
        df = load(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
