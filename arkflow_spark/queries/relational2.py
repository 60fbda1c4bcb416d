"""Second relational batch: NATURAL join, column exclusion, array_agg,
pivot/unpivot, as-of join, struct unnest.

Parity targets: docs/docs/sql/2-select.md:146 (NATURAL), :241 (EXCLUDE),
5-aggregate_functions.md:34 (array_agg), 8-special_functions.md (unnest
struct). The as-of join exceeds the reference (SURVEY §2 notes DataFusion
exposes none) — it's the standard event-enrichment primitive, implemented
with the scalable last_value-ignore-nulls window, not a range self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load


@query(
    "join_natural",
    oracle="""
    SELECT regionkey, r_name, n_name
    FROM (SELECT r_regionkey AS regionkey, r_name FROM region)
    NATURAL JOIN (SELECT n_regionkey AS regionkey, n_name FROM nation)
    ORDER BY regionkey, n_name
    """,
)
def join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN (reference: docs/docs/sql/2-select.md:146)."""
    for t in ("region", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT regionkey, r_name, n_name
        FROM (SELECT r_regionkey AS regionkey, r_name FROM region)
        NATURAL JOIN (SELECT n_regionkey AS regionkey, n_name FROM nation)
        ORDER BY regionkey, n_name
        """
    )


@query(
    "select_exclude_columns",
    oracle="""
    SELECT * EXCLUDE (c_name, c_acctbal)
    FROM customer
    WHERE c_custkey <= 50
    ORDER BY c_custkey
    """,
)
def select_exclude_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE column selector (reference: docs/docs/sql/2-select.md:241)
    — DataFrame-side this is df.drop, the idiomatic equivalent."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .drop("c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "agg_array_agg",
    oracle="""
    SELECT n_regionkey AS regionkey,
           array_to_string(list(n_name ORDER BY n_name), '|') AS nations,
           CAST(len(list(n_name)) AS BIGINT) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY regionkey
    """,
)
def agg_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg with deterministic ordering
    (reference: docs/docs/sql/5-aggregate_functions.md:34).

    The aggregation is collect_list/array_agg; the array is serialized with
    a '|' join on both sides because list-typed columns are not stable
    through the driver's Arrow value hash (DuckDB list vs Spark array)."""
    return (
        load(spark, sf_dir, "nation")
        .groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias(
                "nations"
            ),
            F.count("n_name").alias("n_nations"),
        )
        .orderBy("regionkey")
    )


@query(
    "pivot_event_types",
    oracle="""
    SELECT user_id,
           COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END
               AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS click,
           COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END
               AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS purchase,
           COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END
               AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS view
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long -> wide per-type value sums. Explicit value list keeps the
    output schema static (required for streaming and for 100 TB planning —
    an unbounded pivot needs a first pass to enumerate keys)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"))
        .na.fill(0.0, ["click", "purchase", "view"])
        .orderBy("user_id")
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, m.metric, m.val
    FROM customer,
    LATERAL (VALUES ('acctbal', c_acctbal), ('custkey_x10', c_custkey * 10.0))
      AS m(metric, val)
    WHERE c_custkey <= 25
    ORDER BY c_custkey, metric
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long) via stack()."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 25)
        .select(
            "c_custkey",
            F.expr(
                "stack(2, 'acctbal', c_acctbal,"
                " 'custkey_x10', CAST(c_custkey * 10.0 AS DOUBLE))"
                " AS (metric, val)"
            ),
        )
        .orderBy("c_custkey", "metric")
    )


@query(
    "grouping_sets_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, '*') AS rf,
           COALESCE(l_linestatus, '*') AS ls,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, rf, ls
    """,
)
def grouping_sets_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^k grouping sets (reference exposes grouping sets via the
    grouping aggregate, docs/docs/sql/5-aggregate_functions.md:226)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            (
                F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")
            ).alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("*")).alias("ls"),
            "gid",
            "n",
        )
        .orderBy("gid", "rf", "ls")
    )


@query(
    "events_asof_join",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(last_value(CASE WHEN event_type = 'error' THEN ts END
                    IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             '%Y-%m-%d %H:%M:%S') AS last_error_ts
    FROM events
    WHERE user_id < 30
    ORDER BY user_id, event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each event enriched with the user's most recent prior
    'error' timestamp) via last_value-ignore-nulls over an ordered window.

    Scale notes: this is the O(n log n) as-of pattern — one shuffle+sort per
    key, no range self-join blow-up; the same plan handles billions of rows.
    (Beyond the reference's surface: DataFusion exposes no as-of join.)
    """
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marker = F.when(F.col("event_type") == "error", F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format(
            F.last(marker, ignorenulls=True).over(w), "yyyy-MM-dd HH:mm:ss"
        ).alias("last_error_ts"),
    ).orderBy("user_id", "event_id")


@query(
    "unnest_struct_inline",
    oracle="""
    SELECT n_nationkey,
           s.key AS skey, s.nm AS sname
    FROM (
      SELECT n_nationkey, {'key': n_regionkey, 'nm': n_name} AS s
      FROM nation
    )
    ORDER BY n_nationkey
    """,
)
def unnest_struct_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unnest(struct) -> columns (reference: docs/docs/sql/
    8-special_functions.md:12) — struct flattening via select("s.*")."""
    n = load(spark, sf_dir, "nation")
    return (
        n.select(
            "n_nationkey",
            F.struct(
                F.col("n_regionkey").alias("key"), F.col("n_name").alias("nm")
            ).alias("s"),
        )
        .select("n_nationkey", F.col("s.key").alias("skey"), F.col("s.nm").alias("sname"))
        .orderBy("n_nationkey")
    )


@query(
    "join_range_interval",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CAST(date_diff('second', e.ts, p.ts) AS BIGINT) AS error_lead_s
    FROM events p
    JOIN events e
      ON p.user_id = e.user_id
     AND e.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR
     AND e.event_id <> p.event_id
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    ORDER BY purchase_id, error_id
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: purchases matched to same-user errors within
    ±1 hour (equi key + range residual).

    Scale notes: the user_id equi-key keeps this a hash join — the range
    predicate is a residual filter, NOT a nested-loop driver. A pure range
    join (no equi key) would need time-bucketing both sides
    (date_bin(bucket, ts) as an equi key joining adjacent buckets); with a
    natural key present, plain hash partitioning scales. (Beyond the
    reference's surface — DataFusion exposes no range-join operator.)
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    return (
        p.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & F.col("e_ts").between(
                F.col("p_ts") - F.expr("INTERVAL 1 HOUR"),
                F.col("p_ts") + F.expr("INTERVAL 1 HOUR"),
            )
            & (F.col("error_id") != F.col("purchase_id")),
        )
        .select(
            "purchase_id",
            "error_id",
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            (F.unix_timestamp("p_ts") - F.unix_timestamp("e_ts")).alias(
                "error_lead_s"
            ),
        )
        .orderBy("purchase_id", "error_id")
    )


@query(
    "events_asof_join_tolerance",
    oracle="""
    WITH enriched AS (
      SELECT event_id, user_id, ts,
             last_value(CASE WHEN event_type = 'error' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_error_ts
      FROM events
      WHERE user_id < 30
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(CASE WHEN prior_error_ts >= ts - INTERVAL 10 MINUTE
                         THEN prior_error_ts END,
                    '%Y-%m-%d %H:%M:%S') AS recent_error_ts
    FROM enriched
    ORDER BY user_id, event_id
    """,
)
def events_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with tolerance (pandas merge_asof semantics): the prior
    error only matches when within 10 minutes, else NULL.

    Scale notes: identical O(n log n) window plan as events_asof_join —
    the tolerance is a post-window predicate, free at any scale."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marker = F.when(F.col("event_type") == "error", F.col("ts"))
    prior = F.last(marker, ignorenulls=True).over(w)
    within = F.when(
        prior >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"), prior
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format(within, "yyyy-MM-dd HH:mm:ss").alias("recent_error_ts"),
    ).orderBy("user_id", "event_id")


@query(
    "events_asof_join_two_table",
    oracle="""
    WITH quotes AS (
      SELECT user_id, ts, MAX(event_id) AS error_event_id
      FROM events WHERE event_type = 'error' AND user_id < 40
      GROUP BY user_id, ts
    ),
    trades AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type <> 'error' AND user_id < 40
    )
    SELECT t.event_id, t.user_id,
           strftime(t.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           q.error_event_id
    FROM trades t ASOF LEFT JOIN quotes q
      ON t.user_id = q.user_id AND t.ts >= q.ts
    ORDER BY t.user_id, t.event_id
    """,
)
def events_asof_join_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table as-of join (trades/quotes shape) through the reusable
    `functions.asof_join` — each non-error event enriched with the id of
    the latest error at-or-before its timestamp, oracled against DuckDB's
    NATIVE `ASOF LEFT JOIN` (and fuzz-verified on random tables in
    tests/test_fuzz_conformance.py). Right side pre-deduped to unique
    (key, ts) so the backward-inclusive match is engine-deterministic.

    Scale notes: asof_join is the union + ordered-window construction —
    one shuffle + one sort per key, no range-join row blow-up.
    """
    from arkflow_spark.functions import asof_join

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    quotes = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("error_event_id"))
    )
    trades = ev.filter(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(trades, quotes, on="ts", by="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "error_event_id",
    ).orderBy("user_id", "event_id")
