"""Event-time windowing over the events table — batch-verifiable analogs of
the reference's streaming buffers.

Parity targets: the reference's windows are processing-time only
(buffer/tumbling_window.rs, buffer/sliding_window.rs, buffer/session_window.rs
— SURVEY.md §2.4); Spark's event-time window()/session_window() strictly
exceed them. These queries exercise the exact window-assignment semantics on
event time so the oracle can replicate them arithmetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arkflow_spark.queries.base import (
    DUCK_TS_FMT,
    SPARK_TS_FMT,
    o_dsum,
    query,
)
from arkflow_spark.tables import load


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT strftime(make_timestamp(
             (epoch_us(ts) // 3600000000) * 3600000000),
             '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           {o_dsum('value', 'total_value')},
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation via window()
    (reference: buffer/tumbling_window.rs:180 — processing-time tumbling;
    here on event time, the Spark-native superset).

    Scale notes: window() + groupBy is a single shuffle on (window,
    event_type); with watermarking the same plan runs incrementally under
    Structured Streaming (see arkflow_spark.streaming).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
            "n_users",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_window",
    oracle=f"""
    WITH assigned AS (
      SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS b, *
      FROM events
    ), expanded AS (
      SELECT b AS window_start, * FROM assigned
      UNION ALL
      SELECT b - INTERVAL 30 MINUTE AS window_start, * FROM assigned
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n, {o_dsum('value', 'total_value')}
    FROM expanded
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding by 30 minutes
    (reference: buffer/sliding_window.rs:283 — count-based slide; this is
    the time-based superset; exact count-based parity lives in
    arkflow_spark.streaming.sliding_count_window).

    Each event lands in exactly size/slide = 2 windows; the oracle
    reproduces the assignment by bucketing to the slide and unioning the
    two containing windows.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
            "total_value",
        )
        .orderBy("window_start")
    )


@query(
    "events_session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN pts IS NULL
                       OR ts - pts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
                  AS new_session
      FROM o
    ), sess AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap via session_window()
    (reference: buffer/session_window.rs:194 — whole-stream gap sessions;
    Spark's per-key sessions are the documented superset, SURVEY.md §2.4).

    The oracle derives identical sessions with gaps-and-islands SQL:
    session_window(start, end) == (min ts, max ts + gap).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "events_dedup_replay",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id AS first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def events_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup by (user_id, event_type) — the batch analog of
    streaming dropDuplicates for at-least-once replay
    (reference: at-least-once delivery doc docs/docs/concepts/4-delivery-semantics.md)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "events_rate_per_user",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           ROUND(COUNT(*) FILTER (WHERE event_type = 'purchase')
                 * 1.0 / COUNT(*), 4) AS purchase_rate,
           {o_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END",
                   'purchase_value')},
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS active_span_s
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_rate_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral profile: conditional aggregation + time spans —
    the enrichment shape the reference builds with lookup joins + SQL
    (reference: processor/sql.rs + temporary/redis.rs composition)."""
    ev = load(spark, sf_dir, "events")
    is_purch = F.col("event_type") == "purchase"
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(is_purch, 1)).alias("n_purchases"),
            F.round(F.count(F.when(is_purch, 1)) * 1.0 / F.count("*"), 4).alias(
                "purchase_rate"
            ),
            F.sum(
                F.when(is_purch, F.col("value")).otherwise(0.0).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("purchase_value"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("active_span_s"),
        )
        .orderBy("user_id")
    )


@query(
    "events_skew_salted_agg",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n,
           {o_dsum('value', 'total_value')},
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (functions/skew.salted_agg) surfaced
    through the correctness gate: event_type has only 5 values — at 100 TB
    each key's partition would exceed executor memory, so phase 1
    aggregates on (key, salt) [both phases map-side combinable] and phase 2
    recombines per key. The oracle is the PLAIN single-phase GROUP BY —
    hash equality proves salting changes the plan, not the answer.
    """
    from arkflow_spark.functions.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": F.count("*"),
            "total_value": F.sum(dec),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        n_salts=16,
        deterministic_by="event_id",
    )
    return (
        out.select(
            "event_type",
            "n",
            F.col("total_value").cast("double").alias("total_value"),
            "min_value",
            "max_value",
        )
        .orderBy("event_type")
    )


@query(
    "events_windowed_topk",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket,
             event_type, count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(make_timestamp(bucket * 1000000),
                    '{DUCK_TS_FMT}') AS bucket,
           event_type, n, sum_value, rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY bucket
                 ORDER BY n DESC, event_type) AS rnk
      FROM b
    )
    WHERE rnk <= 3
    ORDER BY bucket, rnk
    """,
)
def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per 6-hour tumbling window — the standing
    "trending items per window" query of stream dashboards (Flink's
    windowed Top-N pattern), here as the batch/backfill twin of a
    `tumbling window -> rank` streaming pipeline.

    The aggregation is map-side combinable on (bucket, type); the rank
    window then runs over at most |event_types| rows per bucket — the
    heavy lifting is all in the pre-aggregation, so the plan's cost is
    one shuffle of partial counts regardless of raw volume."""
    e = load(spark, sf_dir, "events")
    b = e.groupBy(
        (F.floor(F.unix_timestamp("ts") / 21600) * 21600).alias("bucket"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        b.withColumn("rnk", F.row_number().over(w))
        .where("rnk <= 3")
        .select(
            F.date_format(F.timestamp_seconds("bucket"), SPARK_TS_FMT).alias(
                "bucket"
            ),
            "event_type",
            "n",
            "sum_value",
            "rnk",
        )
        .orderBy("bucket", "rnk")
    )
