"""Queries exercising the engine's streaming components in their
deterministic batch forms (same code paths the streaming mode uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.streaming.state import sliding_count_window_batch
from arkflow_spark.tables import load


@query(
    "events_sliding_count_window",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS r,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
      WHERE user_id < 10
    )
    SELECT user_id, g.w AS window_id, r - g.w * 5 AS pos_in_window, event_id,
           value
    FROM ranked CROSS JOIN generate_series(0, 100000) g(w)
    WHERE r >= g.w * 5 AND r < g.w * 5 + 20 AND g.w * 5 + 20 <= n
    ORDER BY user_id, window_id, pos_in_window
    """,
)
def events_sliding_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based sliding window (size=20, slide=5) per user — exact
    semantics of the reference's sliding buffer
    (buffer/sliding_window.rs:114-163), batch form; the streaming form
    (applyInPandasWithState) shares the window-assignment math and is
    covered by tests/test_streaming.py."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    out = sliding_count_window_batch(
        ev,
        window_size=20,
        slide_size=5,
        order_by=["ts", "event_id"],
        key_cols=["user_id"],
    )
    return out.select(
        "user_id", "window_id", "pos_in_window", "event_id", "value"
    ).orderBy("user_id", "window_id", "pos_in_window")
