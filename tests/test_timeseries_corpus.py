"""Edge-case behavior of the gap-fill and corpus operators — the cases the
sf0.01 oracle data may never hit (leading gaps, all-duplicate documents,
exact interpolation fractions)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from arkflow_spark.queries.timeseries_q import (
    events_gapfill_interpolate,
    events_gapfill_locf,
)


def _fake_events(spark, tmp_path, rows):
    """Write a minimal events.parquet a gapfill query can load."""
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_locf_leading_gap_stays_null_and_fills_forward(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # user 0: obs at hours 0 and 3 -> hours 1-2 fill with hour-0 value
        (1, t, 0, "a", 10.0, "{}"),
        (2, t + dt.timedelta(hours=3), 0, "a", 40.0, "{}"),
    ]
    sf = _fake_events(spark, tmp_path, rows)
    out = {
        r["hour"]: (r["value_locf"], r["was_gap"])
        for r in events_gapfill_locf(spark, sf).collect()
    }
    assert out["2024-01-01 00:00:00"] == (10.0, False)
    assert out["2024-01-01 01:00:00"] == (10.0, True)
    assert out["2024-01-01 02:00:00"] == (10.0, True)
    assert out["2024-01-01 03:00:00"] == (40.0, False)


def test_interpolate_exact_thirds_and_edges(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, t, 0, "a", 10.0, "{}"),
        (2, t + dt.timedelta(hours=3), 0, "a", 40.0, "{}"),
    ]
    sf = _fake_events(spark, tmp_path, rows)
    out = {
        r["hour"]: r["value_interp"]
        for r in events_gapfill_interpolate(spark, sf).collect()
    }
    # linear between 10 and 40 over 3 hours: 20 and 30 at the gap hours
    assert out["2024-01-01 01:00:00"] == 20.0
    assert out["2024-01-01 02:00:00"] == 30.0


def test_interpolate_ties_pick_latest_event_per_bucket(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        # two events in the same hour: the later ts (then higher event_id)
        # must win the resample
        (1, t + dt.timedelta(minutes=5), 0, "a", 1.0, "{}"),
        (2, t + dt.timedelta(minutes=50), 0, "a", 2.0, "{}"),
        (3, t + dt.timedelta(minutes=50), 0, "a", 3.0, "{}"),
    ]
    sf = _fake_events(spark, tmp_path, rows)
    out = events_gapfill_locf(spark, sf).collect()
    assert len(out) == 1 and out[0]["value_locf"] == 3.0


def test_line_dedup_all_duplicate_doc_hashes_empty_string(spark, tmp_path):
    """A document consisting entirely of corpus-duplicate chunks must
    produce md5('') — matching the oracle's coalesce('') — not NULL."""
    from arkflow_spark.queries.corpus_q import text_line_dedup

    chunk = " ".join(["dup"] * 10)  # one exact 10-word chunk
    rows = [
        (0, chunk, "en", "src0", len(chunk)),
        (1, chunk, "en", "src0", len(chunk)),
        (2, chunk, "en", "src0", len(chunk)),
        (3, "unique words only here now one two three four five six",
         "en", "src0", 50),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r for r in text_line_dedup(spark, str(tmp_path)).collect()
    }
    empty_md5 = hashlib.md5(b"").hexdigest()
    for d in (0, 1, 2):
        assert out[d]["n_removed"] == 1
        assert out[d]["clean_md5"] == empty_md5
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_md5"] != empty_md5
