"""Round-3 fourth-session batch 18: LTTB downsampling.

- `events_lttb_downsample` — Largest-Triangle-Three-Buckets
  (Steinarsson 2013): the perceptual line-chart downsampler that picks
  ONE point per bucket maximizing the triangle area with the
  previously SELECTED point and the next bucket's centroid. Unlike M4
  (`events_m4_downsample`, four extrema per bucket, set-based) the
  selection is a data-dependent recurrence — each bucket's choice
  depends on the previous choice — so the series folds per key in
  `applyInPandas` and the oracle replays it as a DuckDB recursive CTE
  whose recursive term does the per-bucket argmax via QUALIFY.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load

_LTTB_MID_BUCKETS = 10  # first + last always kept -> 12 output points max


def _lttb_oracle() -> str:
    m = _LTTB_MID_BUCKETS
    return f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('hour', ts)) - 1
               AS rn,
             CAST(COUNT(*) AS DOUBLE) AS y,
             COUNT(*) OVER (PARTITION BY event_type) AS nn
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    mid AS (
      SELECT event_type, rn, y, nn,
             ((rn - 1) * {m}) // (nn - 2) + 1 AS b
      FROM hourly WHERE rn >= 1 AND rn <= nn - 2 AND nn > 2
    ),
    dense AS (
      SELECT event_type, rn, y, nn,
             dense_rank() OVER (PARTITION BY event_type ORDER BY b)
               AS db
      FROM mid
    ),
    kmax AS (
      SELECT event_type, MAX(db) AS k FROM dense GROUP BY event_type
    ),
    cent AS (
      SELECT event_type, db, AVG(CAST(rn AS DOUBLE)) AS cx, AVG(y) AS cy
      FROM dense GROUP BY event_type, db
    ),
    lastpt AS (
      SELECT event_type, CAST(rn AS DOUBLE) AS cx, y AS cy
      FROM hourly WHERE rn = nn - 1
    ),
    centn AS (
      -- centroid the bucket-db argmax looks AHEAD to: bucket db+1,
      -- or the (always-kept) final point after the last bucket
      SELECT d.event_type, d.db, c.cx, c.cy
      FROM (SELECT DISTINCT event_type, db FROM dense) d
      JOIN cent c ON c.event_type = d.event_type AND c.db = d.db + 1
      UNION ALL
      SELECT d.event_type, d.db, l.cx, l.cy
      FROM (SELECT event_type, MAX(db) AS db FROM dense
            GROUP BY event_type) d
      JOIN lastpt l ON l.event_type = d.event_type
    ),
    rec AS (
      SELECT event_type, 0 AS db, CAST(0 AS DOUBLE) AS sel_x, y AS sel_y, 0 AS rn
      FROM hourly WHERE rn = 0
      UNION ALL
      SELECT p.event_type, p.db, CAST(p.rn AS DOUBLE), p.y, p.rn
      FROM rec r
      JOIN dense p ON p.event_type = r.event_type AND p.db = r.db + 1
      JOIN centn c ON c.event_type = p.event_type AND c.db = p.db
      QUALIFY row_number() OVER (
        PARTITION BY p.event_type, p.db
        ORDER BY abs((r.sel_x - c.cx) * (p.y - r.sel_y)
                     - (r.sel_x - p.rn) * (c.cy - r.sel_y)) DESC,
                 p.rn) = 1
    ),
    selected AS (
      SELECT event_type, rn, sel_y AS y FROM rec
      UNION ALL
      SELECT event_type, rn, y FROM hourly WHERE rn = nn - 1 AND nn > 1
    )
    SELECT event_type, rn, y,
           row_number() OVER (PARTITION BY event_type ORDER BY rn)
             AS sel_order
    FROM selected
    ORDER BY event_type, rn
    """


@query("events_lttb_downsample", oracle=_lttb_oracle())
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) over
    each type's hourly series into {m}+2 points: first and last always
    kept; each middle bucket contributes the point with the largest
    triangle area against the PREVIOUS SELECTION and the NEXT bucket's
    centroid (ties -> earliest point). The look-back on the previous
    selection makes this a true recurrence — no window frame expresses
    it — so the series folds per event_type in `applyInPandas` and the
    DuckDB oracle replays the identical arithmetic as a recursive CTE
    with a QUALIFY argmax per step. Areas are cross-products of hour
    indices, integer counts, and bucket centroids, written
    operation-for-operation identically in both engines.

    Scale: the fold consumes the hourly AGGREGATE (distributed
    reduction first; `events_holt_trend` discipline) — per-key state
    is the bucket size, and the output is 12 points per series no
    matter how long the series is. M4 is the set-based alternative
    when per-bucket extrema suffice.
    """.format(m=_LTTB_MID_BUCKETS)
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("h")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").cast("double").alias("y"))
        .select(
            "event_type",
            (F.row_number().over(w) - 1).alias("rn"),
            "y",
        )
    )

    m = _LTTB_MID_BUCKETS

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn", kind="stable").reset_index(drop=True)
        n = len(pdf)
        et = pdf["event_type"].iloc[0]
        if n <= 2:
            keep = pdf
        else:
            rns = pdf["rn"].to_numpy()
            ys = pdf["y"].to_numpy()
            # dense bucket ids over the middle points
            raw_b = [((int(r) - 1) * m) // (n - 2) + 1 for r in rns[1:-1]]
            uniq = sorted(set(raw_b))
            dense_of = {b: i + 1 for i, b in enumerate(uniq)}
            buckets: dict[int, list[int]] = {}
            for idx, b in enumerate(raw_b, start=1):
                buckets.setdefault(dense_of[b], []).append(idx)
            k = len(uniq)
            sel = [0]
            prev_x, prev_y = 0.0, float(ys[0])
            for db in range(1, k + 1):
                idxs = buckets[db]
                if db < k:
                    nxt = buckets[db + 1]
                    cx = sum(float(rns[i]) for i in nxt) / len(nxt)
                    cy = sum(float(ys[i]) for i in nxt) / len(nxt)
                else:
                    cx, cy = float(rns[n - 1]), float(ys[n - 1])
                best, best_area = None, -1.0
                for i in idxs:
                    area = abs(
                        (prev_x - cx) * (float(ys[i]) - prev_y)
                        - (prev_x - float(rns[i])) * (cy - prev_y)
                    )
                    if area > best_area:
                        best, best_area = i, area
                sel.append(best)
                prev_x, prev_y = float(rns[best]), float(ys[best])
            sel.append(n - 1)
            keep = pdf.iloc[sel]
        out = keep[["event_type", "rn", "y"]].copy()
        out["sel_order"] = range(1, len(out) + 1)
        return out

    return (
        hourly.groupBy("event_type")
        .applyInPandas(
            fold,
            "event_type STRING, rn BIGINT, y DOUBLE, sel_order BIGINT",
        )
        .orderBy("event_type", "rn")
    )
