"""Function helpers: DataFusion-surface functions Spark lacks by name.

``compat.translate_sql`` handles pure renames; helpers here cover the
functions whose argument shapes differ (so a token rename can't express
them). Each is exact integer/decimal arithmetic — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from arkflow_spark.config import parse_duration_ms

_EPOCH = "1970-01-01 00:00:00"


def asof_join(
    left,
    right,
    on: str = "ts",
    by: str | list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance_expr: str | None = None,
):
    """As-of (backward, inclusive) join: enrich each ``left`` row with the
    latest ``right`` row whose ``on`` <= left's ``on``, per ``by`` key —
    trades/quotes semantics, matching DuckDB's ``ASOF LEFT JOIN`` (and
    pandas ``merge_asof``). Beyond the reference's surface (DataFusion has
    no as-of join); fuzz-verified against DuckDB in
    tests/test_fuzz_conformance.py.

    Implementation is the scalable union+ordered-window pattern, NOT a
    range self-join: tag right rows 0 and left rows 1, sort each ``by``
    partition once on (on, tag), and carry the last non-null right payload
    forward. One shuffle + one sort per key — O(n log n), no range-join
    row blow-up; the same plan shape handles billions of rows.

    ``value_cols``: right columns to bring (default: all but on/by).
    ``tolerance_expr``: optional SQL interval/length, e.g. ``"600"`` for
    numeric ``on`` or ``"INTERVAL 10 MINUTES"`` for timestamps — matches
    older than ``on - tolerance`` are nulled (pandas merge_asof
    ``tolerance``).
    """
    from pyspark.sql import Window

    by_list = [by] if isinstance(by, str) else list(by or [])
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c != on and c not in by_list
        ]
    # name collisions with left columns get the merge_asof-style suffix so
    # the output never contains ambiguous duplicate column names
    out_names = {
        c: (f"{c}_right" if c in left.columns else c) for c in value_cols
    }
    payload = F.struct(
        F.col(on).alias("__asof_ts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *by_list,
        F.col(on),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l_cols = left.columns
    lhs = left.select(
        *l_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = lhs.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by_list)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)
    out = unioned.withColumn("__match", matched).filter(F.col("__side") == 1)
    if tolerance_expr is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col("__match.__asof_ts")
                >= F.col(on) - F.expr(tolerance_expr),
                F.col("__match"),
            ),
        )
    return out.select(
        *l_cols,
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in value_cols],
    )


def date_bin(stride: str, source: Column | str, origin: str = _EPOCH) -> Column:
    """DataFusion/PostgreSQL ``date_bin(stride, source, origin)``
    (docs/docs/sql/7-scalar_functions.md:1979): floor ``source`` to the
    start of its ``stride``-wide bucket counted from ``origin``.

    Spark 4 has no date_bin builtin; this is the exact integer-microsecond
    construction — fully pushdown-compatible arithmetic, no UDF:
    floor((us(source) - us(origin)) / stride_us) * stride_us + us(origin).
    Negative-side bins floor correctly (Spark's integral ``div`` truncates,
    so floor is adjusted for pre-origin timestamps).
    """
    src = F.col(source) if isinstance(source, str) else source
    # unix_micros requires TIMESTAMP (LTZ); accept NTZ/date inputs too. Under
    # a UTC session timezone the cast is value-preserving. Try-expression
    # semantics are deliberately NOT used: a non-castable input (e.g. a
    # malformed VARCHAR) raises under ANSI mode rather than silently binning
    # to NULL; with ANSI off, string inputs are coerced with
    # null-on-parse-failure semantics (documented contract).
    src = src.cast("timestamp")
    stride_us = parse_duration_ms(stride) * 1000
    if stride_us <= 0:
        raise ValueError(f"stride must be positive, got {stride!r}")
    origin_us = F.unix_micros(F.lit(origin).cast("timestamp"))
    delta = F.unix_micros(src) - origin_us
    # pmod keeps everything in exact long arithmetic AND floors correctly
    # for pre-origin timestamps: delta - pmod(delta, L) == floor(delta/L)*L
    return F.timestamp_micros(delta - F.pmod(delta, F.lit(stride_us)) + origin_us)
