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
