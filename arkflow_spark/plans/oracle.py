"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL over the same
parquet tables, then compares row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name, values
normalized to strings). Used by tests/test_oracle_parity.py so every
operator is validated locally before the driver's per-round check.
"""

from __future__ import annotations

import decimal
import math
import os
from dataclasses import dataclass

import duckdb

from arkflow_spark.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # DuckDB binds read_parquet when the view is created, so a missing
        # table (fuzz fixtures materialize only the tables a query reads)
        # must be skipped rather than registered.
        if not os.path.exists(path):
            continue
        # Spark writers produce a DIRECTORY named *.parquet; DuckDB wants a
        # glob over its part files, while the driver's testdata ships plain
        # files.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def _norm(v, strict: bool = False) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if strict and isinstance(v, decimal.Decimal):
        # Driver-strict: the driver hashes Arrow-typed values, where a
        # DuckDB HUGEINT / DECIMAL column arrives as decimal128 and hashes
        # differently from Spark's bigint even when every value is equal
        # (q12 round-1, six rows round-3). Tag decimals so int-vs-decimal
        # desyncs locally exactly like it does in the driver, while
        # decimal-vs-decimal of equal value still matches.
        return f"\x00DEC{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x, strict) for x in v) + "]"
    return str(v)


def canonicalize(
    cols: list[str], rows: list[tuple], strict: bool = False
) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i], strict) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    cols_match: bool
    values_match: bool
    detail: str = ""

    def __str__(self) -> str:  # pragma: no cover
        flag = "OK " if self.ok else "FAIL"
        return (
            f"[{flag}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
            f" cols={self.cols_match} values={self.values_match} {self.detail}"
        )


def compare(
    name, spark, sf_dir, query_fn, oracle_sql, strict: bool = False
) -> CompareResult:
    """Spark-vs-DuckDB compare. ``strict=True`` mirrors the DRIVER's
    comparison: the oracle result is fetched through Arrow (so HUGEINT /
    widened-DECIMAL output types surface as ``decimal.Decimal`` instead
    of being silently collapsed to Python int by ``fetchall``) and
    decimals hash type-sensitively. Local-green in strict mode implies
    driver-green; the default mode is kept for readable value diffs.
    """
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(oracle_sql)
        o_cols = [d[0] for d in res.description]
        if strict:
            tbl = res.arrow()
            cols_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            o_rows = list(zip(*cols_data)) if cols_data else []
        else:
            o_rows = res.fetchall()
    finally:
        con.close()

    cols_match = sorted(s_cols) == sorted(o_cols)
    s_canon = canonicalize(s_cols, s_rows, strict)
    o_canon = canonicalize(o_cols, o_rows, strict)
    values_match = s_canon == o_canon
    detail = ""
    if not cols_match:
        detail = f"spark_cols={sorted(s_cols)} oracle_cols={sorted(o_cols)}"
    elif not values_match:
        diffs = [
            f"  spark={a}\n  oracle={b}"
            for a, b in zip(s_canon, o_canon)
            if a != b
        ][:3]
        extra = abs(len(s_canon) - len(o_canon))
        detail = f"first diffs:\n" + "\n".join(diffs) + f"\n  (+{extra} len diff)"
    return CompareResult(
        name=name,
        ok=cols_match and values_match and len(s_rows) == len(o_rows),
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        cols_match=cols_match,
        values_match=values_match,
        detail=detail,
    )
