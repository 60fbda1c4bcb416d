"""Audit every oracle's DuckDB output types for driver-hash instability.

The local parity check fetches Python objects (DuckDB HUGEINT -> Python
int), which hides type drift that the driver's Arrow-based hash can see:
HUGEINT converts to Arrow decimal128, so a value hashes as "123.000000..."
or 123.0 while Spark emits bigint 123. CORRECTNESS_r01 q12 failed exactly
this way. This script binds every oracle lazily in DuckDB (planning only,
no execution) and flags any output column whose DuckDB logical type is not
in the Arrow-stable allowlist. It does not compare against Spark — the
full Spark-vs-oracle value comparison lives in scripts/check_parity.py.

Usage: python scripts/oracle_type_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from arkflow_spark.plans.oracle import duckdb_connect
from arkflow_spark.queries import ORACLE

# DuckDB logical types that round-trip through Arrow to the same value
# text/number a Spark result would produce.
STABLE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb_connect(sf_dir)
    bad = 0
    for name in sorted(ORACLE):
        sql = ORACLE[name]
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, [str(t) for t in rel.types]
        except Exception as e:  # pragma: no cover - audit tool
            bad += 1
            print(f"[ERR ] {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        flagged = [
            (c, t)
            for c, t in zip(cols, types)
            if t.split("(")[0] not in STABLE
        ]
        if flagged:
            bad += 1
            print(f"[FLAG] {name}: {flagged}")
    con.close()
    print(f"\n{bad} flagged / {len(ORACLE)} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
