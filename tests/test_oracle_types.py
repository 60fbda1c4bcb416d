"""Pytest gate: every oracle must plan to Arrow-stable DuckDB types.

Round-1 (q12) and round-3 (six driver rows) both failed on the same
class: a bare integer ``SUM(...)`` in oracle SQL returns DuckDB HUGEINT,
which the driver's Arrow-based value hash renders as decimal128 while
Spark emits bigint — equal values, desynced hashes. The local
``check_parity.py`` compare fetches Python objects and cannot see it.
``scripts/oracle_type_audit.py`` fingerprints the class exactly (it
flagged precisely the 6 failing + 4 latent oracles in round 3) but was
a standalone script nobody ran; this test makes it a hard gate so no
future batch can ship a HUGEINT/DECIMAL-surfacing oracle.
"""

from __future__ import annotations

from arkflow_spark.plans.oracle import duckdb_connect
from arkflow_spark.queries import ORACLE
from scripts.oracle_type_audit import STABLE

SF_DIR = "/root/testdata/sf0.001"


def test_all_oracles_plan_to_arrow_stable_types():
    con = duckdb_connect(SF_DIR)
    flagged: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    try:
        for name in sorted(ORACLE):
            try:
                rel = con.sql(ORACLE[name])
                bad = [
                    (c, str(t))
                    for c, t in zip(rel.columns, rel.types)
                    if str(t).split("(")[0] not in STABLE
                ]
            except Exception as e:  # pragma: no cover - gate diagnostics
                errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
                continue
            if bad:
                flagged[name] = bad
    finally:
        con.close()
    assert not errors, f"oracles failed to plan: {errors}"
    assert not flagged, (
        "oracles surface driver-hash-unstable DuckDB types "
        f"(wrap in CAST(... AS BIGINT/DOUBLE)): {flagged}"
    )
