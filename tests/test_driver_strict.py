"""Driver-strict parity mode: Arrow-fetched oracles, type-sensitive hash.

Proves (a) strict mode reproduces the driver's round-3 failure on a
deliberately-bare ``SUM(...)`` oracle (HUGEINT vs Spark bigint — values
equal, hash red), and (b) the ten fixed round-3/latent offenders are
green UNDER STRICT MODE, so local-green now implies driver-green.
"""

from __future__ import annotations

import pytest

from arkflow_spark.plans.oracle import compare
from arkflow_spark.queries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"

# The six driver-red + four latent HUGEINT oracles fixed this round,
# plus the DECIMAL(38,2) normalization.
FIXED = [
    "events_apdex_score",
    "events_incident_mtbf",
    "documents_manifest_checksums",
    "events_dau_mau_stickiness",
    "events_error_budget_burn",
    "dedup_threshold_curve",
    "documents_ngram_novelty",
    "documents_partition_advisor",
    "events_attribution",
    "events_concurrency_sweep",
    "agg_filter_clause",
]


def test_strict_mode_catches_bare_sum_hugeint(spark):
    """A bare SUM over an integer column is HUGEINT in DuckDB: the lax
    compare (fetchall -> Python int) is green, strict is red."""

    def q(spark, sf_dir):
        from pyspark.sql import functions as F

        from arkflow_spark.tables import load

        nation = load(spark, sf_dir, "nation")
        return nation.groupBy("n_regionkey").agg(
            F.sum("n_nationkey").alias("s")
        ).orderBy("n_regionkey")

    bare = "SELECT n_regionkey, SUM(n_nationkey) AS s FROM nation GROUP BY 1 ORDER BY 1"
    lax = compare("fixture_bare_sum", spark, SF_DIR, q, bare)
    assert lax.ok, f"lax compare should mask HUGEINT: {lax}"
    strict = compare("fixture_bare_sum", spark, SF_DIR, q, bare, strict=True)
    assert not strict.ok, "strict compare must red-flag HUGEINT vs bigint"
    assert strict.spark_rows == strict.oracle_rows  # values equal, types not

    cast = (
        "SELECT n_regionkey, CAST(SUM(n_nationkey) AS BIGINT) AS s "
        "FROM nation GROUP BY 1 ORDER BY 1"
    )
    fixed = compare("fixture_cast_sum", spark, SF_DIR, q, cast, strict=True)
    assert fixed.ok, f"cast oracle should be strict-green: {fixed}"


@pytest.mark.parametrize("name", FIXED)
def test_fixed_round3_offenders_strict_green(spark, name):
    res = compare(name, spark, SF_DIR, QUERIES[name], ORACLE[name], strict=True)
    assert res.ok, str(res)
