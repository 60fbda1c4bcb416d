"""Fixture-level sanity for the GPD peaks-over-threshold fit.

An exponential tail is the xi=0 boundary of the GPD family and, by
memorylessness, its excesses over any threshold are again exponential
with the same scale. The Hosking/Wallis PWM closed forms must therefore
return xi ~ 0 and sigma ~ mean(excess) > 0 on an exponential sample —
the exact case the round-4 ascending-weight bug inverted (xi ~ 4,
sigma < 0)."""

from __future__ import annotations

import math

from arkflow_spark.queries.analytics40_q import events_gpd_pot_fit


def test_gpd_exponential_tail_gives_xi_near_zero_positive_sigma(
    spark, tmp_path
):
    n = 1000
    # deterministic exponential(1) sample via inverse-CDF on the
    # midpoint grid: x_i = -ln(1 - (i-0.5)/n)
    rows = [
        (i, None, 0, "exp", -math.log(1.0 - (i - 0.5) / n), "{}")
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = events_gpd_pot_fit(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_excesses"] >= 90
    assert r["sigma_scale"] is not None and r["sigma_scale"] > 0
    # exponential => xi = 0; the discretized grid lands within ~0.1
    assert abs(r["xi_shape"]) < 0.15
    # sigma ~ the exponential scale (1.0) by memorylessness
    assert 0.7 < r["sigma_scale"] < 1.3
