"""functions/triangles.triangle_count — exactness vs brute force.

The degree-ordered orientation must count each triangle exactly once
on skewed (hub) graphs, regular graphs, and graphs with degree ties —
the id-oriented SQL oracles stay as independent witnesses in the two
consumer queries.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from arkflow_spark.functions.triangles import triangle_count


def _brute(edge_set):
    nodes = sorted({n for e in edge_set for n in e})
    have = set(edge_set)
    return sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in have and (b, c) in have and (a, c) in have
    )


@pytest.mark.parametrize(
    "edges",
    [
        # hub: node 0 connected to all, plus a chain closing triangles
        [(0, i) for i in range(1, 9)] + [(i, i + 1) for i in range(1, 8)],
        # two disjoint 4-cliques (degree ties everywhere)
        [(a, b) for a, b in combinations(range(4), 2)]
        + [(a + 10, b + 10) for a, b in combinations(range(4), 2)],
        # triangle-free bipartite-ish graph
        [(0, 5), (1, 5), (2, 6), (3, 6), (0, 7), (4, 7)],
        # single triangle
        [(1, 2), (2, 3), (1, 3)],
    ],
)
def test_matches_brute_force(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    got = triangle_count(df).collect()[0]["t"]
    assert got == _brute(edges)
