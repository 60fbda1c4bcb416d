"""functions/knn.blocked_knn_edges — exactness vs brute force.

The primitive's contract: the 2-D blocked cogroup dataflow returns the
EXACT top-k (the true top-k is a subset of the union of per-cell
top-ks), self-pairs excluded, ties on candidate id — for both metrics,
with and without part columns, and for block counts that do and don't
divide the input evenly.
"""

from __future__ import annotations

import numpy as np
import pytest

from arkflow_spark.functions.knn import blocked_knn_edges


def _mk(spark, n=23, dim=5, labels=3, seed=7):
    rng = np.random.RandomState(seed)
    rows = [
        (
            int(i * 13 + 5),
            int(i % labels),
            [float(x) for x in rng.randn(dim)],
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


def _brute(rows, k, metric, by_label):
    ids = np.array([r[0] for r in rows])
    labs = np.array([r[1] for r in rows])
    mat = np.array([r[2] for r in rows])
    out = set()
    for i in range(len(rows)):
        cands = []
        for j in range(len(rows)):
            if j == i:
                continue
            if by_label and labs[j] != labs[i]:
                continue
            if metric == "cosine":
                a = mat[i] / np.linalg.norm(mat[i])
                b = mat[j] / np.linalg.norm(mat[j])
                # rank desc -> negate for ascending sort
                cands.append((-float(a @ b), int(ids[j])))
            else:
                d = mat[i] - mat[j]
                cands.append((float((d * d).sum()), int(ids[j])))
        cands.sort()
        for rank, (_, nid) in enumerate(cands[:k], start=1):
            out.add((int(ids[i]), nid, rank))
    return out


@pytest.mark.parametrize("metric", ["cosine", "sqeuclidean"])
@pytest.mark.parametrize("qb,cb", [(1, 1), (3, 4), (5, 2)])
def test_matches_brute_force(spark, metric, qb, cb):
    rows, df = _mk(spark)
    got = {
        (r["qid"], r["nid"], r["r"])
        for r in blocked_knn_edges(
            df, "vec_id", "embedding", k=4, metric=metric,
            q_blocks=qb, c_blocks=cb,
        ).collect()
    }
    assert got == _brute(rows, 4, metric, by_label=False)


def test_part_cols_restrict_to_label(spark):
    rows, df = _mk(spark)
    got = {
        (r["qid"], r["nid"], r["r"])
        for r in blocked_knn_edges(
            df, "vec_id", "embedding", k=3, metric="sqeuclidean",
            part_cols=["label"], q_blocks=2, c_blocks=3,
        ).collect()
    }
    assert got == _brute(rows, 3, "sqeuclidean", by_label=True)


def test_k_larger_than_group(spark):
    rows, df = _mk(spark, n=4, labels=2)
    edges = blocked_knn_edges(
        df, "vec_id", "embedding", k=10, metric="sqeuclidean",
        part_cols=["label"], q_blocks=3, c_blocks=3,
    ).collect()
    # each vector has exactly one same-label non-self neighbour
    assert len(edges) == 4
    assert all(r["r"] == 1 and r["qid"] != r["nid"] for r in edges)


def test_rejects_unknown_metric(spark):
    _, df = _mk(spark, n=4)
    with pytest.raises(ValueError, match="unknown metric"):
        blocked_knn_edges(df, "vec_id", "embedding", 2, metric="l1")
