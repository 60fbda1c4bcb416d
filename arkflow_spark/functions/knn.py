"""Distributed exact k-nearest-neighbour edge lists via 2-D blocking.

The exact-kNN audits (`embedding_hubness_knn`'s k-occurrence census,
`embedding_lof_simplified`'s local density ratios) need the TRUE top-k
per vector — candidate pruning (IVF probing, LSH buckets) changes the
answer, which is fine for retrieval (`ann_ivf_search`) but not for an
audit whose oracle is all-pairs. The scale problem is therefore not
compute (quadratic by definition) but DATAFLOW: the r5/r6 builds
shipped the whole corpus to the driver (`collect` + broadcast) or
joined label buckets all-pairs — both corpus-proportional on a single
node, the one shape that cannot survive 100 TB.

This module is the classic block-nested-loop dataflow instead (the
textbook structure for distributed exact similarity joins — the same
shape MLlib's `approxSimilarityJoin` degenerates to when every pair
shares a bucket):

- queries get a block id ``qb = xxhash64(id) % Q``; corpus vectors get
  ``cb = xxhash64(id) % C``;
- queries are replicated C times (one copy per corpus block), corpus
  vectors Q times — LINEAR shuffle (C x corpus + Q x corpus), never
  quadratic;
- each (part, qb, cb) cell cogroups ~N/Q queries against ~N/C corpus
  vectors in one Arrow batch: a single float64 BLAS/numpy pass emits
  that cell's local top-k per query;
- a (part, qid)-keyed window merges the per-cell top-ks into the exact
  global top-k (the true top-k is always a subset of the union of
  per-cell top-ks).

Per-task memory is (N/Q + N/C) vectors plus the (N/Q x N/C) score
tile — both chosen by Q and C, independent of total corpus size; at
1000 executors you raise Q x C to match, the driver never holds a row.

Determinism: every (query, candidate) score is computed exactly once
in exactly one cell, so cross-cell merge compares numbers from the
same computation; ties break on candidate id. FP note: numpy/BLAS
reductions differ from an SQL engine's sum order in the last ulp —
callers rely on top-k ordering margins exceeding that (the same
contract the pre-r7 broadcast-matmul form used, driver-proved r5/r6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_knn_edges(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    metric: str = "cosine",
    part_cols: list[str] | None = None,
    q_blocks: int = 4,
    c_blocks: int = 4,
) -> DataFrame:
    """Exact kNN edge list ``(part..., qid, nid, val, r)``.

    ``metric="cosine"``: ``val`` is cosine similarity on
    length-normalized vectors, neighbours ranked ``val`` DESC.
    ``metric="sqeuclidean"``: ``val`` is the squared L2 distance
    (elementwise-difference sum, no dot-product expansion — the
    expansion cancels catastrophically for near pairs), ranked ASC.
    Self-pairs (qid == nid) are excluded. With ``part_cols``,
    neighbours are searched within the same part values only (e.g.
    LOF within label).
    """
    if metric not in ("cosine", "sqeuclidean"):
        raise ValueError(f"unknown metric: {metric!r}")
    parts = list(part_cols or [])
    spark = df.sparkSession
    base = df.select(*parts, id_col, vec_col)

    qside = base.withColumn(
        "__qb", F.pmod(F.xxhash64(F.col(id_col)), F.lit(q_blocks))
    ).crossJoin(
        F.broadcast(
            spark.range(c_blocks).select(
                F.col("id").cast("bigint").alias("__cb")
            )
        )
    )
    # rename the corpus side wholesale — both sides derive from the
    # same plan, and cogrouping two groupings of one lineage trips
    # Spark's ambiguous-column detection (cogroup keys match by
    # POSITION, so the names may differ)
    cbase = base.select(
        *[F.col(p).alias(f"__c_{p}") for p in parts],
        F.col(id_col).alias("__c_id"),
        F.col(vec_col).alias("__c_vec"),
    )
    cside = cbase.withColumn(
        "__cb2", F.pmod(F.xxhash64(F.col("__c_id")), F.lit(c_blocks))
    ).crossJoin(
        F.broadcast(
            spark.range(q_blocks).select(
                F.col("id").cast("bigint").alias("__qb2")
            )
        )
    )

    keys = parts + ["__qb", "__cb"]
    ckeys = [f"__c_{p}" for p in parts] + ["__qb2", "__cb2"]
    part_schema = "".join(
        f"{f.name} {f.dataType.simpleString()}, "
        for f in base.schema
        if f.name in parts
    )
    out_schema = part_schema + "qid BIGINT, nid BIGINT, val DOUBLE"
    asc = metric == "sqeuclidean"

    def cell(left, right):
        import numpy as np
        import pandas as pd

        cols = parts + ["qid", "nid", "val"]
        if not len(left) or not len(right):
            return pd.DataFrame(columns=cols)
        q = np.array(list(left[vec_col]), dtype=np.float64)
        c = np.array(list(right["__c_vec"]), dtype=np.float64)
        qid = left[id_col].to_numpy()
        nid = right["__c_id"].to_numpy()
        if metric == "cosine":
            q = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
            c = c / np.sqrt((c * c).sum(axis=1, keepdims=True))
            score = q @ c.T
        else:
            diff = q[:, None, :] - c[None, :, :]
            score = (diff * diff).sum(axis=-1)
        # exclude self-pairs before the local top-k
        self_mask = qid[:, None] == nid[None, :]
        score = np.where(
            self_mask, np.inf if asc else -np.inf, score
        )
        kk = min(k, score.shape[1])
        rows_q, rows_n, rows_v = [], [], []
        for i in range(score.shape[0]):
            s = score[i]
            order = np.lexsort((nid, s if asc else -s))[:kk]
            for j in order:
                if np.isinf(s[j]):
                    continue  # the self-pair when the cell is tiny
                rows_q.append(int(qid[i]))
                rows_n.append(int(nid[j]))
                rows_v.append(float(s[j]))
        out = pd.DataFrame(
            {"qid": rows_q, "nid": rows_n, "val": rows_v}
        )
        for p in parts:
            out[p] = left[p].iloc[0]
        return out[cols]

    edges = (
        qside.groupBy(*keys)
        .cogroup(cside.groupBy(*ckeys))
        .applyInPandas(cell, out_schema)
    )
    w = Window.partitionBy(*parts, "qid").orderBy(
        F.asc("val") if asc else F.desc("val"), F.asc("nid")
    )
    return (
        edges.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
    )
