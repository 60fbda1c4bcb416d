"""Product-quantization (PQ) approximate nearest neighbour over the
`embeddings` table — the memory-bound scale path that complements the IVF
coarse quantizer in :mod:`arkflow_spark.queries.vector_q`.

PQ splits each 64-dim vector into M=4 subvectors of 16 dims, maps each
subvector to the nearest of K=16 codewords per subspace, and answers
queries with asymmetric distance computation (ADC): the query precomputes
its distance to every codeword (M*K = 64 doubles), and a candidate's
approximate distance is the sum of M table lookups — so the corpus is
stored as M bytes/vector instead of 256 bytes/vector (64x compression).

To keep the whole thing a hash-matchable oracle query (no RNG, no
iterative training), the codebook is a deterministic sample: the
subvectors of vec_id 0..K-1. Real deployments would K-means the codebook
(``arkflow_spark.ml`` has the trainer); assignment and ADC — the parts
that touch the full corpus — are identical either way.

Determinism: every squared-distance term is (a-b)^2 of float32-backed
doubles (exact in IEEE double: 48-bit product). The 16-term subvector
sums are LEFT-ASSOCIATED double folds in BOTH engines (Spark
``F.aggregate`` over the array; DuckDB ``list_reduce`` over a
dimension-ordered list) — bit-identical, so argmins cannot flip — and
the 4-term ADC sums accumulate as DECIMAL(20,10) in both engines;
final distances are emitted rounded to 6 decimals. (Round 3: the
previous per-dimension decimal accumulation was the headline-bench
bottleneck — 5M decimal adds; the fixed-order double fold is equally
deterministic and ~3x faster.)

Scale notes (100 TB): codebook and query distance tables are O(M*K) and
broadcast; code assignment is one narrow broadcast-join stage over the
corpus followed by a map-side-combinable argmin agg on (vec_id, subspace);
ADC is a broadcast lookup-join + 4-row-per-pair sum. The only wide
operation is the final per-query top-k (here a row_number window; on a
real cluster the per-partition local top-k + merge that
TakeOrderedAndProject performs for global limits applies per query key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# primitives + the materialized PQ code index live in functions/pq (r8
# — the sixth index family); the _-prefixed aliases keep the import
# surface analytics36/40 bind to
from arkflow_spark.functions.pq import (  # noqa: F401
    DIM,
    K,
    M,
    SUB,
    d2 as _d2,
    pq_codes,
    subspaces as _subspaces,
)
from arkflow_spark.queries.base import query
from arkflow_spark.tables import load

N_QUERIES = 5
TOP_K = 10


_PQ_ORACLE = f"""
    WITH x AS (
      SELECT vec_id, (g.i - 1) // {SUB} AS s, g.i AS i,
             CAST(embedding[g.i] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN generate_series(1, {DIM}) g(i)
      WHERE g.i <= len(embedding)
    ),
    cb AS (SELECT vec_id AS code, s, i, v FROM x WHERE vec_id < {K}),
    d AS (  -- left-fold double d2, bit-identical to Spark's F.aggregate
      SELECT c.vec_id, b.s, b.code,
             list_reduce(list((c.v - b.v) * (c.v - b.v) ORDER BY c.i),
                         (acc, t) -> acc + t) AS d2
      FROM x c JOIN cb b ON c.i = b.i
      GROUP BY 1, 2, 3
    ),
    assign AS (
      SELECT vec_id AS cand_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, code) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT q.vec_id AS query_id, a.cand_id,
             SUM(CAST(q.d2 AS DECIMAL(20,10))) AS ad2
      FROM assign a JOIN d q ON q.s = a.s AND q.code = a.code
      WHERE q.vec_id < {N_QUERIES} AND a.cand_id <> q.vec_id
      GROUP BY 1, 2
    )
    -- round the exact DECIMAL, then cast: rounding after a double cast
    -- flips on .5-at-6dp boundaries (double shortest-repr vs double
    -- arithmetic disagree in the last ulp; hypothesis found one)
    SELECT query_id, cand_id,
           CAST(ROUND(ad2, 6) AS DOUBLE) AS approx_d2, rnk
    FROM (
      SELECT query_id, cand_id, ad2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ad2, cand_id) AS rnk
      FROM adc
    )
    WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
"""


@query("ann_pq_topk", oracle=_PQ_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k: assign every corpus vector an M-byte PQ code against
    a deterministic codebook, then rank candidates per query by the sum of
    M precomputed query-to-codeword distances."""
    e = load(spark, sf_dir, "embeddings")
    cb = _subspaces(e.filter(F.col("vec_id") < K), "code")

    # corpus -> PQ codes: read the materialized code index (r8 —
    # built once per session by functions/pq.pq_codes, bucketed on
    # vec_id; value-identical to the inline argmin it replaces)
    codes = pq_codes(spark, sf_dir).select(
        F.col("vec_id").alias("cand_id"), "s", "code"
    )

    # query ADC tables: distance of each query subvector to every codeword
    qd = (
        _subspaces(e.filter(F.col("vec_id") < N_QUERIES), "query_id")
        .join(F.broadcast(cb.withColumnRenamed("sub", "cb_sub")), "s")
        .select(
            "query_id",
            "s",
            "code",
            _d2(F.col("sub"), F.col("cb_sub")).alias("d2"),
        )
    )

    adc = (
        codes.join(F.broadcast(qd), ["s", "code"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum(F.col("d2").cast("decimal(20,10)")).alias("ad2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ad2"), F.asc("cand_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            # round the exact decimal FIRST (HALF_UP at scale 6 in both
            # engines), cast after — double-then-round flips on .5
            # boundaries (see oracle comment)
            F.round(F.col("ad2"), 6).cast("double").alias("approx_d2"),
            "rnk",
        )
        .orderBy("query_id", "rnk")
    )
