"""ML feature queries: exact TF-IDF (oracled) and MLlib KMeans-IVF
(rows-only; iterative algorithm, not SQL-expressible).

The exact TF-IDF here is the correctness contract for the hashed
``arkflow_spark.ml.tfidf_pipeline`` scale path: same tokenizer regex, same
idf formula (MLlib's ``ln((N+1)/(df+1))``), computed with explicit
DataFrame ops so DuckDB can verify it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load

TERM_RE = "[a-z]{2,}"
TOP_TERMS = 5


@query(
    "text_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TERM_RE}')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             ROUND(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 4)
               AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rnk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_TERMS}
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF, top-{TOP_TERMS} terms per document (MLlib idf formula
    ``ln((N+1)/(df+1))``; ranking on the ROUNDED score so both engines rank
    identical doubles, term as deterministic tie-break).

    Scale notes: tf is one shuffle on (doc_id, term) with map-side partial
    aggregation; df aggregates the (already distinct) tf pairs on term and
    is vocabulary-sized → broadcast into the scoring join; N rides along as
    a broadcast single-row aggregate (no driver-side collect). The hashed
    MLlib pipeline (`arkflow_spark.ml.tfidf_pipeline`) replaces the
    vocabulary join entirely at 100 TB; this query is its oracle-checked
    semantic baseline.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TERM_RE), 0)
        ).alias("term"),
    )
    # tf feeds BOTH the df aggregation and the scoring join; persist it so
    # the shingle-style DAG computes the (doc_id, term) shuffle once (at
    # 100 TB: a staging table — Spark has no cross-subtree CSE)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


@query("ml_kmeans_ivf")  # rows-only: iterative MLlib fit, not SQL-expressible
def ml_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib KMeans coarse quantizer over `embeddings` (k=8, fixed seed):
    fit centroids, assign every vector, emit per-bucket profile (size +
    norm of the centroid). The unlabeled-data counterpart of the oracled
    `ann_ivf_assign`; the driver records a rows-only check (k rows).

    Scale notes: KMeans cost = iterations × (one pass + k×dim centroid
    broadcast); assignment is a narrow row-local transform — the same
    shapes MLlib runs on real clusters.
    """
    from arkflow_spark.ml import assign_buckets, fit_kmeans_ivf

    e = load(spark, sf_dir, "embeddings")
    model = fit_kmeans_ivf(e, k=8, seed=42)
    assigned = assign_buckets(model, e)
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count("*").alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
        )
        .orderBy("bucket")
    )
