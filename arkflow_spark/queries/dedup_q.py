"""Deduplication operators over `documents`: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

A core training-data-pipeline capability beyond the reference's own surface
(BASELINE.json north star). Cross-engine determinism: every hash function is
built from md5 hex (identical in Spark and DuckDB), converted to integers via
base-16 parse, so the DuckDB oracle replicates the full pipeline bit-for-bit.

Scale design (100 TB):
- exact dedup = hash-groupBy: one shuffle on a 128-bit key, no skew
  (fingerprints are uniform).
- n-gram Jaccard all-pairs is quadratic in shingle frequency — correct but
  reserved for verification; the scalable path is MinHash+LSH, which caps
  the join key cardinality at (band, band_key) buckets.
- SimHash pairs join on 8-bit bands (pigeonhole: hamming<=3 over 4 bands
  leaves one band intact), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load

N_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows: LSH threshold ~ (1/4)^(1/4) ~ 0.71


def _norm_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> distinct 3-word shingles (1-based element_at matches the
    oracle's 1-based list indexing)."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    return (
        d.select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


_ORACLE_SHINGLES = r"""
    docs AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             w[g.i] || ' ' || w[g.i+1] || ' ' || w[g.i+2] AS shingle
      FROM docs CROSS JOIN generate_series(1, 4000) g(i)
      WHERE g.i <= len(w) - 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
"""


@query(
    "dedup_exact",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
      FROM documents
    )
    SELECT doc_id, f AS fingerprint,
           doc_id = MIN(doc_id) OVER (PARTITION BY f) AS keep,
           COUNT(*) OVER (PARTITION BY f) AS group_size
    FROM fp
    ORDER BY doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash; keep the smallest doc_id per
    group. One shuffle on the fingerprint — the 100 TB-safe first pass."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    fp = d.select("doc_id", F.md5(_norm_text(F.col("text"))).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
        F.count("*").over(w).alias("group_size"),
    ).orderBy("doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b,
           ROUND(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.6
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.6) via shingle
    self-join. Correctness baseline for the MinHash path; at 100 TB the
    shingle join is capped by LSH instead (see dedup_minhash_lsh)."""
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("shared") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.6)
        .select(
            "doc_a", "doc_b", "shared", "n_a", "n_b",
            F.round(jac, 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _mh_oracle() -> str:
    return f"""
    WITH {_ORACLE_SHINGLES},
    hashed AS (
      SELECT doc_id, g.i AS i,
             MIN(CAST(('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':' || shingle),
                       1, 15)) AS BIGINT)) AS mh
      FROM sh CROSS JOIN generate_series(0, {N_HASHES - 1}) g(i)
      GROUP BY doc_id, g.i
    ),
    bands AS (
      SELECT doc_id, i // {BAND_SIZE} AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS band_key
      FROM hashed GROUP BY doc_id, i // {BAND_SIZE}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT v.doc_a, v.doc_b,
           ROUND(v.shared * 1.0 / (sa.n + sb.n - v.shared), 4) AS jaccard
    FROM verified v
    JOIN sizes sa ON sa.doc_id = v.doc_a
    JOIN sizes sb ON sb.doc_id = v.doc_b
    WHERE v.shared * 1.0 / (sa.n + sb.n - v.shared) >= 0.7
    ORDER BY doc_a, doc_b
    """


@query("dedup_minhash_lsh", oracle=_mh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 perms) + LSH banding (4x4) near-dup pairs, verified with
    exact Jaccard >= 0.7 on the candidates only.

    The hash family h_i(s) = int(md5(i ':' s)[:15], 16) is engine-portable.
    Scale notes: candidate generation joins on (band, band_key) buckets —
    join fan-out is bounded by bucket size, not corpus size; the exact
    verification join touches only candidate pairs. This is the 100 TB
    near-dedup path.
    """
    sh = _shingles(spark, sf_dir)
    idx = F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("i")
    hashed = (
        sh.select("doc_id", "shingle", idx)
        .select(
            "doc_id",
            "i",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("i").cast("string"), "shingle")),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
    )
    bands = hashed.groupBy(
        "doc_id", (F.col("i") / BAND_SIZE).cast("int").alias("band")
    ).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mh"))),
                lambda s: s["mh"].cast("string"),
            ),
        ).alias("band_key")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("s_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("s_b"))
    verified = (
        cand.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b2")) & (F.col("s_b") == F.col("s_a")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("shared") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        verified.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.7)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def _simhash_bits_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN (h >> {b}) & 1 = 1 THEN sgn ELSE -sgn END)"
        for b in range(0)
    )
    return terms


@query(
    "dedup_simhash",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    tok AS (
      SELECT DISTINCT doc_id, w[g.i] AS token
      FROM docs CROSS JOIN generate_series(1, 4000) g(i)
      WHERE g.i <= len(w)
    ),
    th AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
      FROM tok
    ),
    bits AS (
      SELECT doc_id,
             {", ".join(
                 f"CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
                 f" > 0 THEN CAST(1 AS BIGINT) << {b} ELSE 0 END AS bit{b}"
                 for b in range(32)
             )}
      FROM th GROUP BY doc_id
    )
    SELECT doc_id, {" + ".join(f"bit{b}" for b in range(32))} AS simhash
    FROM bits
    ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints from distinct-token md5 hashes.

    Majority vote per bit runs as 32 conditional-sum aggregates — a single
    map-side-combinable groupBy, no bit explosion. Pairing at scale joins on
    8-bit bands (hamming<=3 keeps one band intact by pigeonhole)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    ).distinct()
    th = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint").alias("h"),
    )
    bit_cols = [
        F.when(
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            )
            > 0,
            F.lit(1).cast("bigint") * (2 ** b),
        )
        .otherwise(0)
        .alias(f"bit{b}")
        for b in range(32)
    ]
    bits = th.groupBy("doc_id").agg(*bit_cols)
    simhash = sum(F.col(f"bit{b}") for b in range(32))
    return bits.select("doc_id", simhash.alias("simhash")).orderBy("doc_id")
