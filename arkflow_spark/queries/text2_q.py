"""Corpus lexical-statistics operators: Zipf-law fit and hapax ratio.

Corpus-health diagnostics a training-data pipeline runs per language
slice: a healthy natural-language corpus has a Zipf exponent near -1 and
a stable hapax-legomena share; synthetic/duplicated/boilerplate text
shifts both. Both operators ride the same one-shuffle token-count
aggregation as `text_vocab_topk` and reduce to per-language scalars, so
the output is tiny regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.queries.text_q import TOKEN_RE
from arkflow_spark.tables import load


def _tok_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, token) -> n over the whole corpus; one shuffle, map-side
    combine absorbs stopword skew."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )
    return tok.groupBy("lang", "token").agg(F.count("*").alias("n"))


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH tok AS (
      SELECT lang,
             unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
      FROM documents
    ),
    counts AS (
      SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token
    ),
    ranked AS (
      SELECT lang, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, token) AS rnk
      FROM counts
    )
    SELECT lang,
           COUNT(*) AS n_terms,
           floor(regr_slope(ln(n), ln(rnk)) * 10000 + 0.5) / 10000
             AS zipf_slope,
           floor(regr_r2(ln(n), ln(rnk)) * 10000 + 0.5) / 10000
             AS zipf_r2
    FROM ranked WHERE rnk <= 500
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per language: regress log(frequency) on log(rank)
    over the top-500 terms — slope ~ -1 and high r² for natural text;
    corpus pathologies (mass duplication, templated boilerplate, wrong
    language splits) show up as slope/r² drift. Exercises the regr_*
    aggregate family (reference: docs/docs/sql/5-aggregate_functions.md:
    571-687) on a real pipeline task rather than a synthetic pair.

    Determinism: rank ties break on token; the regression inputs are
    exact logs of exact counts, and the regr_* reductions are rounded to
    4 decimals (double-sum order drift is ~1e-13 relative).

    Scale notes: token counts are one shuffle; the per-language rank
    window touches only each language's vocabulary (already reduced), and
    the 500-term cap bounds the regression input per group. No Python.
    """
    counts = _tok_counts(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    ranked = counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 500
    )
    ln_n, ln_r = F.log(F.col("n")), F.log(F.col("rnk"))

    def _r4(c: F.Column, alias: str) -> F.Column:
        return (F.floor(c * 10000 + 0.5) / 10000).alias(alias)

    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_terms"),
            _r4(F.regr_slope(ln_n, ln_r), "zipf_slope"),
            _r4(F.regr_r2(ln_n, ln_r), "zipf_r2"),
        )
        .orderBy("lang")
    )


@query(
    "text_hapax_ratio",
    oracle=f"""
    WITH tok AS (
      SELECT lang,
             unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
      FROM documents
    ),
    counts AS (
      SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token
    )
    SELECT lang,
           COUNT(*) AS vocab_size,
           COUNT(*) FILTER (WHERE n = 1) AS hapax_count,
           CAST(COUNT(*) FILTER (WHERE n = 1) AS DOUBLE) / COUNT(*)
             AS hapax_ratio
    FROM counts
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena share per language (fraction of vocabulary seen
    exactly once) — the classic lexical-diversity / OCR-noise gauge: a
    spike means noisy tokens (OCR garbage, code, concatenated words), a
    collapse means heavy duplication. Pure re-aggregation of the token
    counts: two cascaded hash aggregates, both map-side combinable.
    """
    counts = _tok_counts(spark, sf_dir)
    hapax = F.count(F.when(F.col("n") == 1, 1))
    return (
        counts.groupBy("lang")
        .agg(
            F.count("*").alias("vocab_size"),
            hapax.alias("hapax_count"),
            (hapax.cast("double") / F.count("*")).alias("hapax_ratio"),
        )
        .orderBy("lang")
    )
