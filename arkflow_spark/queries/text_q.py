"""Text-analysis operators for training-data pipelines over `documents`.

These extend the reference's capability surface (BASELINE.json north star):
language-ID heuristics, quality scoring, token counting, fingerprinting.
Everything is built from JVM-side expressions (no Python UDFs) so the whole
stage stays inside WholeStageCodegen and scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query, seq1
from arkflow_spark.tables import load

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "zh": ("de", "shi", "le", "zai", "he"),
}

# the word-boundary token pattern shared by Spark and the DuckDB oracle:
# letter runs, digit runs, or single punctuation — a BPE-ish pre-tokenizer
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _tok_count(col):
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0))


@query(
    "text_quality_score",
    oracle=r"""
    WITH m AS (
      SELECT doc_id, lang, n_chars,
             length(text) AS len_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
             length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
             len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                 w -> w IN ('the','and','of','to','in','a'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, lang, len_chars, n_words, n_punct,
           ROUND(n_punct * 1.0 / len_chars, 4) AS punct_ratio,
           ROUND(n_stop * 1.0 / n_words, 4) AS stopword_ratio,
           ROUND(len_chars * 1.0 / n_words, 4) AS avg_word_len,
           (len_chars BETWEEN 100 AND 10000)
             AND (n_punct * 1.0 / len_chars < 0.1)
             AND (n_words >= 20) AS passes_quality
    FROM m
    ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals: length/punctuation/stopword ratios + a
    boolean quality gate — the C4/Gopher-style pre-training filter shape."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    len_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", "[^.!?,;:]", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.lower("text"), r"\s+"),
            lambda w: w.isin("the", "and", "of", "to", "in", "a"),
        )
    )
    return (
        d.select(
            "doc_id",
            "lang",
            len_chars.alias("len_chars"),
            n_words.alias("n_words"),
            n_punct.alias("n_punct"),
            F.round(n_punct * 1.0 / len_chars, 4).alias("punct_ratio"),
            F.round(n_stop * 1.0 / n_words, 4).alias("stopword_ratio"),
            F.round(len_chars * 1.0 / n_words, 4).alias("avg_word_len"),
            (
                len_chars.between(100, 10000)
                & (n_punct * 1.0 / len_chars < 0.1)
                & (n_words >= 20)
            ).alias("passes_quality"),
        )
        .orderBy("doc_id")
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"len(list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        f" w -> w IN ({words})))"
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS true_lang,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr,
             {_lang_score_sql('de')} AS s_de
      FROM documents
    )
    SELECT doc_id, true_lang, s_en, s_es, s_fr, s_de,
           CASE GREATEST(s_en, s_es, s_fr, s_de)
             WHEN s_en THEN 'en' WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr' ELSE 'de' END AS pred_lang
    FROM scored
    ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language identification heuristic. Tie-break order
    (en > es > fr > de) is encoded identically in both engines."""
    d = load(spark, sf_dir, "documents")

    def score(lang: str):
        return F.size(
            F.filter(
                F.split(F.lower("text"), r"\s+"),
                lambda w: w.isin(*LANG_STOPWORDS[lang]),
            )
        )

    s_en, s_es, s_fr, s_de = (score(lg) for lg in ("en", "es", "fr", "de"))
    best = F.greatest(s_en, s_es, s_fr, s_de)
    return (
        d.select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            s_en.alias("s_en"),
            s_es.alias("s_es"),
            s_fr.alias("s_fr"),
            s_de.alias("s_de"),
        )
        .withColumn(
            "pred_lang",
            F.when(F.col("s_en") == F.greatest("s_en", "s_es", "s_fr", "s_de"), "en")
            .when(F.col("s_es") == F.greatest("s_en", "s_es", "s_fr", "s_de"), "es")
            .when(F.col("s_fr") == F.greatest("s_en", "s_es", "s_fr", "s_de"), "fr")
            .otherwise("de"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens,
           ROUND(length(text) * 1.0
                 / len(regexp_extract_all(lower(text), '{TOKEN_RE}')), 4)
             AS chars_per_token
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (pre-tokenizer statistics for training-data budgeting)."""
    d = load(spark, sf_dir, "documents")
    n_tok = _tok_count(F.col("text"))
    n_ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.round(F.length("text") * 1.0 / n_tok, 4).alias("chars_per_token"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             AS norm_fingerprint,
           substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 8)
             AS short_fp,
           length(text) AS raw_len
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized content fingerprint (md5) — the cheap exact-dup
    key used before any near-dup pass."""
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fingerprint"),
        F.substring(F.md5(norm), 1, 8).alias("short_fp"),
        F.length("text").alias("raw_len"),
    ).orderBy("doc_id")


@query(
    "documents_clean_corpus",
    oracle=rf"""
    WITH fp AS (
      SELECT doc_id, lang, text,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
             len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens
      FROM documents
    ), canon AS (
      SELECT *,
             doc_id = MIN(doc_id) OVER (PARTITION BY f) AS is_canonical,
             COUNT(*) OVER (PARTITION BY f) AS n_copies
      FROM fp
    )
    SELECT doc_id, lang, n_tokens, n_copies
    FROM canon
    WHERE is_canonical
      AND n_tokens BETWEEN 20 AND 2000
      AND length(trim(text)) > 0
    ORDER BY doc_id
    """,
)
def documents_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning — the composition every training-data
    pipeline runs: exact dedup (keep the canonical copy), token-count
    quality gate (20..2000 BPE-ish tokens), non-empty guard. One oracled
    query so the whole pipeline, not just its parts, is hash-verified.

    Scale notes: one shuffle on the content fingerprint (uniform 128-bit
    key) does the dedup; the token gate is a narrow JVM-side regexp — at
    100 TB this is a single wide stage plus a window over fingerprint
    groups (group sizes are tiny: duplicate multiplicity)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "lang",
        "text",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("f"),
        _tok_count(F.col("text")).alias("n_tokens"),
    )
    w = Window.partitionBy("f")
    canon = fp.select(
        "*",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
        F.count("*").over(w).alias("n_copies"),
    )
    return (
        canon.filter(
            F.col("is_canonical")
            & F.col("n_tokens").between(20, 2000)
            & (F.length(F.trim(F.col("text"))) > 0)
        )
        .select("doc_id", "lang", "n_tokens", "n_copies")
        .orderBy("doc_id")
    )


@query(
    "text_vocab_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS n FROM tok GROUP BY token
    )
    SELECT token, n,
           row_number() OVER (ORDER BY n DESC, token) AS rnk
    FROM counts
    ORDER BY rnk
    LIMIT 100
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: top-100 tokens by global frequency
    (tokenizer-vocabulary construction statistics; deterministic tie-break
    by token).

    Scale notes: token counts are one shuffle with map-side partial
    aggregation (uniform-ish key space; stopword skew is absorbed by the
    partial agg); the top-100 is TakeOrderedAndProject — no global sort."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
        ).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    # rank AFTER the top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps, no global sort); the rank window then touches
    # only 100 rows instead of the whole vocabulary
    # scale: top-k-bounded (window after limit 100)
    topk = counts.orderBy(F.desc("n"), F.asc("token")).limit(100)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return topk.withColumn("rnk", F.row_number().over(w)).orderBy("rnk")


# common-subset regex (Java + RE2): no backrefs, no lookaround
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE_RE = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS n_phones,
             regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}',
                 '[EMAIL]', 'g'), '{PII_PHONE_RE}', '[PHONE]', 'g')
               AS redacted
      FROM documents
    )
    SELECT doc_id, n_emails, n_phones,
           md5(redacted) AS redacted_fp,
           length(redacted) AS redacted_len,
           n_emails + n_phones > 0 AS has_pii
    FROM r
    ORDER BY doc_id
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact (emails, phone numbers) — the compliance pass a
    training-data pipeline runs before tokenization. Patterns are in the
    Java/RE2 common subset so both engines match identical spans; the
    redacted text is emitted as md5 so the full transform, not just the
    counts, is hash-verified.

    Scale notes: pure narrow JVM regexp stage (whole-stage codegen), no
    shuffle except the output ordering; at 100 TB this is a map-only pass.
    """
    d = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL_RE, "[EMAIL]"),
        PII_PHONE_RE,
        "[PHONE]",
    )
    n_emails = F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all("text", F.lit(PII_PHONE_RE), 0))
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
        F.length(redacted).alias("redacted_len"),
        ((n_emails + n_phones) > 0).alias("has_pii"),
    ).orderBy("doc_id")


@query(
    "text_bigram_entropy",
    oracle="""
    WITH bi AS (
      SELECT doc_id, substr(text, g.i, 2) AS bg
      FROM documents CROSS JOIN generate_series(1, 4000) g(i)
      WHERE g.i <= length(text) - 1
    ),
    c AS (SELECT doc_id, bg, COUNT(*) AS n FROM bi GROUP BY 1, 2),
    t AS (SELECT doc_id, SUM(n) AS tot, COUNT(*) AS n_distinct FROM c GROUP BY 1)
    SELECT c.doc_id,
           ROUND(-SUM((n * 1.0 / tot) * log2(n * 1.0 / tot)), 4)
             AS bigram_entropy,
           MAX(n_distinct) AS n_distinct_bigrams
    FROM c JOIN t ON t.doc_id = c.doc_id
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)
def text_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram Shannon entropy per document — the cheap
    gibberish/boilerplate detector quality pipelines run alongside
    length/stopword gates (low entropy = repeated boilerplate, high =
    random noise). 4dp rounding absorbs summation-order FP noise.

    Scale notes: the bigram explode is a narrow JVM stage; counts shuffle
    once on (doc_id, bigram) with map-side partials, then a doc-level
    reduce — the same two-level aggregation shape as TF-IDF."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    bi = d.select(
        "doc_id",
        F.explode(
            F.transform(
                seq1(F.length(t) - 1),
                lambda i: t.substr(i, F.lit(2)),
            )
        ).alias("bg"),
    )
    c = bi.groupBy("doc_id", "bg").agg(F.count("*").alias("n"))
    tt = c.groupBy("doc_id").agg(
        F.sum("n").alias("tot"), F.count("*").alias("n_distinct")
    )
    p = F.col("n") * 1.0 / F.col("tot")
    return (
        c.join(tt, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log2(p)), 4).alias("bigram_entropy"),
            F.max("n_distinct").alias("n_distinct_bigrams"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_chunk_split",
    oracle=r"""
    WITH ch AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(floor((length(text) - 1) / 150) AS BIGINT) + 1))
               AS chunk_id
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, chunk_id,
           length(substring(text, CAST(chunk_id * 150 + 1 AS BIGINT), 200))
             AS chunk_len,
           md5(substring(text, CAST(chunk_id * 150 + 1 AS BIGINT), 200))
             AS chunk_md5
    FROM ch ORDER BY doc_id, chunk_id
    """,
)
def text_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking with overlap (size 200, stride 150) —
    the context-window chunker of an LLM ingestion pipeline. One input row
    fans out to ceil(len/stride) chunk rows via sequence+explode, entirely
    JVM-side: a narrow stage (no shuffle), so at 100 TB it scales with
    input splits and the fan-out never concentrates on one executor.
    Chunks are emitted as (len, md5) rather than raw text to keep the
    comparison payload small; substring bounds match DuckDB's."""
    d = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.expr("sequence(0L, CAST(floor((length(text) - 1) / 150) AS LONG))")
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.expr("length(substring(text, chunk_id * 150 + 1, 200))").alias(
                "chunk_len"
            ),
            F.expr("md5(substring(text, chunk_id * 150 + 1, 200))").alias(
                "chunk_md5"
            ),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "text_repetition_ratio",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
      FROM documents
    ), c AS (
      SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           count(*) AS n_distinct,
           ROUND(1.0 - count(*) * 1.0 / sum(cnt), 4) AS dup_word_ratio,
           ROUND(max(cnt) * 1.0 / sum(cnt), 4) AS top_word_ratio,
           (1.0 - count(*) * 1.0 / sum(cnt)) < 0.5
             AND (max(cnt) * 1.0 / sum(cnt)) < 0.2 AS passes_repetition
    FROM c GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction and
    most-frequent-word fraction per document, with a pass/fail gate.
    Two staged aggregations — (doc_id, word) counts then per-doc rollup —
    both benefit from map-side partial aggregation; keys are (doc, word)
    pairs so cardinality stays high and unskewed at 100 TB."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    )
    c = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    n_distinct = F.count(F.lit(1))
    total = F.sum("cnt")
    dup = F.lit(1.0) - n_distinct / total
    top = F.max("cnt") / total
    return (
        c.groupBy("doc_id")
        .agg(
            total.alias("n_words"),
            n_distinct.alias("n_distinct"),
            F.round(dup, 4).alias("dup_word_ratio"),
            F.round(top, 4).alias("top_word_ratio"),
            ((dup < 0.5) & (top < 0.2)).alias("passes_repetition"),
        )
        .orderBy("doc_id")
    )


@query(
    "documents_stratified_sample",
    oracle="""
    WITH rated AS (
      SELECT doc_id, lang, source,
             CASE lang WHEN 'en' THEN 80 WHEN 'es' THEN 50
                       WHEN 'fr' THEN 50 ELSE 25 END AS rate_pct,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INT) % 100 AS die
      FROM documents
    )
    SELECT doc_id, lang, source, rate_pct
    FROM rated
    WHERE die < rate_pct
    ORDER BY doc_id
    """,
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data mixes: each
    language stratum keeps a configured percentage, selected by a hash die
    (md5 of doc_id), NOT rand() — so the sample is reproducible across
    runs, engines, and cluster sizes, and any doc's membership can be
    audited. The standard way to hit a target language/domain mixture.

    Scale notes: pure narrow stage (hash + compare per row), no shuffle,
    no sampling-state; rates are a broadcast-free CASE expression.
    """
    d = load(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 80)
        .when(F.col("lang").isin("es", "fr"), 50)
        .otherwise(25)
    )
    die = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return (
        d.select("doc_id", "lang", "source", rate.alias("rate_pct"), die.alias("_die"))
        .filter(F.col("_die") < F.col("rate_pct"))
        .drop("_die")
        .orderBy("doc_id")
    )


@query(
    "documents_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((cum_tokens - n_tokens) / 2048) AS BIGINT) AS pack_id,
           CAST(cum_tokens - n_tokens
                - FLOOR((cum_tokens - n_tokens) / 2048) * 2048 AS BIGINT)
             AS pack_offset
    FROM packed
    ORDER BY lang, doc_id
    """,
)
def documents_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: concatenate each language stream
    in deterministic doc_id order and chunk the token stream into
    2048-token context windows — every doc gets the pack (window) its
    first token lands in plus its offset within that pack. The
    concat-then-chunk shape standard pretraining loaders use; deterministic
    order makes the packing reproducible across engines/cluster sizes.

    Scale notes: one window sort per language partition (the same shuffle
    a sort-within-partition write needs); everything else is arithmetic.
    At 100 TB, substitute a repartitionByRange(lang, doc_id) +
    sortWithinPartitions and a per-partition running offset.
    """
    from arkflow_spark.queries.text_q import _tok_count
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", _tok_count(F.col("text")).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(start / 2048).cast("bigint").alias("pack_id"),
        (start - F.floor(start / 2048) * 2048).cast("bigint").alias("pack_offset"),
    ).orderBy("lang", "doc_id")


@query(
    "documents_decontaminate",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             regexp_extract_all(lower(trim(text)), '[a-z0-9]+') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             md5(list_aggregate(w[i:i+4], 'string_agg', ' ')) AS g
      FROM words
      CROSS JOIN generate_series(1, 4000) t(i)
      WHERE i + 4 <= len(w)
    ),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
    ),
    hits AS (
      SELECT g.doc_id, COUNT(DISTINCT g.g) AS n_overlap
      FROM grams g JOIN eval_grams e ON g.g = e.g
      WHERE g.doc_id % 50 <> 0
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           COALESCE(h.n_overlap, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 50 <> 0
    ORDER BY d.doc_id
    """,
)
def documents_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 5-gram
    with the eval set (simulated here as every 50th doc) — the standard
    train/test-overlap gate run before pretraining. Word 5-grams are
    md5-hashed so the check joins on 128-bit keys, not raw text.

    Scale notes: the eval side is tiny (benchmarks are MBs) — its distinct
    gram set broadcasts, so the contamination check is a broadcast semi
    join over the training grams: one narrow fan-out (ngram explode) + one
    broadcast join, no all-pairs and no big-side shuffle. At 100 TB the
    eval gram set (~1e6 hashes) still fits comfortably in a broadcast.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(trim(text)), '[a-z0-9]+', 0)").alias("w"),
    )
    grams = words.select(
        "doc_id",
        F.explode(
            F.transform(
                seq1(F.size("w") - 4),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(F.col("w"), i, 5))
                ),
            )
        ).alias("g"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    )
    train_grams = grams.filter(F.col("doc_id") % 50 != 0)
    hits = (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_overlap"))
    )
    train_docs = d.filter(F.col("doc_id") % 50 != 0).select("doc_id")
    return (
        train_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= 1).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@query(
    "documents_training_mix",
    oracle=rf"""
    WITH fp AS (
      SELECT doc_id, lang, source, text,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
             len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens,
             regexp_extract_all(lower(trim(text)), '[a-z]+') AS words
      FROM documents
    ),
    gated AS (
      SELECT *,
             doc_id = MIN(doc_id) OVER (PARTITION BY f) AS is_canonical
      FROM fp
      WHERE n_tokens BETWEEN 20 AND 2000
        AND len(words) > 0
        AND (SELECT AVG(len(w)) FROM unnest(words) t(w)) BETWEEN 2 AND 12
    ),
    surv AS (SELECT doc_id, lang, source, n_tokens FROM gated
             WHERE is_canonical),
    packed AS (
      SELECT *,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_tok
      FROM surv
    )
    SELECT lang, CAST(FLOOR(start_tok / 2048) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           COUNT(DISTINCT source) AS n_sources,
           MIN(doc_id) AS first_doc
    FROM packed
    GROUP BY 1, 2
    ORDER BY lang, pack_id
    """,
)
def documents_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE oracled query: exact dedup
    (canonical copy per content fingerprint) -> quality gates (token
    count 20..2000, mean word length 2..12 — the Gopher-style sanity
    band) -> per-language sequence packing into 2048-token windows ->
    per-pack manifest (doc count, token count, source diversity). This is
    what a user runs nightly; hash-verifying the composition catches
    gate-interaction bugs the per-operator oracles cannot.

    Scale notes: one fingerprint shuffle (dedup) + one per-lang window
    sort (packing) + one (lang, pack) aggregation — three exchanges
    total; every gate is a narrow JVM regexp stage. At 100 TB swap the
    per-lang window for repartitionByRange + sortWithinPartitions
    exactly as in documents_pack_sequences."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = F.expr(r"regexp_extract_all(lower(trim(text)), '[a-z]+', 0)")
    fp = d.select(
        "doc_id",
        "lang",
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("f"),
        _tok_count(F.col("text")).alias("n_tokens"),
        words.alias("words"),
    )
    # try_divide: ANSI mode throws on /0 for zero-word docs (they are
    # filtered out, but predicate evaluation order is Catalyst's choice)
    mean_wlen = F.try_divide(
        F.aggregate(
            F.transform("words", lambda w: F.length(w).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        F.size("words").cast("double"),
    )
    gated = fp.where(
        F.col("n_tokens").between(20, 2000)
        & (F.size("words") > 0)
        & mean_wlen.between(2, 12)
    )
    wf = Window.partitionBy("f")
    surv = (
        gated.withColumn(
            "is_canonical", F.col("doc_id") == F.min("doc_id").over(wf)
        )
        .where("is_canonical")
        .select("doc_id", "lang", "source", "n_tokens")
    )
    wp = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = surv.withColumn(
        "start_tok", F.sum("n_tokens").over(wp) - F.col("n_tokens")
    )
    return (
        packed.groupBy(
            "lang", F.floor(F.col("start_tok") / 2048).cast("bigint").alias("pack_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang", "pack_id")
    )
