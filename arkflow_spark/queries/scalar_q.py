"""Scalar-function surface: strings, regex, datetime, JSON, arrays, structs.

Parity targets: docs/docs/sql/7-scalar_functions.md (4840 lines of DataFusion
functions the reference exposes through its sql processor) and
8-special_functions.md (unnest). Array outputs are scalarized (size /
element / joined string) so cross-engine hashing is representation-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load


@query(
    "scalar_strings",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           length(p_name) AS name_len,
           substr(p_name, 1, 8) AS prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           trim(p_name) AS trimmed,
           replace(p_type, ' ', '_') AS type_snake,
           reverse(p_brand) AS rbrand,
           translate(p_brand, '#', 'N') AS brand_t,
           levenshtein(p_brand, 'Brand#1') AS lev,
           ascii(substr(p_name, 1, 1)) AS first_ascii,
           repeat('ab', 3) AS rep,
           position('#' IN p_brand) AS hash_pos,
           left(p_type, 5) AS type_left,
           right(p_type, 4) AS type_right
    FROM part
    WHERE p_partkey <= 200
    ORDER BY p_partkey
    """,
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: case, slicing, padding, translate, levenshtein, etc.
    (reference: docs/docs/sql/7-scalar_functions.md:703-1725)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.trim("p_name").alias("trimmed"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("rbrand"),
        F.translate("p_brand", "#", "N").alias("brand_t"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("lev"),
        F.ascii(F.substring("p_name", 1, 1)).alias("first_ascii"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.instr("p_brand", "#").alias("hash_pos"),
        F.left("p_type", F.lit(5)).alias("type_left"),
        F.right("p_type", F.lit(4)).alias("type_right"),
    ).orderBy("p_partkey")


@query(
    "scalar_regex",
    oracle="""
    SELECT p_partkey, p_brand,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_type, '^STANDARD') AS is_standard,
           CASE WHEN regexp_matches(p_name, 'gold|silver') THEN 1 ELSE 0 END
             AS has_metal
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike
    (reference: docs/docs/sql/7-scalar_functions.md:1765-1925)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike("^STANDARD").alias("is_standard"),
        F.when(F.col("p_name").rlike("gold|silver"), 1).otherwise(0).alias(
            "has_metal"
        ),
    ).orderBy("p_partkey")


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dy,
           EXTRACT(dow FROM o_orderdate) AS dow,
           EXTRACT(doy FROM o_orderdate) AS doy,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
             AS days_since_95,
           strftime(greatest(o_orderdate, TIMESTAMP '1998-01-01 00:00:00'),
                    '%Y-%m-%d') AS clamped
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / extract / epoch / interval arithmetic / datediff
    (reference: docs/docs/sql/7-scalar_functions.md:1926-2509).

    DuckDB's EXTRACT(dow) is 0=Sunday; Spark's dayofweek is 1=Sunday — the
    Spark side subtracts 1 to align.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("bigint").alias("days_since_95"),
        F.date_format(
            F.greatest("o_orderdate", F.lit("1998-01-01").cast("timestamp")),
            "yyyy-MM-dd",
        ).alias("clamped"),
    ).orderBy("o_orderkey")


@query(
    "scalar_json",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k_str,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY k_str
    ORDER BY CAST(k_str AS BIGINT)
    LIMIT 50
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over a string column (reference json package:
    docs/docs/sql/7-scalar_functions.md:4513-4840 json_get_str/json_get_int)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.filter(k.isNotNull())
        .select(k.alias("k_str"))
        .groupBy("k_str")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k_str").cast("bigint")).alias("k_sum"),
        )
        .orderBy(F.col("k_str").cast("bigint"))
        .limit(50)
    )


@query(
    "scalar_hashing",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           length(md5(text)) AS md5_len
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def scalar_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha2 hashing (reference: docs/docs/sql/7-scalar_functions.md:4223-4378)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length(F.md5("text")).alias("md5_len"),
    ).orderBy("doc_id")


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_discount - 0.05), 6) AS abs_c,
           ROUND(sqrt(l_quantity), 6) AS sqrt_q,
           ROUND(ln(l_extendedprice), 6) AS ln_p,
           ROUND(log10(l_extendedprice), 6) AS log10_p,
           ROUND(power(l_quantity, 2), 6) AS q_sq,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(l_orderkey % 7 AS BIGINT) AS mod7,
           sign(l_discount - 0.05) AS disc_sign,
           ROUND(exp(l_discount), 6) AS exp_d,
           CAST(factorial(l_linenumber) AS BIGINT) AS fact_ln,
           ROUND(cbrt(l_extendedprice), 6) AS cbrt_p,
           ROUND(pi(), 6) AS pi_v,
           ROUND(degrees(asin(l_discount)), 6) AS deg_asin,
           ROUND(atan2(l_quantity, 10.0), 6) AS at2
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: abs/sqrt/ln/log10/power/ceil/floor/mod/sign/exp/gcd/lcm/
    trig (reference: docs/docs/sql/7-scalar_functions.md:7-520).

    All inputs are identical doubles in both engines and each function is a
    single IEEE operation (or libm call) — rounded to 6 decimals to absorb
    any libm last-ulp differences.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_c"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.pow("l_quantity", 2), 6).alias("q_sq"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias(
            "price_k_floor"
        ),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        # gcd/lcm exist in DataFusion but not Spark — documented gap; the
        # factorial/cbrt pair covers the same "integer math" doc section
        F.factorial("l_linenumber").cast("bigint").alias("fact_ln"),
        F.round(F.cbrt("l_extendedprice"), 6).alias("cbrt_p"),
        F.round(F.lit(3.14159265358979), 6).alias("pi_v"),
        F.round(F.degrees(F.asin("l_discount")), 6).alias("deg_asin"),
        F.round(F.atan2(F.col("l_quantity"), F.lit(10.0)), 6).alias("at2"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(CAST(embedding[len(embedding)] AS DOUBLE), 6) AS last_elem,
           ROUND(CAST(list_sum(list_transform(embedding,
                 x -> CAST(CAST(x AS VARCHAR) AS DECIMAL(18,9))))
                 AS DOUBLE), 6) AS vec_sum,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vec_min,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           len(array_slice(embedding, 1, 8)) AS head_len
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface scalarized: element_at/slice/filter/aggregate lambdas
    (reference: docs/docs/sql/7-scalar_functions.md:2510-3984).

    The elementwise sum runs in decimal in BOTH engines so accumulation
    order can't change the result (float32 inputs are exact in decimal).
    """
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at(emb, -1).cast("double"), 6).alias("last_elem"),
        F.round(
            F.aggregate(
                emb,
                F.lit(0).cast("decimal(18,9)"),
                # float -> string -> decimal: engines disagree on direct
                # float->decimal (shortest-repr vs exact binary expansion),
                # but shortest-repr strings are identical everywhere; the
                # re-cast after + keeps the accumulator type fixed
                lambda acc, x: (
                    acc + x.cast("string").cast("decimal(18,9)")
                ).cast("decimal(18,9)"),
            ).cast("double"),
            6,
        ).alias("vec_sum"),
        F.round(F.array_max(emb).cast("double"), 6).alias("vec_max"),
        F.round(F.array_min(emb).cast("double"), 6).alias("vec_min"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.size(F.slice(emb, 1, 8)).alias("head_len"),
    ).orderBy("vec_id")


@query(
    "array_construct_unnest",
    oracle="""
    WITH t AS (
      SELECT r_regionkey, r_name,
             string_split(r_name, ' ') AS words
      FROM region
    )
    SELECT r_regionkey, r_name, w.word AS word
    FROM t, LATERAL unnest(t.words) AS w(word)
    ORDER BY r_regionkey, word
    """,
)
def array_construct_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split -> unnest/explode (reference: docs/docs/sql/8-special_functions.md:12)."""
    r = load(spark, sf_dir, "region")
    return (
        r.select(
            "r_regionkey",
            "r_name",
            F.explode(F.split("r_name", " ")).alias("word"),
        )
        .orderBy("r_regionkey", "word")
    )


@query(
    "struct_map_access",
    oracle="""
    SELECT n_nationkey,
           struct_extract({'name': n_name, 'region': n_regionkey}, 'name')
             AS s_name,
           struct_extract({'name': n_name, 'region': n_regionkey}, 'region')
             AS s_region,
           map_extract(map(['a','b'], [n_nationkey, n_regionkey]), 'b')[1]
             AS m_b,
           CAST(cardinality(map(['a','b'], [n_nationkey, n_regionkey]))
             AS INTEGER) AS m_card
    FROM nation
    ORDER BY n_nationkey
    """,
)
def struct_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named_struct / map construction + field access, scalarized
    (reference: docs/docs/sql/7-scalar_functions.md:3985-4222)."""
    n = load(spark, sf_dir, "nation")
    s = F.named_struct(
        F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey")
    )
    m = F.create_map(
        F.lit("a"), F.col("n_nationkey"), F.lit("b"), F.col("n_regionkey")
    )
    return n.select(
        "n_nationkey",
        s.getField("name").alias("s_name"),
        s.getField("region").alias("s_region"),
        F.element_at(m, "b").alias("m_b"),
        F.size(m).alias("m_card"),
    ).orderBy("n_nationkey")


@query(
    "scalar_date_bin",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts,
                                TIMESTAMP '2024-01-01 00:00:00'),
                    '%Y-%m-%d %H:%M:%S') AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    LIMIT 200
    """,
)
def scalar_date_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_bin (docs/docs/sql/7-scalar_functions.md:1979) — absent from
    Spark 4 by name, provided as exact long-microsecond arithmetic in
    arkflow_spark.functions.date_bin; oracled against DuckDB time_bucket.

    Scale notes: the bin is a deterministic narrow expression (no UDF, no
    shuffle); the groupBy aggregates map-side into ~96 buckets/day.
    """
    from arkflow_spark.functions import date_bin

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(
                date_bin("15m", F.col("ts"), "2024-01-01 00:00:00"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("bucket")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
        .limit(200)
    )
