"""Remaining scalar-function coverage: binary encodings, string utilities,
regexp_count, number formatting.

Parity targets: docs/docs/sql/7-scalar_functions.md — binary encode/decode
(:1726), overlay (:1263), substr_index (:1582), find_in_set (:1025),
regexp_count (:1765), to_char (:2182).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.queries.base import query
from arkflow_spark.tables import load


@query(
    "scalar_binary_encode",
    oracle="""
    SELECT r_regionkey,
           base64(encode(r_name)) AS b64,
           hex(encode(r_name)) AS hx,
           CAST(decode(from_base64(base64(encode(r_name)))) AS VARCHAR)
             AS roundtrip,
           octet_length(encode(r_name)) AS n_bytes
    FROM region
    ORDER BY r_regionkey
    """,
)
def scalar_binary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64/hex encode-decode round trips
    (reference: docs/docs/sql/7-scalar_functions.md:1726)."""
    r = load(spark, sf_dir, "region")
    b = F.encode("r_name", "utf-8")
    return r.select(
        "r_regionkey",
        F.base64(b).alias("b64"),
        F.hex(b).alias("hx"),
        F.decode(F.unbase64(F.base64(b)), "utf-8").alias("roundtrip"),
        F.octet_length("r_name").alias("n_bytes"),
    ).orderBy("r_regionkey")


@query(
    "scalar_string_utils",
    oracle="""
    SELECT p_partkey,
           -- overlay: replace chars 3..5 with 'XX' (DuckDB lacks overlay;
           -- composed from substr, which is the same definition)
           substr(p_brand, 1, 2) || 'XX' || substr(p_brand, 5) AS overlaid,
           split_part(p_type, ' ', 1) AS first_word,
           split_part(p_type, ' ', -1) AS last_word,
           CASE WHEN strpos(',' || 'ASIA,EUROPE,AMERICA' || ',',
                            ',' || p_brand || ',') > 0 THEN 1 ELSE 0 END
             AS fis_dummy,
           len(string_split(p_name, ' ')) AS n_words,
           regexp_extract(p_name, '^(\\w+)', 1) AS head_word,
           length(regexp_replace(p_name, '[^o]', '', 'g')) AS n_o
    FROM part
    WHERE p_partkey <= 300
    ORDER BY p_partkey
    """,
)
def scalar_string_utils(spark: SparkSession, sf_dir: str) -> DataFrame:
    """overlay / substring_index / split_part / regexp_count-equivalent
    (reference: 7-scalar_functions.md:1263,1582,1025,1765).

    regexp_count is expressed as length-of-filtered both sides because
    DuckDB 1.0 lacks regexp_count; Spark-side uses the native function
    surface where it exists."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.overlay("p_brand", F.lit("XX"), F.lit(3), F.lit(2)).alias("overlaid"),
        F.substring_index("p_type", " ", 1).alias("first_word"),
        F.substring_index("p_type", " ", -1).alias("last_word"),
        F.when(
            F.instr(
                F.concat(F.lit(","), F.lit("ASIA,EUROPE,AMERICA"), F.lit(",")),
                F.concat(F.lit(","), F.col("p_brand"), F.lit(",")),
            )
            > 0,
            1,
        )
        .otherwise(0)
        .alias("fis_dummy"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("head_word"),
        F.length(F.regexp_replace("p_name", "[^o]", "")).alias("n_o"),
    ).orderBy("p_partkey")


@query(
    "scalar_format_number",
    oracle="""
    SELECT o_orderkey,
           printf('%.2f', o_totalprice) AS price_str,
           printf('%08d', o_orderkey) AS key_padded,
           CAST(round(o_totalprice, 0) AS BIGINT) AS price_rounded,
           CAST(floor(o_totalprice) AS INTEGER) AS price_int_cast
    FROM orders
    WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
)
def scalar_format_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number formatting (to_char family, 7-scalar_functions.md:2182) via
    printf-style format_string — identical rendering semantics both engines
    (IEEE doubles formatted with %.2f round half-even in C printf)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.format_string("%.2f", "o_totalprice").alias("price_str"),
        F.format_string("%08d", "o_orderkey").alias("key_padded"),
        F.round("o_totalprice", 0).cast("bigint").alias("price_rounded"),
        # explicit floor: bare double->int casts disagree across engines
        F.floor("o_totalprice").cast("int").alias("price_int_cast"),
    ).orderBy("o_orderkey")


@query(
    "scalar_lambda_higher_order",
    oracle="""
    WITH a AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 100 + 0.5) AS INTEGER))
               AS ints
      FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id,
           list_transform(ints, x -> x * 2)[1] AS first_doubled,
           len(list_filter(ints, x -> x > 0)) AS n_positive,
           len(list_filter(ints, x -> x % 2 = 0)) > 0 AS any_even,
           len(list_filter(ints, x -> abs(x) > 500)) = 0
             AS all_within_500,
           list_reduce(ints, (acc, x) -> acc + x) AS total,
           list_reduce(
             list_transform(list_zip(ints, list_reverse(ints)),
                            p -> p[1] * p[2]),
             (acc, x) -> acc + x) AS rev_dot
    FROM a
    ORDER BY vec_id
    """,
)
def scalar_lambda_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas — transform / filter / exists / forall /
    aggregate / zip_with — the Spark-side superset of the reference's
    array-function table (docs/docs/sql/7-scalar_functions.md:2510-3984
    lists ~45 concrete functions; lambdas compose them all). Verified
    against DuckDB's list_transform/list_filter/list_reduce/list_zip on
    integer-quantized vectors (exact arithmetic, no float drift).
    """
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    ints = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 100 + 0.5).cast("int"),
    )
    a = e.select("vec_id", ints.alias("ints"))
    return a.select(
        "vec_id",
        F.element_at(F.transform("ints", lambda x: x * 2), 1).alias(
            "first_doubled"
        ),
        F.size(F.filter("ints", lambda x: x > 0)).alias("n_positive"),
        F.exists("ints", lambda x: x % 2 == 0).alias("any_even"),
        F.forall("ints", lambda x: F.abs(x) <= 500).alias(
            "all_within_500"
        ),
        F.aggregate(
            "ints", F.lit(0), lambda acc, x: acc + x
        ).alias("total"),
        F.aggregate(
            F.zip_with(
                "ints",
                F.reverse("ints"),
                lambda x, y: x * y,
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("rev_dot"),
    ).orderBy("vec_id")


@query(
    "scalar_bitwise_ops",
    oracle="""
    SELECT l_orderkey, l_partkey,
           l_orderkey & l_partkey AS band,
           l_orderkey | l_partkey AS bor,
           xor(l_orderkey, l_partkey) AS bxor,
           ~l_orderkey AS bnot,
           l_linenumber << 3 AS shl,
           l_partkey >> 2 AS shr,
           CAST(bit_count(l_partkey) AS INTEGER) AS popcnt
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_partkey, l_linenumber
    """,
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (&, |, xor, ~, shifts, popcount) — the
    DataFusion bit-manipulation functions
    (reference: docs/docs/sql/2-operators.md bitwise section) as pure
    whole-stage-codegen projections with the key-range filter pushed to
    the scan. DuckDB spells xor as a function and Spark as `^`; popcount
    widths are pinned to INTEGER on both sides.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_partkey",
        F.expr("l_orderkey & l_partkey").alias("band"),
        F.expr("l_orderkey | l_partkey").alias("bor"),
        F.expr("l_orderkey ^ l_partkey").alias("bxor"),
        F.expr("~l_orderkey").alias("bnot"),
        F.expr("shiftleft(l_linenumber, 3)").alias("shl"),
        F.expr("shiftright(l_partkey, 2)").alias("shr"),
        F.bit_count("l_partkey").cast("int").alias("popcnt"),
    ).orderBy("l_orderkey", "l_partkey", "l_linenumber")
