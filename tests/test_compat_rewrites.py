"""Every DataFusion function name the reference documents must execute
through translate_sql on Spark with DataFusion's semantics. Pure renames
are covered by test_engine.test_translate_sql; this file drives the
STRUCTURAL rewrites (REWRITE_TEMPLATES) end-to-end and pins their values.

Expected values follow the reference's function docs
(docs/docs/sql/7-scalar_functions.md array/json sections): array_remove /
array_replace act on the FIRST occurrence, *_all variants on every
occurrence, json_get_* take a key (not a JSONPath), date_bin floors
pre-origin timestamps.
"""

from __future__ import annotations

import pytest

from arkflow_spark.functions.compat import translate_sql

CASES = [
    # expression, expected (as Python value after .collect()[0][0])
    ("empty(array(1, 2))", False),
    ("array_empty(array())", True),
    ("list_empty(array(1))", False),
    ("array_any_value(array(NULL, 7, 3))", 7),
    ("list_any_value(array(CAST(NULL AS INT)))", None),
    ("array_has_all(array(1, 2, 3), array(2, 3))", True),
    ("list_has_all(array(1, 2), array(2, 9))", False),
    ("array_has_any(array(1, 2), array(9, 2))", True),
    ("list_has_any(array(1, 2), array(8, 9))", False),
    ("array_pop_back(array(1, 2, 3))", [1, 2]),
    # reference :3280 array_remove_n / :3382 array_replace_n examples
    ("array_remove_n(array(1, 2, 2, 3, 2, 1, 4), 2, 2)", [1, 3, 2, 1, 4]),
    ("list_remove_n(array(1, 2, 2), 2, 5)", [1]),
    (
        "array_replace_n(array(1, 2, 2, 3, 2, 1, 4), 2, 9, 2)",
        [1, 9, 9, 3, 2, 1, 4],
    ),
    ("list_replace_n(array('a', 'b', 'a'), 'a', 'z', 1)", ["z", "b", "a"]),
    ("list_pop_back(array(1))", []),
    ("array_pop_front(array(1, 2, 3))", [2, 3]),
    ("list_pop_front(array(1))", []),
    ("array_positions(array(1, 2, 1, 2), 2)", [2, 4]),
    ("list_positions(array(1, 2), 9)", []),
    # first-occurrence remove vs remove_all
    ("array_remove(array(1, 2, 1, 2), 1)", [2, 1, 2]),
    ("list_remove(array(1, 2), 9)", [1, 2]),
    ("array_remove_all(array(1, 2, 1, 2), 1)", [2, 2]),
    ("list_remove_all(array(1, 1), 1)", []),
    # first-occurrence replace vs replace_all
    ("array_replace(array(1, 2, 1), 1, 9)", [9, 2, 1]),
    ("list_replace(array(1, 2), 5, 9)", [1, 2]),
    ("array_replace_all(array(1, 2, 1), 1, 9)", [9, 2, 9]),
    ("array_resize(array(1, 2, 3), 2, 0)", [1, 2]),
    ("list_resize(array(1), 3, 7)", [1, 7, 7]),
    ("array_dims(array(1, 2, 3))", [3]),
    ("array_distance(array(0, 0), array(3, 4))", 5.0),
    ("list_distance(array(1.0, 1.0), array(1.0, 1.0))", 0.0),
    ("get_field(named_struct('a', 1, 'b', 2), 'b')", 2),
    ("map_extract(map('k', 42), 'k')", [42]),
    ("map_extract(map('k', 42), 'missing')", [None]),
    ("sha256('abc')",
     "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"),
    ("iszero(0.0)", True),
    ("iszero(1.5)", False),
    ("to_timestamp_nanos(1000000000)", None),  # value checked separately
    ("json_get('{\"a\": 3}', 'a')", "3"),
    ("json_get_int('{\"a\": 3}', 'a')", 3),
    ("json_get_float('{\"a\": 2.5}', 'a')", 2.5),
    ("json_get_bool('{\"a\": true}', 'a')", True),
    ("json_get_json('{\"a\": {\"b\": 1}}', 'a')", '{"b":1}'),
    ("json_contains('{\"a\": 1}', 'a')", True),
    ("json_contains('{\"a\": 1}', 'z')", False),
    # pure renames added alongside the rewrites
    ("list_contains(array(1, 2), 2)", True),
    ("list_max(array(3, 9, 1))", 9),
    ("make_list(1, 2)", [1, 2]),
    ("string_to_list('a,b', ',')", ["a", "b"]),
    ("datetrunc('year', timestamp '2024-05-05 10:00:00')", None),
    ("var_population(x)", None),  # aggregate: executed in its own test
]


@pytest.mark.parametrize("expr,expected", [
    (e, x) for e, x in CASES
    if x is not None or e.startswith(("list_any_value", "map_extract"))
])
def test_rewrite_executes_with_datafusion_semantics(spark, expr, expected):
    got = spark.sql(translate_sql(f"SELECT {expr} AS r")).collect()[0][0]
    if expected == [None]:
        assert list(got) == [None]
    else:
        assert got == expected, (expr, translate_sql(f"SELECT {expr}"))


def test_to_timestamp_nanos_truncates_to_micros(spark):
    got = spark.sql(
        translate_sql("SELECT to_timestamp_nanos(1500) AS r")
    ).collect()[0][0]
    assert got.microsecond == 1  # 1500 ns -> 1 us


def test_datetrunc_rename(spark):
    got = spark.sql(
        translate_sql(
            "SELECT datetrunc('year', timestamp '2024-05-05 10:00:00') AS r"
        )
    ).collect()[0][0]
    assert (got.year, got.month, got.day) == (2024, 1, 1)


def test_var_family_renames(spark):
    row = spark.sql(
        translate_sql(
            "SELECT var(x) AS v, var_population(x) AS vp,"
            " var_sample(x) AS vs, covar(x, x) AS c"
            " FROM VALUES (1.0), (2.0), (3.0) AS t(x)"
        )
    ).collect()[0]
    assert row["v"] == pytest.approx(1.0)
    assert row["vp"] == pytest.approx(2.0 / 3.0)
    assert row["vs"] == pytest.approx(1.0)
    assert row["c"] == pytest.approx(1.0)


def test_row_constructor_rename(spark):
    got = spark.sql(translate_sql("SELECT row(1, 'x') AS r")).collect()[0][0]
    assert tuple(got) == (1, "x")


def test_date_bin_two_and_three_arg_floor_semantics(spark):
    q = translate_sql(
        "SELECT date_bin(INTERVAL '15' MINUTE,"
        " timestamp '2024-01-01 00:37:12') AS b2,"
        " date_bin(INTERVAL '15' MINUTE, timestamp '2024-01-01 00:37:12',"
        " timestamp '2024-01-01 00:05:00') AS b3,"
        " date_bin(INTERVAL '1' HOUR, timestamp '1969-12-31 23:10:00') AS pre"
    )
    row = spark.sql(q).collect()[0]
    assert str(row["b2"]) == "2024-01-01 00:30:00"
    assert str(row["b3"]) == "2024-01-01 00:35:00"
    # pre-origin timestamps floor DOWN (pmod), never round toward zero
    assert str(row["pre"]) == "1969-12-31 23:00:00"


def test_nested_rewrites_reach_fixpoint(spark):
    got = spark.sql(
        translate_sql(
            "SELECT array_pop_back(array_remove(array(1, 2, 1, 3), 1)) AS r"
        )
    ).collect()[0][0]
    assert got == [2, 1]


def test_rewrite_arity_mismatch_raises():
    with pytest.raises(ValueError, match="argument"):
        translate_sql("SELECT array_has_all(a) FROM flow")


def test_rewrite_preserves_string_literals():
    q = translate_sql("SELECT 'array_empty(' AS s FROM flow")
    assert "'array_empty('" in q


def test_every_documented_function_resolves(spark):
    """Sweep the reference's scalar+aggregate function inventory: every
    name must be a Spark builtin, a FUNCTION_ALIASES rename, a
    REWRITE_TEMPLATES expansion, or on the documented-unmapped list."""
    import re
    from pathlib import Path

    from arkflow_spark.functions.compat import (
        FUNCTION_ALIASES,
        REWRITE_TEMPLATES,
    )

    docs = Path("/root/reference/docs/docs/sql")
    if not docs.exists():
        pytest.skip("reference docs not present")
    names = set()
    for f in ("7-scalar_functions.md", "5-aggregate_functions.md"):
        names |= set(
            re.findall(r"^### `([a-z_0-9]+)`", (docs / f).read_text(), re.M)
        )
    registered = {
        r.function.split(".")[-1].lower()
        for r in spark.sql("SHOW FUNCTIONS").collect()
    }
    DOCUMENTED_UNMAPPED = {
        # no faithful Spark expression; see compat.py comment block
        "union_extract",
        "approx_percentile_cont_with_weight",
        # no Spark builtin: vectorized pandas UDFs in queries/udf_q.py
        "gcd", "lcm",
    }
    unresolved = {
        n
        for n in names
        if n not in registered
        and n not in FUNCTION_ALIASES
        and n not in REWRITE_TEMPLATES
        and n not in DOCUMENTED_UNMAPPED
    }
    assert unresolved == set(), sorted(unresolved)


# ----------------------------------------------------------------- QUALIFY


def test_qualify_plain_predicate(spark):
    """Alias-referencing QUALIFY becomes a subquery + WHERE."""
    spark.createDataFrame(
        [("a", 3), ("b", 2), ("c", 1), ("a", 1)], "k string, v int"
    ).createOrReplaceTempView("qt")
    got = spark.sql(
        translate_sql(
            "SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v)"
            " AS rnk FROM qt QUALIFY rnk = 1 ORDER BY k"
        )
    ).collect()
    assert [(r["k"], r["v"]) for r in got] == [("a", 1), ("b", 2), ("c", 1)]


def test_qualify_inline_window_predicate(spark):
    """Inline-window QUALIFY lifts the predicate into the select list and
    drops it with SELECT * EXCEPT; works over GROUP BY output."""
    spark.createDataFrame(
        [("a", 3), ("b", 2), ("c", 1), ("a", 1)], "k string, v int"
    ).createOrReplaceTempView("qt")
    df = spark.sql(
        translate_sql(
            "SELECT k, sum(v) AS n FROM qt GROUP BY k"
            " QUALIFY row_number() OVER (ORDER BY sum(v) DESC, k) <= 2"
            " ORDER BY n DESC"
        )
    )
    assert df.columns == ["k", "n"]  # synthetic __qualify dropped
    assert [tuple(r) for r in df.collect()] == [("a", 4), ("b", 2)]


def test_qualify_with_cte_and_limit(spark):
    got = spark.sql(
        translate_sql(
            "WITH c AS (SELECT explode(sequence(1, 5)) AS x)"
            " SELECT x, sum(x) OVER () AS s FROM c QUALIFY x > 2"
            " ORDER BY x LIMIT 2"
        )
    ).collect()
    assert [tuple(r) for r in got] == [(3, 15), (4, 15)]


def test_qualify_untouched_when_absent():
    sql = "SELECT a FROM t WHERE a > 0"
    assert translate_sql(sql) == sql


# ------------------------------------------- Postgres-style operators


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        # regex match family (reference docs/docs/sql/1-operators.md)
        ("'datafusion' ~ '^datafusion(-cli)*'", True),
        ("'datafusion' ~ '^DATAFUSION'", False),
        ("'DATAFUSION' ~* '^datafusion(-cli)*'", True),
        ("'datafusion' !~ '^DATAFUSION(-cli)*'", True),
        ("'DATAFUSION' !~* '^datafusion(-cli)+'", True),
        # LIKE family
        ("'datafusion' ~~ 'data%'", True),
        ("'DATAFUSION' ~~* 'data%'", True),
        ("'datafusion' !~~ 'x%'", True),
        ("'DATAFUSION' !~~* 'data%'", False),
        # bitwise xor
        ("5 # 3", 6),
        # array containment
        ("make_array(1,2,3) @> make_array(1,3)", True),
        ("make_array(1,2,3) @> make_array(1,4)", False),
        ("make_array(1,3) <@ make_array(1,2,3)", True),
        ("make_array(1,4) <@ make_array(1,2,3)", False),
    ],
)
def test_pg_operator_rewrites(spark, expr, want):
    got = spark.sql(translate_sql(f"SELECT {expr} AS r")).collect()[0]["r"]
    assert got == want, translate_sql(f"SELECT {expr} AS r")


def test_pg_operators_ignore_string_literal_content(spark):
    """Literal text containing operator glyphs must pass through."""
    got = spark.sql(
        translate_sql("SELECT 'a ~ b # c @> d' AS r")
    ).collect()[0]["r"]
    assert got == "a ~ b # c @> d"


def test_pg_operator_chain_fixpoint(spark):
    got = spark.sql(
        translate_sql(
            "SELECT ('ab' ~ 'a') AND ('cd' ~ 'c') AND ('x' !~ 'y') AS r"
        )
    ).collect()[0]["r"]
    assert got is True


# ------------------------------------------------------------ DISTINCT ON


def test_distinct_on_basic(spark):
    """One surviving row per key, chosen by the ORDER BY tie-break."""
    spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 5), ("b", 4, 50)],
        "k string, id int, v int",
    ).createOrReplaceTempView("dot")
    got = spark.sql(
        translate_sql(
            "SELECT DISTINCT ON (k) k, id, v FROM dot"
            " ORDER BY k, v DESC, id"
        )
    )
    assert got.columns == ["k", "id", "v"]  # __don_rn dropped
    assert sorted(tuple(r) for r in got.collect()) == [
        ("a", 2, 20),
        ("b", 4, 50),
    ]


def test_distinct_on_where_and_limit(spark):
    """WHERE stays inside the window subquery; ORDER BY+LIMIT re-attach
    to the outer query (ordering columns are projected)."""
    spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 5), ("c", 4, 50)],
        "k string, id int, v int",
    ).createOrReplaceTempView("dot")
    got = spark.sql(
        translate_sql(
            "SELECT DISTINCT ON (k) k, v FROM dot WHERE v > 5"
            " ORDER BY k, v DESC LIMIT 2"
        )
    ).collect()
    # b's only row has v=5, excluded by WHERE; survivors ordered by k
    assert [tuple(r) for r in got] == [("a", 20), ("c", 50)]


def test_distinct_on_multi_key_no_order(spark):
    """Multiple keys; without ORDER BY the rewrite partitions on the keys
    and any row may survive — on unique key pairs the result is exact."""
    spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 5)],
        "k string, g int, v int",
    ).createOrReplaceTempView("dot")
    got = spark.sql(
        translate_sql("SELECT DISTINCT ON (k, g) k, g, v FROM dot")
    ).collect()
    assert sorted(tuple(r) for r in got) == [
        ("a", 1, 10),
        ("a", 2, 20),
        ("b", 1, 5),
    ]


def test_distinct_on_untouched_when_absent():
    sql = "SELECT DISTINCT k FROM t ORDER BY k"
    assert translate_sql(sql) == sql
