"""Cross-engine fuzz of the compat rewrites: where DuckDB implements the
same DataFusion-named list function natively, random inputs must produce
the same answer through Spark's translate_sql expansion.

Null-element semantics intentionally excluded: the rewrites follow
DataFusion's documented behavior, and the three engines disagree on
null-in-array edge cases; the deterministic-value cases are pinned in
test_compat_rewrites.py instead.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arkflow_spark.functions.compat import translate_sql

ints = st.lists(st.integers(min_value=-5, max_value=5), max_size=6)


def _lit(xs: list[int]) -> str:
    return "array(" + ", ".join(str(x) for x in xs) + ")" if xs else "array()"


def _duck_lit(xs: list[int]) -> str:
    if not xs:
        return "CAST([] AS INT[])"
    return "[" + ", ".join(str(x) for x in xs) + "]"


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=25, deadline=None)
@given(a=ints, b=ints, n=st.integers(min_value=0, max_value=8),
       v=st.integers(min_value=-5, max_value=5))
def test_list_rewrites_match_duckdb(spark_mod, duck_mod, a, b, n, v):
    # int lists need explicit element type for empty arrays in Spark
    sa, sb = _lit(a), _lit(b)
    if not a:
        sa = "CAST(array() AS ARRAY<INT>)"
    if not b:
        sb = "CAST(array() AS ARRAY<INT>)"
    spark_sql = translate_sql(
        f"SELECT list_contains({sa}, {v}) AS c,"
        f" list_has_all({sa}, {sb}) AS hall,"
        f" list_has_any({sa}, {sb}) AS hany,"
        f" list_resize({sa}, {n}, {v}) AS rs,"
        f" list_empty({sa}) AS e"
    )
    srow = spark_mod.sql(spark_sql).collect()[0]
    da, db = _duck_lit(a), _duck_lit(b)
    drow = duck_mod.sql(
        f"SELECT coalesce(list_contains({da}, {v}), FALSE) AS c,"
        f" list_has_all({da}, {db}) AS hall,"
        f" list_has_any({da}, {db}) AS hany,"
        f" list_resize({da}, {n}, {v}) AS rs,"
        f" len({da}) = 0 AS e"
    ).fetchone()
    assert bool(srow["c"]) == bool(drow[0]), ("contains", a, v)
    assert bool(srow["hall"]) == bool(drow[1]), ("has_all", a, b)
    assert bool(srow["hany"]) == bool(drow[2]), ("has_any", a, b)
    assert list(srow["rs"]) == list(drow[3]), ("resize", a, n, v)
    assert srow["e"] == drow[4], ("empty", a)


@settings(max_examples=25, deadline=None)
@given(
    a=st.lists(
        st.floats(
            min_value=-10, max_value=10, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=5,
    ),
    b_seed=st.integers(min_value=0, max_value=1000),
)
def test_list_distance_matches_duckdb(spark_mod, duck_mod, a, b_seed):
    b = [round(x + (b_seed % 7) - 3, 3) for x in a]
    a = [round(x, 3) for x in a]
    sa = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in a) + ")"
    sb = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in b) + ")"
    got = spark_mod.sql(
        translate_sql(f"SELECT list_distance({sa}, {sb}) AS d")
    ).collect()[0][0]
    want = duck_mod.sql(
        f"SELECT list_distance({_duck_lit_f(a)}, {_duck_lit_f(b)})"
    ).fetchone()[0]
    assert got == pytest.approx(want, rel=1e-9), (a, b)


def _duck_lit_f(xs: list[float]) -> str:
    return "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in xs) + "]"


# hypothesis can't re-enter function-scoped fixtures; bind module-level
@pytest.fixture(scope="module")
def spark_mod(spark):
    return spark


@pytest.fixture(scope="module")
def duck_mod(duck):
    return duck
