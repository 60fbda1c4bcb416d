"""VRL -> remap migration: one test per mapped builtin.

Mirrors the reference's VRL processor tests
(crates/arkflow-plugin/src/processor/vrl.rs:583-761: parse roundtrips,
fallible-call error surfacing, type conversion) against the
:data:`arkflow_spark.functions.compat.VRL_TO_SPARK` recipes applied
through the remap processor.
"""

from __future__ import annotations

import pytest

from arkflow_spark.functions.compat import VRL_TO_SPARK, syslog_expr, vrl_sql
from arkflow_spark.registry import PROCESSORS, load_all

load_all()


def remap(**conf):
    return PROCESSORS.build({"type": "remap", **conf})


def one(spark, ddl, row):
    return spark.createDataFrame([row], ddl)


# ----------------------------------------------------------------- parsing


def test_parse_json_bang_ok_and_fallible(spark):
    """vrl.rs:659-680: parse_json! surfaces an error on bad input."""
    expr = vrl_sql("parse_json!", x="msg", schema="a INT, b STRING")
    df = one(spark, "msg string", ('{"a": 1, "b": "x"}',))
    out = remap(fields={"data": expr}).process(spark, df).collect()[0]
    assert out["data"]["a"] == 1 and out["data"]["b"] == "x"

    bad = one(spark, "msg string", ("not json",))
    with pytest.raises(Exception, match="(?i)malformed"):
        remap(fields={"data": expr}).process(spark, bad).collect()

    # infallible variant: null-filled struct instead of error (permissive)
    soft = vrl_sql("parse_json", x="msg", schema="a INT")
    got = remap(fields={"data": soft}).process(spark, bad).collect()[0]["data"]
    assert got is None or got["a"] is None


def test_parse_timestamp_bang(spark):
    expr = vrl_sql("parse_timestamp!", x="s", fmt="dd/MM/yyyy:HH:mm:ss")
    df = one(spark, "s string", ("10/08/2026:17:15:00",))
    got = remap(fields={"ts": expr}).process(spark, df).collect()[0]["ts"]
    assert (got.year, got.month, got.day, got.hour) == (2026, 8, 10, 17)
    with pytest.raises(Exception, match="parse_timestamp failed"):
        remap(fields={"ts": expr}).process(
            spark, one(spark, "s string", ("nope",))
        ).collect()


def test_parse_syslog_bang(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[1234]: 'su root' failed on /dev/pts/8"
    df = one(spark, "line string", (line,))
    got = remap(fields={"log": syslog_expr("line")}).process(spark, df).collect()[0][
        "log"
    ]
    assert got["facility"] == 4 and got["severity"] == 2  # PRI 34 = auth.crit
    assert got["hostname"] == "mymachine"
    assert got["appname"] == "su" and got["procid"] == 1234
    assert got["message"] == "'su root' failed on /dev/pts/8"
    with pytest.raises(Exception, match="parse_syslog failed"):
        remap(fields={"log": syslog_expr("line")}).process(
            spark, one(spark, "line string", ("not syslog",))
        ).collect()


# ------------------------------------------------------------- conversions


def test_to_int_bang_and_soft(spark):
    expr = vrl_sql("to_int!", x="s")
    df = one(spark, "s string", ("42",))
    assert remap(fields={"n": expr}).process(spark, df).collect()[0]["n"] == 42
    with pytest.raises(Exception, match="to_int failed"):
        remap(fields={"n": expr}).process(
            spark, one(spark, "s string", ("4x",))
        ).collect()
    soft = vrl_sql("to_int", x="s")
    assert (
        remap(fields={"n": soft})
        .process(spark, one(spark, "s string", ("4x",)))
        .collect()[0]["n"]
        is None
    )


def test_to_float_and_to_string(spark):
    df = one(spark, "s string, n int", ("2.5", 7))
    out = remap(
        fields={
            "f": vrl_sql("to_float!", x="s"),
            "t": vrl_sql("to_string", x="n"),
        }
    ).process(spark, df).collect()[0]
    assert out["f"] == 2.5 and out["t"] == "7"


# -------------------------------------------------------- del / abort / route


def test_del_drops_field(spark):
    """VRL del(.secret) -> drop list."""
    df = one(spark, "a int, secret string", (1, "hide"))
    out = remap(drop=["secret"]).process(spark, df)
    assert out.columns == ["a"]


def test_abort_drops_rows_where(spark):
    """VRL `if cond { abort }` -> `where: NOT cond` keep-filter."""
    df = spark.createDataFrame(
        [("debug", 1), ("error", 2), ("info", 3)], "level string, n int"
    )
    out = remap(
        fields={"level": vrl_sql("upcase", x="level")},
        where="level != 'DEBUG'",
    ).process(spark, df)
    assert sorted(r["level"] for r in out.collect()) == ["ERROR", "INFO"]


def test_route_splits_streams(spark):
    """Route = complementary `where` filters over the same remap."""
    df = spark.createDataFrame([(1,), (20,), (3,)], "n int")
    hot = remap(where="n >= 10").process(spark, df)
    cold = remap(where="n < 10").process(spark, df)
    assert [r["n"] for r in hot.collect()] == [20]
    assert sorted(r["n"] for r in cold.collect()) == [1, 3]


# ----------------------------------------------------- string/time builtins


def test_string_and_time_builtins(spark):
    df = one(spark, "s string, arr array<string>", (" Hello,World ", ["a", "b"]))
    out = remap(
        fields={
            "up": vrl_sql("upcase", x="s"),
            "down": vrl_sql("downcase", x="s"),
            "trimmed": vrl_sql("strip_whitespace", x="s"),
            "hashed": vrl_sql("md5", x="s"),
            "sha": vrl_sql("sha2", x="s"),
            "repl": vrl_sql("replace", x="s", pat="World", sub="VRL"),
            "parts": vrl_sql("split", x="trimmed", pat=","),
            "joined": vrl_sql("join!", x="arr", sep="-"),
            "sliced": vrl_sql("slice!", x="trimmed", start="1", len="5"),
            "has": vrl_sql("contains", x="s", substr="World"),
            "sw": vrl_sql("starts_with", x="trimmed", prefix="Hello"),
            "ex": vrl_sql("exists", x="s"),
            "nullish": vrl_sql("is_nullish", x="s"),
            "n": vrl_sql("length", x="s"),
        }
    ).process(spark, df).collect()[0]
    assert out["up"] == " HELLO,WORLD "
    assert out["down"] == " hello,world "
    assert out["trimmed"] == "Hello,World"
    assert len(out["hashed"]) == 32 and len(out["sha"]) == 64
    assert out["repl"] == " Hello,VRL "
    assert out["parts"] == ["Hello", "World"]
    assert out["joined"] == "a-b"
    assert out["sliced"] == "Hello"
    assert out["has"] is True and out["sw"] is True
    assert out["ex"] is True and out["nullish"] is False
    assert out["n"] == 13


def test_now_and_unix_timestamp(spark):
    df = one(spark, "ts timestamp", (__import__("datetime").datetime(2026, 1, 1),))
    out = remap(
        fields={
            "wall": VRL_TO_SPARK["now"],
            "epoch": vrl_sql("to_unix_timestamp", x="ts"),
            "fmt": vrl_sql("format_timestamp!", x="ts", fmt="yyyy-MM-dd"),
        }
    ).process(spark, df).collect()[0]
    assert out["wall"] is not None
    assert out["fmt"] == "2026-01-01"
    assert out["epoch"] > 0


def test_merge_maps(spark):
    df = one(spark, "x string, y string", ('{"a":"1"}', '{"b":"2"}'))
    out = remap(fields={"m": vrl_sql("merge", x="x", y="y")}).process(
        spark, df
    ).collect()[0]
    import json

    assert json.loads(out["m"]) == {"a": "1", "b": "2"}


def test_fallible_vrl_raise_routes_to_dlq(spark):
    """A fallible-`!` recipe raising at evaluation diverts the raw batch to
    error_output — the engine-level analog of VRL's abort-on-error
    (reference vrl.rs:659-680: failed parse surfaces an error; the stream
    stays alive and the batch dead-letters)."""
    import textwrap

    from tests.test_engine import make_engine

    eng = make_engine(
        spark,
        textwrap.dedent(
            """
            streams:
              - input:
                  type: memory
                  messages: ['{"port": "not-a-number"}']
                pipeline:
                  processors:
                    - type: json_to_arrow
                      schema: "port string"
                    - type: remap
                      fields:
                        port_n: "CASE WHEN try_cast(port AS BIGINT) IS NULL
                                 THEN raise_error('to_int failed')
                                 ELSE try_cast(port AS BIGINT) END"
                output:
                  type: memory
                error_output:
                  type: memory
            """
        ),
    )
    eng.run_batch_all()
    s = eng.streams[0]
    assert s.output.batches == []  # nothing delivered downstream
    assert len(s.error_output.batches[0]) == 1  # raw row dead-lettered
