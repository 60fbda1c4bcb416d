"""VRL mini-interpreter tests, mirroring the reference's vrl.rs test
suite (crates/arkflow-plugin/src/processor/vrl.rs:583-761) plus the
lowering semantics documented in operators/vrl.py."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arkflow_spark.operators.vrl import (
    VrlCompileError,
    VrlProcessor,
    VrlProgram,
)


def _proc(statement: str, **extra) -> VrlProcessor:
    return VrlProcessor({"statement": statement, **extra})


# ------------------------- build-time parity (vrl.rs:741-747, 686-700)


def test_compile_error_rejected():
    with pytest.raises(VrlCompileError):
        _proc("this is not valid vrl !!!")


def test_scalar_result_rejected():
    # vrl.rs test_scalar_result_returns_err: a scalar cannot form a row.
    # The reference errors at runtime; we reject at compile time.
    with pytest.raises(VrlCompileError):
        _proc("1 + 1")


def test_timezone_config_accepted():
    _proc(".x = 1", timezone="Asia/Shanghai")


def test_invalid_timezone_falls_back():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _proc(".x = 1", timezone="Not/A_Real_Zone")
    assert any("falling back" in str(x.message) for x in w)


def test_unconditional_abort_rejected():
    with pytest.raises(VrlCompileError):
        _proc("abort")


def test_conditional_del_nulls_matching_rows(spark):
    # round-5: conditional del is supported by NULLing the field for
    # matching rows (a statically-typed column cannot be conditionally
    # dropped); unconditional del still drops the column.
    df = spark.createDataFrame([(1, "k"), (9, "s")], "a long, b string")
    out = _proc("if .a > 1 { del(.b) }").process(spark, df)
    assert "b" in out.columns
    got = sorted(((r["a"], r["b"]) for r in out.collect()))
    assert got == [(1, "k"), (9, None)]


def test_parse_json_without_schema_rejected():
    with pytest.raises(VrlCompileError, match="schema"):
        _proc(".m = parse_json!(.m)")


def test_undefined_variable_rejected():
    with pytest.raises(VrlCompileError, match="undefined"):
        _proc(".x = y + 1")


# ------------------------------- identity round-trips (vrl.rs:583-660)


def test_string_roundtrip_stays_utf8(spark):
    df = spark.createDataFrame([("alice",)], "name string")
    out = _proc(".").process(spark, df)
    assert out.schema["name"].dataType == T.StringType()
    assert out.collect()[0]["name"] == "alice"


def test_binary_stays_binary(spark):
    df = spark.createDataFrame(
        [(bytearray(b"\xff\xfe\xfd"),)], "data binary"
    )
    out = _proc(".").process(spark, df)
    assert out.schema["data"].dataType == T.BinaryType()
    assert bytes(out.collect()[0]["data"]) == b"\xff\xfe\xfd"


def test_integer_roundtrip(spark):
    df = spark.createDataFrame([(1,)], "n long")
    out = _proc(".").process(spark, df)
    assert out.schema["n"].dataType == T.LongType()


def test_timestamp_not_dropped(spark):
    df = spark.sql("SELECT timestamp'2021-06-30 00:53:20' AS ts")
    out = _proc(".").process(spark, df)
    assert "ts" in out.columns
    assert out.count() == 1


def test_empty_batch_passes_through(spark):
    df = spark.createDataFrame([], "name string")
    out = _proc(".").process(spark, df)
    assert out.count() == 0


# --------------------------------- runtime error path (vrl.rs:659-684)


def test_runtime_error_surfaces(spark):
    # parse_json! is fallible: bad input must raise (the engine routes
    # the raised batch to the DLQ), not silently drop.
    df = spark.createDataFrame([("not json",)], "message string")
    proc = _proc(
        ".parsed = parse_json!(.message)",
        schemas={"message": "a INT"},
    )
    out = proc.process(spark, df)
    with pytest.raises(Exception):
        out.collect()


def test_infallible_parse_yields_null(spark):
    df = spark.createDataFrame(
        [("not json",), ('{"a": 3}',)], "message string"
    )
    proc = _proc(
        ".parsed = parse_json(.message, 'a INT')",
    )
    rows = proc.process(spark, df).orderBy("message").collect()
    by_msg = {r["message"]: r["parsed"] for r in rows}
    assert by_msg['{"a": 3}']["a"] == 3
    # permissive parse null-fills on bad input instead of raising
    assert by_msg["not json"] is None or by_msg["not json"]["a"] is None


# -------------------------------------------- program semantics


def test_reference_example_statement(spark):
    # the statement from the reference's examples/vrl_example.yaml,
    # unmodified: ".v2, err = .value * 2; ."
    df = spark.createDataFrame([(10, "temp_1")], "value long, sensor string")
    out = _proc(".v2, err = .value * 2; .").process(spark, df)
    r = out.collect()[0]
    assert r["v2"] == 20 and r["sensor"] == "temp_1"


def test_assign_del_if_else(spark):
    df = spark.createDataFrame(
        [("debug", 3, "x"), ("error", 9, "y")],
        "level string, n long, tmp string",
    )
    prog = (
        '.level = upcase(string!(.level))\n'
        "del(.tmp)\n"
        "if .n > 5 { .sev = 2 } else { .sev = 1 }"
    )
    out = _proc(prog).process(spark, df)
    assert "tmp" not in out.columns
    rows = out.orderBy("n").collect()
    assert [tuple(r) for r in rows] == [("DEBUG", 3, 1), ("ERROR", 9, 2)]


def test_if_abort_routes_rows(spark):
    df = spark.createDataFrame(
        [("debug",), ("error",), (None,)], "level string"
    )
    out = _proc('if .level == "debug" { abort }').process(spark, df)
    kept = sorted(r["level"] or "" for r in out.collect())
    # NULL comparison is not TRUE -> kept (coalesce(cond, FALSE))
    assert kept == ["", "error"]


def test_err_coalesce_operator(spark):
    df = spark.createDataFrame([("7",), ("oops",)], "s string")
    out = _proc(".n = to_int!(.s) ?? 0").process(spark, df)
    assert sorted(r["n"] for r in out.collect()) == [0, 7]


def test_else_branch_keeps_old_value(spark):
    df = spark.createDataFrame([(1, 10), (9, 90)], "n long, v long")
    out = _proc("if .n > 5 { .v = 0 }").process(spark, df)
    assert sorted((r["n"], r["v"]) for r in out.collect()) == [
        (1, 10),
        (9, 0),
    ]


def test_whole_event_reshape(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": "z"}',)], "message string"
    )
    out = _proc(
        ". = parse_json!(.message)", schemas={"message": "a INT, b STRING"}
    ).process(spark, df)
    assert sorted(out.columns) == ["a", "b"]
    r = out.collect()[0]
    assert (r["a"], r["b"]) == (1, "z")


def test_locals_substitute(spark):
    df = spark.createDataFrame([(4,)], "n long")
    out = _proc("half = .n / 2\n.h2 = half * 10").process(spark, df)
    assert out.collect()[0]["h2"] == 20.0


def test_string_concat_plus(spark):
    df = spark.createDataFrame([("a",)], "s string")
    out = _proc('.t = .s + "-suffix"').process(spark, df)
    assert out.collect()[0]["t"] == "a-suffix"


def test_nested_if_else_chain(spark):
    df = spark.createDataFrame([(1,), (5,), (9,)], "n long")
    prog = (
        "if .n > 8 { .band = \"hi\" }"
        " else if .n > 3 { .band = \"mid\" }"
        " else { .band = \"lo\" }"
    )
    rows = _proc(prog).process(spark, df).orderBy("n").collect()
    assert [r["band"] for r in rows] == ["lo", "mid", "hi"]


# ----------------------------------------------------- engine e2e


def test_vrl_example_yaml_end_to_end(spark):
    """The reference's vrl_example.yaml statement runs unmodified
    through the engine (sink swapped to memory)."""
    import yaml as _y

    from arkflow_spark.config import EngineConfig
    from arkflow_spark.engine import Engine

    with open("examples/vrl_example.yaml") as f:
        conf = _y.safe_load(f)
    conf["streams"][0]["output"] = {"type": "memory"}
    eng = Engine(spark, EngineConfig.from_dict(conf))
    eng.run_batch_all()
    rows = eng.streams[0].output.batches[0]
    assert all(r["v2"] == r["value"] * 2 for r in rows)
    assert all(r["sensor"] == "temp_1" for r in rows)


# ----------------- err message materialization (vrl.rs:60-106, round-5)


def test_err_message_materialized_on_failure(spark):
    # the reference surfaces VRL error text; `t, err =` must bind err to
    # a per-row message, non-NULL exactly when the fallible call failed
    df = spark.createDataFrame([("7",), ("oops",)], "s string")
    prog = (
        '.n, err = to_int!(.s)\n'
        'if err != null { .status = "bad" } else { .status = "ok" }'
    )
    out = _proc(prog).process(spark, df)
    by_s = {r["s"]: (r["n"], r["status"]) for r in out.collect()}
    assert by_s["7"] == (7, "ok")
    assert by_s["oops"][0] is None and by_s["oops"][1] == "bad"
    # the materialized err column is internal, never an output field
    assert not [c for c in out.columns if c.startswith("__vrl_err")]


def test_err_message_text_names_function(spark):
    df = spark.createDataFrame([("oops",)], "s string")
    out = _proc('.n, err = to_int!(.s)\n.msg = err').process(spark, df)
    msg = out.collect()[0]["msg"]
    assert msg is not None and 'function call error for "to_int"' in msg


def test_err_reports_on_pre_assignment_value(spark):
    # the canonical self-overwrite: .v, err = to_int!(.v) — err must
    # reflect the ORIGINAL string, not the already-converted target
    df = spark.createDataFrame([("7",), ("oops",)], "v string")
    prog = '.v, err = to_int!(.v)\n.failed = err != null'
    out = _proc(prog).process(spark, df)
    got = {r["failed"] for r in out.collect()}
    assert got == {True, False}


def test_err_null_for_infallible_expression(spark):
    # reference example shape: arithmetic cannot fail -> err is NULL
    df = spark.createDataFrame([(10,)], "value long")
    out = _proc(".v2, err = .value * 2\n.e = err").process(spark, df)
    r = out.collect()[0]
    assert r["v2"] == 20 and r["e"] is None
