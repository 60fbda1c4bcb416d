"""Client-library sinks: pure serializers + executor-side delivery through
a spool-dir fake client (the real brokers/clients are absent by design)."""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest

from arkflow_spark.registry import OUTPUTS, load_all
from arkflow_spark.sinks.serializers import row_to_doc, to_influx_line, to_payload
from arkflow_spark.sinks.spool import SpoolFactory, drain as _drain

load_all()


# ---------------------------------------------------------------- serializers


def test_influx_line_basic():
    row = {"host": "h1", "region": "us east", "cpu": 0.5, "n": 7, "ok": True}
    line = to_influx_line(row, "metrics", ["host", "region"], ["cpu", "n", "ok"])
    assert line == "metrics,host=h1,region=us\\ east cpu=0.5,n=7i,ok=true"


def test_influx_line_escaping_and_ts():
    row = {"tag,x": "a=b", "s": 'say "hi"\\', "ts": 1_700_000_000_000_000_000}
    line = to_influx_line(row, "m x", ["tag,x"], ["s"], "ts")
    assert line == (
        'm\\ x,tag\\,x=a\\=b s="say \\"hi\\"\\\\" 1700000000000000000'
    )


def test_influx_line_datetime_ts_and_empty_fields():
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    line = to_influx_line({"v": 1.5, "ts": ts}, "m", [], ["v"], "ts")
    assert line.endswith(" 1704067200000000000")
    assert to_influx_line({"v": None}, "m", [], ["v"]) is None  # no fields


def test_influx_nan_field_dropped():
    assert to_influx_line({"v": float("nan"), "w": 1}, "m", [], ["v", "w"]) == "m w=1i"


def test_row_to_doc_nested():
    from pyspark.sql import Row

    r = Row(a=1, b=Row(c=[1, 2], d={"k": Row(e="x")}), f=bytearray(b"\x01"))
    doc = row_to_doc(r)
    assert doc == {"a": 1, "b": {"c": [1, 2], "d": {"k": {"e": "x"}}}, "f": b"\x01"}


def test_to_payload_prefers_value_col():
    from pyspark.sql import Row

    assert to_payload(Row(__value__=bytearray(b"raw"), x=1)) == b"raw"
    out = json.loads(to_payload(Row(x=1, __meta_source="s", name="n")))
    assert out == {"name": "n", "x": 1}


# ------------------------------------------------------------------ e2e sinks


@pytest.fixture()
def spool(tmp_path):
    d = tmp_path / "spool"
    d.mkdir()
    return str(d)


def _df(spark):
    return spark.createDataFrame(
        [(1, "h1", 0.25), (2, "h2", 0.5), (3, "h1", 0.75)], "id long, host string, cpu double"
    ).coalesce(2)


def test_mongodb_sink_inserts_docs(spark, spool):
    sink = OUTPUTS.build(
        {"type": "mongodb", "database": "d", "collection": "c",
         "client_factory": SpoolFactory(spool), "batch_rows": 2}
    )
    sink.write_batch(_df(spark))
    docs = [d for ev in _drain(spool) for d in ev["args"][0]]
    assert sorted(d["id"] for d in docs) == [1, 2, 3]
    assert all(ev["kind"] == "insert_many" for ev in _drain(spool))


def test_influxdb_sink_line_protocol(spark, spool):
    sink = OUTPUTS.build(
        {"type": "influxdb", "measurement": "cpu", "tags": ["host"],
         "bucket": "b", "client_factory": SpoolFactory(spool)}
    )
    sink.write_batch(_df(spark))
    lines = [ln for ev in _drain(spool) for ln in ev["args"][0]]
    assert sorted(lines) == [
        "cpu,host=h1 id=1i,cpu=0.25",
        "cpu,host=h1 id=3i,cpu=0.75",
        "cpu,host=h2 id=2i,cpu=0.5",
    ]


def test_mqtt_sink_publishes_json(spark, spool):
    sink = OUTPUTS.build(
        {"type": "mqtt", "topic": "t/1", "client_factory": SpoolFactory(spool)}
    )
    sink.write_batch(_df(spark))
    evs = _drain(spool)
    assert len(evs) == 3 and all(e["kind"] == "publish" for e in evs)
    assert all(e["args"][0] == "t/1" for e in evs)
    payloads = sorted(json.loads(e["args"][1])["id"] for e in evs)
    assert payloads == [1, 2, 3]


def test_nats_sink_topic_field_routing(spark, spool):
    sink = OUTPUTS.build(
        {"type": "nats", "subject": "fallback", "topic_field": "host",
         "client_factory": SpoolFactory(spool)}
    )
    sink.write_batch(_df(spark))
    topics = sorted(e["args"][0] for e in _drain(spool))
    assert topics == ["h1", "h1", "h2"]


def test_redis_sink_set_mode_key_field(spark, spool):
    sink = OUTPUTS.build(
        {"type": "redis", "mode": "set", "key_prefix": "doc:", "key_field": "id",
         "client_factory": SpoolFactory(spool)}
    )
    sink.write_batch(_df(spark))
    keys = sorted(e["args"][0] for e in _drain(spool))
    assert keys == ["doc:1", "doc:2", "doc:3"]


def test_pulsar_sink_raw_value_passthrough(spark, spool):
    df = spark.createDataFrame(
        [(bytearray(b"payload-a"),), (bytearray(b"payload-b"),)],
        "__value__ binary",
    ).coalesce(1)
    sink = OUTPUTS.build(
        {"type": "pulsar", "topic": "persistent://t", "client_factory": SpoolFactory(spool)}
    )
    sink.write_batch(df)
    payloads = sorted(e["args"][1] for e in _drain(spool))
    assert payloads == ["payload-a", "payload-b"]


def test_publish_sink_topic_expr_routing(spark, spool):
    """Per-row topic as a SQL expression (reference Expr<String> topic,
    expr/mod.rs:30-60) — evaluated JVM-side, not leaked into payloads."""
    sink = OUTPUTS.build(
        {"type": "mqtt", "topic": "fallback",
         "topic_expr": "concat('m/', host, '/', CAST(id % 2 AS STRING))",
         "client_factory": SpoolFactory(spool)}
    )
    sink.write_batch(_df(spark))
    evs = _drain(spool)
    topics = sorted(e["args"][0] for e in evs)
    assert topics == ["m/h1/1", "m/h1/1", "m/h2/0"]
    payload = json.loads(evs[0]["args"][1])
    assert "__meta_topic__" not in payload  # routing column stays meta
