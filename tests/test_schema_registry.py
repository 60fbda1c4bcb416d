"""Schema-registry resolver + codec: fetch-by-id, per-id cache, wire e2e.

Parity target: crates/arkflow-plugin/src/codec/schema_registry.rs —
SchemaResolver trait (:36-39), per-id descriptor cache (:59-67), REST
fetch with auth + PROTOBUF-only guard (:160-190), wire-format parse
(:111-126).
"""

from __future__ import annotations

import json

import pytest

from arkflow_spark.codecs.proto_wire import encode_record, parse_proto
from arkflow_spark.codecs.schema_registry import (
    RestSchemaResolver,
    StaticSchemaResolver,
)

PROTO_V1 = """
syntax = "proto3";
message Event {
  int64 id = 1;
  string name = 2;
}
"""

PROTO_V2 = """
syntax = "proto3";
message Event {
  int64 id = 1;
  string name = 2;
  double score = 3;
}
"""


def wire(schema_id: int, payload: bytes) -> bytes:
    """Confluent framing: [0x00][4-byte BE id][payload]."""
    return bytes([0]) + schema_id.to_bytes(4, "big") + payload


def registry_codec(resolver):
    from arkflow_spark.registry import CODECS, load_all

    load_all()
    return CODECS.build(
        {"type": "schema_registry", "resolver": resolver, "message_type": "Event"}
    )


# ----------------------------------------------------------------- resolver


def test_rest_resolver_fetch_and_auth_headers():
    calls = []

    def transport(url, headers):
        calls.append((url, headers))
        return 200, json.dumps(
            {"schema": PROTO_V1, "schemaType": "PROTOBUF"}
        ).encode()

    r = RestSchemaResolver(
        "http://registry:8081/",
        auth={"type": "basic", "username": "u", "password": "p"},
        transport=transport,
    )
    assert r.fetch_schema(7) == PROTO_V1
    url, headers = calls[0]
    assert url == "http://registry:8081/schemas/ids/7"
    assert headers["Accept"] == "application/vnd.schemaregistry.v1+json"
    assert headers["Authorization"] == "Basic dTpw"  # base64("u:p")


def test_rest_resolver_bearer_and_errors():
    def transport_404(url, headers):
        return 404, b"{}"

    r = RestSchemaResolver(
        "http://r", auth={"type": "bearer", "token": "tok"}, transport=transport_404
    )
    assert r.headers["Authorization"] == "Bearer tok"
    with pytest.raises(RuntimeError, match="status 404"):
        r.fetch_schema(1)

    def transport_avro(url, headers):
        return 200, json.dumps({"schema": "{}", "schemaType": "AVRO"}).encode()

    r2 = RestSchemaResolver("http://r", transport=transport_avro)
    with pytest.raises(RuntimeError, match="only PROTOBUF"):
        r2.fetch_schema(1)

    with pytest.raises(ValueError, match="auth type"):
        RestSchemaResolver("http://r", auth={"type": "digest"})


# ---------------------------------------------------------------- codec e2e


def test_registry_decode_two_schema_ids(spark):
    """Rows framed with different schema ids decode under their own fetched
    schema; versions union by name (v1 rows get NULL for v2's column)."""
    from arkflow_spark.batch import new_binary_df

    resolver = StaticSchemaResolver({1: PROTO_V1, 2: PROTO_V2})
    codec = registry_codec(resolver)
    v1 = parse_proto(PROTO_V1)
    v2 = parse_proto(PROTO_V2)
    payloads = [
        wire(1, encode_record({"id": 10, "name": "a"}, v1)),
        wire(2, encode_record({"id": 20, "name": "b", "score": 0.5}, v2)),
        wire(1, encode_record({"id": 11, "name": "c"}, v1)),
    ]
    out = codec.decode(spark, new_binary_df(spark, payloads))
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {10, 11, 20}
    assert rows[10]["name"] == "a" and rows[10]["score"] is None
    assert rows[20]["score"] == 0.5
    assert rows[20]["__meta_schema_id__"] == 2
    # distinct ids fetched exactly once each, then served from the cache
    assert resolver.fetch_count == 2
    codec.decode(spark, new_binary_df(spark, payloads)).collect()
    assert resolver.fetch_count == 2


def test_registry_decode_unknown_id_raises(spark):
    from arkflow_spark.batch import new_binary_df

    codec = registry_codec(StaticSchemaResolver({1: PROTO_V1}))
    v1 = parse_proto(PROTO_V1)
    df = new_binary_df(spark, [wire(9, encode_record({"id": 1, "name": "x"}, v1))])
    with pytest.raises(RuntimeError, match="unknown schema id 9"):
        codec.decode(spark, df)


def test_bad_magic_byte_fails_batch(spark):
    """Reference rejects magic != 0x00 (schema_registry.rs:117-122); the
    Spark analog raises at evaluation, routing the batch to DLQ."""
    from arkflow_spark.batch import new_binary_df

    codec = registry_codec(StaticSchemaResolver({1: PROTO_V1}))
    bad = bytes([1, 0, 0, 0, 1]) + b"xx"
    with pytest.raises(Exception, match="wire-format"):
        codec.decode(spark, new_binary_df(spark, [bad])).collect()


def test_default_schema_id_pins_schema_for_empty_batches(spark):
    """Empty micro-batches (and batches missing the default id) keep the
    pinned schema's columns, so fixed-schema sinks never see drift."""
    from arkflow_spark.batch import new_binary_df
    from arkflow_spark.registry import CODECS

    codec = CODECS.build(
        {
            "type": "schema_registry",
            "resolver": StaticSchemaResolver({1: PROTO_V1, 2: PROTO_V2}),
            "message_type": "Event",
            "default_schema_id": 2,
        }
    )
    empty = new_binary_df(spark, []).limit(0)
    out = codec.decode(spark, empty)
    assert {"id", "name", "score"} <= set(out.columns)
    assert out.count() == 0
    # a v1-only batch still carries v2's `score` column (as nulls)
    v1 = parse_proto(PROTO_V1)
    df = new_binary_df(spark, [wire(1, encode_record({"id": 5, "name": "z"}, v1))])
    rows = codec.decode(spark, df).collect()
    assert rows[0]["id"] == 5 and rows[0]["score"] is None
