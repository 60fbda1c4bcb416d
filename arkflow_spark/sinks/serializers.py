"""Pure row -> wire-format serializers for the client sinks.

Kept free of Spark/client imports so they are unit-testable without brokers
and cheap to ship to executors inside foreachPartition closures. Each
matches the wire behavior of the corresponding reference output:

- InfluxDB line protocol (output/influxdb.rs:573 builds
  ``measurement,tag=v field=v ts``): escaping rules per the v2 spec —
  commas/spaces/equals in tags, quotes/backslashes in string fields.
- MongoDB documents (output/mongodb.rs:303 inserts one document per row):
  Spark Rows become plain dicts, recursively, so nested structs/arrays/maps
  survive.
- Topic/payload pairs for MQTT/NATS/Pulsar (output/mqtt.rs:222,
  nats.rs:233, pulsar.rs:208): payload = raw ``__value__`` bytes when
  present (the reference publishes the binary column), else the row as a
  JSON object.
"""

from __future__ import annotations

import json
import math
from datetime import date, datetime
from typing import Any, Mapping


def _esc_tag(s: str) -> str:
    return s.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")


def _esc_measurement(s: str) -> str:
    return s.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ")


def _field_value(v: Any) -> str | None:
    """Format one field per the line-protocol type rules; None = skip."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"{v}i"
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None  # line protocol has no NaN/Inf — drop the field
        return repr(v)
    s = v if isinstance(v, str) else str(v)
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def to_influx_line(
    row: Mapping[str, Any],
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    ts_col: str | None = None,
) -> str | None:
    """One data point in InfluxDB v2 line protocol; None if no usable field
    (a point without fields is a protocol error, so we drop it)."""
    parts = [_esc_measurement(measurement)]
    for t in tag_cols:
        v = row[t]
        if v is not None:
            parts.append(f"{_esc_tag(t)}={_esc_tag(str(v))}")
    fields = []
    for f in field_cols:
        fv = _field_value(row[f])
        if fv is not None:
            fields.append(f"{_esc_tag(f)}={fv}")
    if not fields:
        return None
    line = ",".join(parts) + " " + ",".join(fields)
    if ts_col is not None and row[ts_col] is not None:
        ts = row[ts_col]
        if isinstance(ts, datetime):
            ns = int(ts.timestamp() * 1_000_000) * 1000
        else:
            ns = int(ts)
        line += f" {ns}"
    return line


def row_to_doc(v: Any) -> Any:
    """Recursively convert a Spark Row / container into JSON-able builtins
    (datetimes kept as datetime — Mongo drivers store them natively)."""
    if hasattr(v, "asDict"):  # pyspark.sql.Row
        return {k: row_to_doc(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: row_to_doc(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [row_to_doc(x) for x in v]
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _json_default(v: Any) -> Any:
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    raise TypeError(f"unserializable {type(v)}")


def to_payload(row: Mapping[str, Any], value_col: str = "__value__") -> bytes:
    """Publishable payload: raw binary column when present (reference
    convention: publish ``__value__`` verbatim), else the row as JSON."""
    try:
        v = row[value_col]
    except (KeyError, ValueError):
        v = None
    if v is not None:
        return bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
    doc = {
        k: row_to_doc(v)
        for k, v in row.asDict().items()
    } if hasattr(row, "asDict") else dict(row)
    doc.pop(value_col, None)
    return json.dumps(
        {k: v for k, v in doc.items() if not k.startswith("__meta_")},
        default=_json_default,
        sort_keys=True,
    ).encode()
