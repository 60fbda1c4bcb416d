"""Spool-dir fake client for the client-library sinks.

Satisfies every client contract used by ``sinks.clients`` (``insert_many``,
``write``, ``publish``, ``set``) by appending one JSON line per call to a
unique file per partition. The delivery-side twin of
``sources/push_source.py``'s spool-dir landing zone: lets engine pipelines
and tests exercise the full executor-side sink path (serialization,
batching, partition fan-out) without any broker or client library.

Inject via ``client_factory`` in the sink conf:

    OUTPUTS.build({"type": "mqtt", "topic": "t",
                   "client_factory": SpoolFactory("/tmp/spool")})
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime


class SpoolClient:
    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        self.path = os.path.join(
            spool_dir, f"{os.getpid()}-{uuid.uuid4().hex}.jsonl"
        )

    def _emit(self, kind: str, *args) -> None:
        with open(self.path, "a") as fh:
            fh.write(
                json.dumps({"kind": kind, "args": [self._s(a) for a in args]})
                + "\n"
            )

    @staticmethod
    def _s(a):
        if isinstance(a, (bytes, bytearray)):
            return bytes(a).decode()
        return a

    @staticmethod
    def _s_doc(d: dict) -> dict:
        return {
            k: (
                bytes(v).decode()
                if isinstance(v, (bytes, bytearray))
                else str(v) if isinstance(v, datetime) else v
            )
            for k, v in d.items()
        }

    # client contracts -----------------------------------------------------
    def insert_many(self, docs) -> None:  # pymongo Collection
        self._emit("insert_many", [self._s_doc(d) for d in docs])

    def write(self, lines) -> None:  # influx write_api
        self._emit("write", list(lines))

    def publish(self, topic, payload) -> None:  # mqtt/nats/pulsar/redis-pub
        self._emit("publish", topic, payload)

    def set(self, key, payload) -> None:  # redis SET
        self._emit("set", key, payload)


class SpoolFactory:
    """Picklable zero-arg factory: one SpoolClient (= one file) per call."""

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir

    def __call__(self) -> SpoolClient:
        return SpoolClient(self.spool_dir)


def drain(spool_dir: str) -> list[dict]:
    """Read back every emitted event, across all partition files."""
    import glob

    out: list[dict] = []
    for p in sorted(glob.glob(os.path.join(spool_dir, "*.jsonl"))):
        with open(p) as fh:
            out.extend(json.loads(line) for line in fh)
    return out
