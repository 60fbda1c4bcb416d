"""YAML/JSON pipeline configuration -> typed stream configs.

Mirrors the reference's EngineConfig shape (crates/arkflow-core/src/
config.rs:97-129): a list of streams, each with input / optional buffer /
pipeline.processors / output / optional error_output / optional temporaries.

Example (same shape as examples/generate_example.yaml in the reference):

    streams:
      - input:
          type: generate
          context: '{"sensor":"t1","value":10}'
          interval: 10ms
          batch_size: 100
        pipeline:
          processors:
            - type: json_to_arrow
            - type: sql
              query: "SELECT sensor, sum(value) AS v FROM flow GROUP BY sensor"
        output:
          type: stdout
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import yaml


_DURABILITY_SYNC_MODES = ("per_entry", "group_commit", "periodic")


@dataclass
class StreamConfig:
    input: dict
    output: dict
    processors: list[dict] = field(default_factory=list)
    buffer: dict | None = None
    error_output: dict | None = None
    temporaries: list[dict] = field(default_factory=list)
    name: str | None = None
    # reference `durability:` block (examples/durability_example.yaml:
    # enabled / path / sync). In the Spark engine the WAL role is played
    # by Structured Streaming's checkpoint log: offsets are committed
    # only after foreachBatch returns (write confirmed), so a crash
    # between read and output replays the batch — the reference's
    # at-least-once contract. `path` overrides the checkpoint location;
    # `sync` is validated for config parity (Spark's checkpoint commit
    # batches per micro-batch ~= group_commit; the per_entry/periodic
    # distinction has no finer-grained Spark equivalent and is recorded,
    # not emulated).
    durability: dict | None = None

    def __post_init__(self):
        if self.durability:
            sync = self.durability.get("sync", "group_commit")
            if sync not in _DURABILITY_SYNC_MODES:
                raise ValueError(
                    f"durability.sync must be one of "
                    f"{_DURABILITY_SYNC_MODES}, got {sync!r}"
                )

    @property
    def durability_path(self) -> str | None:
        if self.durability and self.durability.get("enabled"):
            return self.durability.get("path")
        return None


@dataclass
class EngineConfig:
    streams: list[StreamConfig]

    @classmethod
    def from_dict(cls, raw: dict) -> "EngineConfig":
        streams = []
        for i, s in enumerate(raw.get("streams", [])):
            pipeline = s.get("pipeline", {}) or {}
            streams.append(
                StreamConfig(
                    input=s["input"],
                    output=s["output"],
                    processors=list(pipeline.get("processors", []) or []),
                    buffer=s.get("buffer"),
                    error_output=s.get("error_output"),
                    temporaries=list(s.get("temporary", []) or []),
                    name=s.get("name", f"stream_{i}"),
                    durability=s.get("durability"),
                )
            )
        if not streams:
            raise ValueError("config has no streams")
        # enabled durability paths must be unique across streams: two
        # streams sharing one Structured Streaming checkpoint location
        # corrupt each other's offset logs (the default per-stream
        # {checkpoint_root}/{i}_{name} paths are always unique)
        seen: dict[str, str] = {}
        for s in streams:
            p = s.durability_path
            if not p:
                continue
            if p in seen:
                raise ValueError(
                    f"streams {seen[p]!r} and {s.name!r} share "
                    f"durability.path {p!r}; checkpoint locations must "
                    "be unique per stream"
                )
            seen[p] = s.name or ""
        return cls(streams=streams)

    @classmethod
    def from_file(cls, path: str | Path) -> "EngineConfig":
        text = Path(path).read_text()
        if str(path).endswith(".json"):
            return cls.from_dict(json.loads(text))
        return cls.from_dict(yaml.safe_load(text))


def parse_duration_ms(s: str | int | float) -> int:
    """'10ms' / '1s' / '500us' / '2m' -> milliseconds (reference uses
    humantime durations in configs)."""
    if isinstance(s, (int, float)):
        return int(s)
    s = s.strip().lower()
    for suffix, mult in (
        ("ms", 1),
        ("us", 0.001),
        ("s", 1000),
        ("m", 60_000),
        ("h", 3_600_000),
    ):
        if s.endswith(suffix) and s[: -len(suffix)].replace(".", "").isdigit():
            return int(float(s[: -len(suffix)]) * mult)
    return int(float(s))
