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


@dataclass
class StreamConfig:
    input: dict
    output: dict
    processors: list[dict] = field(default_factory=list)
    buffer: dict | None = None
    error_output: dict | None = None
    temporaries: list[dict] = field(default_factory=list)
    name: str | None = None


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
                )
            )
        if not streams:
            raise ValueError("config has no streams")
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
