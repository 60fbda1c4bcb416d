"""The reference's stream-level `durability:` block (crash-recovery
WAL, examples/durability_example.yaml) — Spark-checkpoint twin.

The checkpoint log plays the WAL role (offsets commit only after
foreachBatch returns => at-least-once replay on crash); `path`
overrides the checkpoint location, `sync` is validated for config
parity.
"""

from __future__ import annotations

import pytest

from arkflow_spark.config import EngineConfig, StreamConfig


def _cfg(durability):
    return {
        "streams": [
            {
                "input": {
                    "type": "generate",
                    "context": '{"v": 1}',
                    "interval": "1ms",
                    "batch_size": 10,
                    "count": 50,
                },
                "durability": durability,
                "pipeline": {"processors": [{"type": "json_to_arrow"}]},
                "output": {"type": "drop"},
            }
        ]
    }


def test_durability_path_resolves_when_enabled():
    cfg = EngineConfig.from_dict(
        _cfg({"enabled": True, "path": "/tmp/wal-x", "sync": "group_commit"})
    )
    assert cfg.streams[0].durability_path == "/tmp/wal-x"


def test_durability_disabled_or_absent_is_none():
    assert (
        EngineConfig.from_dict(
            _cfg({"enabled": False, "path": "/tmp/wal-x"})
        ).streams[0].durability_path
        is None
    )
    assert (
        EngineConfig.from_dict(_cfg(None)).streams[0].durability_path
        is None
    )


def test_durability_sync_mode_validated():
    with pytest.raises(ValueError, match="durability.sync"):
        StreamConfig(
            input={}, output={}, durability={"enabled": True, "sync": "fsync"}
        )
    # all reference modes accepted
    for mode in ("per_entry", "group_commit", "periodic"):
        StreamConfig(
            input={}, output={}, durability={"enabled": True, "sync": mode}
        )


def test_stream_start_uses_durability_path(spark, tmp_path):
    """A durable stream checkpoints under durability.path; the drained
    run leaves the offset/commit log there (the WAL-equivalent
    artifact), and a restart from the same path replays nothing new."""
    from arkflow_spark.engine import Stream

    wal = str(tmp_path / "wal")
    cfg = EngineConfig.from_dict(
        _cfg({"enabled": True, "path": wal, "sync": "group_commit"})
    )
    s = Stream(spark, cfg.streams[0])
    q = s.start("IGNORED-DEFAULT", once=True)
    assert q.awaitTermination(120), "drain run did not terminate"
    # the checkpoint (WAL twin) lives at the durability path
    assert (tmp_path / "wal" / "offsets").is_dir()
    assert not (tmp_path / "IGNORED-DEFAULT").exists()


def test_duplicate_durability_paths_rejected():
    """Two streams sharing one durability.path would share one
    Structured Streaming checkpoint location and corrupt each other's
    offset logs — rejected at config-parse time (r7 ADVICE)."""
    raw = _cfg({"enabled": True, "path": "/tmp/wal-shared"})
    raw["streams"].append(
        {**raw["streams"][0], "name": "second"}
    )
    with pytest.raises(ValueError, match="share durability.path"):
        EngineConfig.from_dict(raw)


def test_distinct_or_disabled_durability_paths_accepted():
    raw = _cfg({"enabled": True, "path": "/tmp/wal-a"})
    raw["streams"].append(
        {
            **raw["streams"][0],
            "name": "second",
            "durability": {"enabled": True, "path": "/tmp/wal-b"},
        }
    )
    # disabled blocks may repeat a path freely (they resolve to None)
    raw["streams"].append(
        {
            **raw["streams"][0],
            "name": "third",
            "durability": {"enabled": False, "path": "/tmp/wal-a"},
        }
    )
    cfg = EngineConfig.from_dict(raw)
    assert [s.durability_path for s in cfg.streams] == [
        "/tmp/wal-a",
        "/tmp/wal-b",
        None,
    ]
