"""Streaming ingest throughput bench vs the reference's published numbers.

The reference's only published throughput figures are ingest-path: a
10k msg/s @ 1 KB sustained scenario (BASELINE.md; docs/docs/concepts/
5-wal-optimization.md crash-window math) with 8192-row default batches.
This script runs the SAME pipeline shape through this engine's full
streaming path — generate (rate source, 1 KB JSON payloads) ->
json_to_arrow -> SQL aggregate -> drop — under foreachBatch with
checkpointing, and reports sustained rows/s from StreamingQueryProgress.

Usage: python scripts/bench_streaming.py [seconds] [rows_per_sec_target]
Prints one JSON line {"metric": "streaming_ingest_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arkflow_spark.config import EngineConfig
from arkflow_spark.engine import Engine
from arkflow_spark.session import get_spark

# ~1 KB JSON payload, mirroring the reference's 1 KB message scenario
PAYLOAD = json.dumps(
    {
        "timestamp": 1625000000000,
        "sensor": "temp_1",
        "value": 10.5,
        "blob": "x" * 900,
    }
)

YAML_TMPL = """
streams:
  - name: ingest-bench
    input:
      type: generate
      context: '{payload}'
      interval: 10ms
      batch_size: {batch}
    pipeline:
      processors:
        - type: json_to_arrow
          schema: "timestamp bigint, sensor string, value double, blob string"
        - type: sql
          query: "SELECT sensor, COUNT(*) AS n, SUM(value) AS sv FROM flow GROUP BY sensor"
    output:
      type: drop
"""


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    batch = max(1, target // 100)  # interval 10ms -> 100 ticks/s
    spark = get_spark("arkflow-streaming-bench")
    cfg = tempfile.NamedTemporaryFile(
        "w", suffix=".yaml", delete=False
    )
    cfg.write(YAML_TMPL.format(payload=PAYLOAD, batch=batch))
    cfg.close()
    eng = Engine.from_file(spark, cfg.name)
    (q,) = eng.start_all(tempfile.mkdtemp(prefix="arkflow-sbench-"))
    t0 = time.time()
    time.sleep(seconds)
    progresses = [
        p if isinstance(p, dict) else json.loads(p.json) for p in q.recentProgress
    ]
    q.stop()
    # skip the first batches (cold codegen + rate-source backfill burst)
    steady = progresses[2:] or progresses
    rows = sum(p["numInputRows"] for p in steady)
    dur = sum(p["batchDuration"] for p in steady) / 1000.0
    rps = rows / max(dur, 1e-9)
    out = {
        "metric": "streaming_ingest_rows_per_sec",
        "value": round(rps),
        "unit": "rows/sec",
        "payload_bytes": len(PAYLOAD),
        "mb_per_sec": round(rps * len(PAYLOAD) / 1e6, 1),
        "batches": len(steady),
        "wall_s": round(time.time() - t0, 1),
        "reference_baseline": "10k msg/s @ 1 KB (BASELINE.md crash-window scenario)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
