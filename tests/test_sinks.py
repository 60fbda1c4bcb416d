"""Sink tests: HTTP output against a live local server, file output,
watermark late-data semantics."""

from __future__ import annotations

import http.server
import json
import threading

from pyspark.sql import functions as F

from arkflow_spark.registry import OUTPUTS, load_all


class _Collector(http.server.BaseHTTPRequestHandler):
    received: list[str] = []
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with _Collector.lock:
            _Collector.received.extend(body.decode().splitlines())
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


def test_http_output_posts_from_executors(spark):
    load_all()
    _Collector.received = []
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Collector)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        out = OUTPUTS.build(
            {"type": "http", "url": f"http://127.0.0.1:{port}/ingest",
             "batch_rows": 3}
        )
        df = spark.range(10).select(
            F.col("id"), (F.col("id") * 2).alias("v"),
            F.lit("x").alias("__meta_source"),
        )
        out.write_batch(df, 0)
        got = sorted(json.loads(line)["id"] for line in _Collector.received)
        assert got == list(range(10))
        # meta columns excluded from the payload
        assert "__meta_source" not in json.loads(_Collector.received[0])
    finally:
        server.shutdown()


def test_watermark_drops_late_data(spark, tmp_path):
    """Event-time watermark semantics — the capability the reference lacks
    entirely (SURVEY §2.4: no watermarks/late-data handling)."""
    src = str(tmp_path / "wm_src")
    ckpt = str(tmp_path / "wm_ckpt")
    on_time = spark.createDataFrame(
        [(i, f"2024-01-01 10:{i:02d}:00") for i in range(0, 50, 5)],
        "id BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    on_time.coalesce(1).write.parquet(src)

    sdf = (
        spark.readStream.schema("id BIGINT, ts TIMESTAMP").parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"))
    )
    rows = []
    q = (
        sdf.writeStream.outputMode("append")
        .foreachBatch(lambda df, eid: rows.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # append a very late batch: event at 10:00 after watermark advanced
        # past 10:35 (max 10:45 - 10m) -> its window [10:00,10:10) is final
        late = spark.createDataFrame(
            [(99, "2024-01-01 10:01:00")], "id BIGINT, ts STRING"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        (r["window"]["start"].strftime("%H:%M"), r["n"]) for r in rows
    }
    # the 10:00 window was emitted once with its on-time count (2 events:
    # 10:00, 10:05) — the late id=99 did not re-open it
    assert ("10:00", 2) in emitted
    assert not any(w == "10:00" and n != 2 for w, n in emitted)
