"""HTTP input, server and client-poll modes (reference: input/http.rs)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from arkflow_spark.registry import INPUTS, load_all
from arkflow_spark.sources.http_ingest import HttpPollClient, WebhookIngestServer

load_all()


def post(url: str, body: bytes) -> dict:
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def test_webhook_server_spools_posts(tmp_path):
    spool = str(tmp_path / "spool")
    srv = WebhookIngestServer(spool, "127.0.0.1:0", "/ingest").start()
    try:
        url = f"http://127.0.0.1:{srv.port}/ingest"
        assert post(url, b"hello")["offset"] == 0
        assert post(url, b"world")["offset"] == 1
        # wrong path -> 404, nothing spooled
        with pytest.raises(urllib.error.HTTPError):
            post(f"http://127.0.0.1:{srv.port}/other", b"nope")
        # liveness
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/", timeout=10) as r:
            assert r.read() == b"ok"
    finally:
        srv.stop()
    assert (tmp_path / "spool" / "0.msg").read_bytes() == b"hello"
    assert (tmp_path / "spool" / "1.msg").read_bytes() == b"world"


def test_webhook_cors_headers(tmp_path):
    srv = WebhookIngestServer(str(tmp_path), "127.0.0.1:0", "/i", cors_enabled=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/i", data=b"x", method="POST"
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
    finally:
        srv.stop()


def test_http_server_input_end_to_end(spark, tmp_path):
    """Engine `http` input (server mode): POST -> spool -> batch read."""
    spool = str(tmp_path / "spool")
    inp = INPUTS.build(
        {"type": "http", "path": spool, "address": "127.0.0.1:0",
         "http_path": "/hook"}
    )
    df = inp.read_batch(spark)  # starts the server
    url = f"http://127.0.0.1:{inp.port}/hook"
    post(url, b'{"n": 1}')
    post(url, b'{"n": 2}')
    rows = sorted(
        bytes(r["__value__"]) for r in inp.read_batch(spark).collect()
    )
    assert rows == [b'{"n": 1}', b'{"n": 2}']
    assert df.schema["__value__"].dataType.typeName() == "binary"


def test_http_poll_client_bounded(tmp_path):
    """Client poll mode: GET url max_polls times, deliver each body."""
    srv = WebhookIngestServer(str(tmp_path / "s2"), "127.0.0.1:0", "/x").start()
    try:
        got = []
        c = HttpPollClient(
            {"url": f"http://127.0.0.1:{srv.port}/", "interval_ms": "10",
             "max_polls": "3"}
        )
        assert c.synchronous
        c.subscribe(got.append)
        assert got == [b"ok", b"ok", b"ok"]
    finally:
        srv.stop()


def test_http_poll_input_through_engine(spark, tmp_path):
    """Engine `http` input (poll mode) drains polled bodies via streaming."""
    srv = WebhookIngestServer(str(tmp_path / "unused"), "127.0.0.1:0", "/x").start()
    try:
        inp = INPUTS.build(
            {
                "type": "http",
                "path": str(tmp_path / "spool"),
                "url": f"http://127.0.0.1:{srv.port}/",
                "interval_ms": "10",
                "max_polls": "2",
            }
        )
        q = (
            inp.read_stream(spark)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        vals = [
            bytes(r["__value__"])
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        ]
        assert vals == [b"ok", b"ok"]
    finally:
        srv.stop()


def test_webhook_rate_limit_429(tmp_path):
    """Token bucket (reference rate_limiter.rs): burst exhausts -> 429,
    refill restores."""
    import time

    # refill rate of 1/s: even on a heavily loaded machine the three
    # burst posts cannot take the >1 s apiece that would refill a
    # token mid-loop and let the fourth post through (a 50 rps limit
    # flaked exactly that way under a parallel Spark suite)
    srv = WebhookIngestServer(
        str(tmp_path), "127.0.0.1:0", "/i",
        rate_limit={"requests_per_second": 1, "burst_size": 3},
    ).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/i"
        for _ in range(3):
            post(url, b"x")  # within burst
        with pytest.raises(urllib.error.HTTPError) as e:
            post(url, b"x")
        assert e.value.code == 429
        time.sleep(1.2)  # 1 rps refill -> a token is available again
        post(url, b"x")
    finally:
        srv.stop()


def test_webhook_auth_and_lockout(tmp_path):
    """Auth + brute-force lockout (reference auth_middleware.rs): wrong
    credentials 401, locked after 3 failures -> 423 even with the right
    token; success resets the counter."""
    srv = WebhookIngestServer(
        str(tmp_path), "127.0.0.1:0", "/i",
        auth={"type": "bearer", "token": "s3cret"},
    ).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/i"

        def post_auth(tok):
            req = urllib.request.Request(url, data=b"x", method="POST")
            if tok:
                req.add_header("Authorization", f"Bearer {tok}")
            with urllib.request.urlopen(req, timeout=10) as resp:
                return resp.status

        assert post_auth("s3cret") == 200
        for _ in range(2):
            with pytest.raises(urllib.error.HTTPError) as e:
                post_auth("wrong")
            assert e.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as e:
            post_auth("wrong")  # third failure locks
        assert e.value.code in (401, 423)
        with pytest.raises(urllib.error.HTTPError) as e:
            post_auth("s3cret")  # locked out even with valid creds
        assert e.value.code == 423
    finally:
        srv.stop()
