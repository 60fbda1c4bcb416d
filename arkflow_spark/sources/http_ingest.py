"""HTTP ingest: the server half of the reference's `http` input.

Parity target: crates/arkflow-plugin/src/input/http.rs — server mode
(accept POST/PUT bodies on a bind address + path, :221-245 config:
address/path/cors_enabled) and client poll mode (poll a remote endpoint
every `interval`). Both land payloads in the spool dir, where the
`spooldir` DataSource serves them with full offset/commit semantics — so
ingest durability and replay are the spool's (one fsynced file per
message), independent of Spark's trigger cadence.

Stdlib-only (http.server / urllib): no gating, works in any container.
The server runs on the driver or any sidecar — it is an ingress process,
deliberately decoupled from Spark executors.
"""

from __future__ import annotations

import base64
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from arkflow_spark.sources.push_source import spool_write


class TokenBucket:
    """Thread-safe token-bucket rate limiter, mirroring the reference's
    SimpleRateLimiter (rate_limiter.rs:25-60: requests_per_second refill,
    burst_size cap). ``check()`` -> False = over the limit (HTTP 429)."""

    def __init__(self, requests_per_second: float, burst_size: int):
        self.rate = float(requests_per_second)
        self.burst = int(burst_size)
        self.tokens = float(burst_size)
        self.last = time.monotonic()
        self._lock = threading.Lock()

    def check(self) -> bool:
        with self._lock:
            now = time.monotonic()
            self.tokens = min(
                self.burst, self.tokens + (now - self.last) * self.rate
            )
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return True
            return False


class AuthGuard:
    """Credential check + brute-force lockout, mirroring the reference's
    AuthMiddleware (auth_middleware.rs:37-120: per-identifier failed-attempt
    counter, lock after ``max_attempts`` for ``lock_seconds``; success
    resets). ``auth``: {"type": "bearer", "token": ...} or
    {"type": "basic", "username": ..., "password": ...}."""

    def __init__(self, auth: dict, max_attempts: int = 3, lock_seconds: float = 300):
        kind = auth.get("type", "basic")
        if kind == "bearer":
            self.expected = f"Bearer {auth['token']}"
        elif kind == "basic":
            tok = base64.b64encode(
                f"{auth['username']}:{auth['password']}".encode()
            ).decode()
            self.expected = f"Basic {tok}"
        else:
            raise ValueError(f"unknown http auth type: {kind!r}")
        self.max_attempts = max_attempts
        self.lock_seconds = lock_seconds
        self._failures: dict[str, tuple[int, float]] = {}
        self._lock = threading.Lock()

    def is_locked(self, ident: str) -> bool:
        with self._lock:
            count, locked_until = self._failures.get(ident, (0, 0.0))
            return count >= self.max_attempts and time.monotonic() < locked_until

    def check(self, ident: str, header: str | None) -> bool:
        if self.is_locked(ident):
            return False
        if header == self.expected:
            with self._lock:
                self._failures.pop(ident, None)  # success resets
            return True
        with self._lock:
            count, _ = self._failures.get(ident, (0, 0.0))
            self._failures[ident] = (
                count + 1,
                time.monotonic() + self.lock_seconds,
            )
        return False


class WebhookIngestServer:
    """POST/PUT ``path`` -> spool_write; GET -> liveness. CORS, optional
    auth (+ lockout) and token-bucket rate limiting, per the reference's
    http input config (input/http.rs:221-245 `cors_enabled`/`auth`;
    rate_limiter.rs)."""

    def __init__(
        self,
        spool_dir: str,
        address: str = "127.0.0.1:0",
        path: str = "/ingest",
        cors_enabled: bool = False,
        auth: dict | None = None,
        rate_limit: dict | None = None,
    ):
        host, _, port = address.partition(":")
        spool, accept_path, cors = spool_dir, path, cors_enabled
        guard = AuthGuard(auth) if auth else None
        bucket = (
            TokenBucket(
                rate_limit.get("requests_per_second", 100),
                rate_limit.get("burst_size", 200),
            )
            if rate_limit
            else None
        )

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _cors(self):
                if cors:
                    self.send_header("Access-Control-Allow-Origin", "*")
                    self.send_header("Access-Control-Allow-Methods", "POST, PUT")

            def do_GET(self):
                self.send_response(200)
                self._cors()
                self.end_headers()
                self.wfile.write(b"ok")

            def do_OPTIONS(self):
                self.send_response(204)
                self._cors()
                self.end_headers()

            def _ingest(self):
                if self.path != accept_path:
                    self.send_response(404)
                    self.end_headers()
                    return
                if bucket is not None and not bucket.check():
                    self.send_response(429)  # rate_limiter.rs contract
                    self.end_headers()
                    return
                if guard is not None:
                    ident = self.client_address[0]
                    if not guard.check(ident, self.headers.get("Authorization")):
                        self.send_response(
                            423 if guard.is_locked(ident) else 401
                        )
                        self.end_headers()
                        return
                n = int(self.headers.get("Content-Length", 0))
                seq = spool_write(spool, self.rfile.read(n))
                self.send_response(200)
                self._cors()
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"offset": %d}' % seq)

            do_POST = _ingest
            do_PUT = _ingest

        self.server = ThreadingHTTPServer((host or "127.0.0.1", int(port or 0)), Handler)
        self.port = self.server.server_port
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def start(self) -> "WebhookIngestServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()


class HttpPollClient:
    """Client poll mode (input/http.rs `method`/`interval`): GET ``url``
    every ``interval_ms``, deliver each response body. Implements the
    broker-client contract (subscribe/close) so it plugs into
    :class:`sources.brokers.BrokerStreamReader` unchanged."""

    def __init__(self, options: dict):
        self.url = options["url"]
        self.interval_s = float(options.get("interval_ms", 1000)) / 1000.0
        self.max_polls = int(options.get("max_polls", 0))  # 0 = unbounded
        self._stop = threading.Event()

    # synchronous only when bounded (deterministic for tests/drain mode)
    @property
    def synchronous(self) -> bool:
        return self.max_polls > 0

    def subscribe(self, on_message) -> None:
        polls = 0
        while not self._stop.is_set():
            with urllib.request.urlopen(self.url, timeout=30) as resp:
                on_message(resp.read())
            polls += 1
            if self.max_polls and polls >= self.max_polls:
                return
            self._stop.wait(self.interval_s)

    def close(self) -> None:
        self._stop.set()
