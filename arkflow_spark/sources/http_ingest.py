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

import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from arkflow_spark.sources.push_source import spool_write


class WebhookIngestServer:
    """POST/PUT ``path`` -> spool_write; GET -> liveness. CORS optional
    (input/http.rs `cors_enabled`)."""

    def __init__(
        self,
        spool_dir: str,
        address: str = "127.0.0.1:0",
        path: str = "/ingest",
        cors_enabled: bool = False,
    ):
        host, _, port = address.partition(":")
        spool, accept_path, cors = spool_dir, path, cors_enabled

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
