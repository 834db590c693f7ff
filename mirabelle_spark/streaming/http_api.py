"""HTTP control surface over :class:`StreamHandler`.

The reference manages streams at runtime over HTTP (handler.clj
router, :117-135):

- ``GET    /api/v1/stream``         → list streams
- ``POST   /api/v1/stream/<name>``  → add stream (base64 config body)
- ``GET    /api/v1/stream/<name>``  → get stream config (base64)
- ``DELETE /api/v1/stream/<name>``  → remove stream
- ``PUT    /api/v1/stream/<name>``  → push events into the stream
- ``GET    /healthz`` / ``/health`` → liveness
- ``GET    /metrics``               → Prometheus text exposition
  (per-stream ``stream_duration_seconds`` quantiles +
  ``http_responses_total``, production/_index.md §Metrics) when the
  api was built with a
  :class:`~mirabelle_spark.streaming.metrics.StreamMetricsListener`

Configs travel base64-encoded like the reference's
``b64/from-base64 → edn/read-string`` (handler.clj:44-49), with JSON
as this repo's EDN mirror. ``persist: true`` on add writes the
config under the handler's ``streams_dir`` before compiling
(stream.clj:276-296); event push appends a JSON-lines file to the
stream's ingest dir, which the running file source picks up as the
next micro-batch (the Spark-native analog of push!,
stream.clj:261-275).

The server is stdlib ``http.server`` on a daemon thread — the
control plane is low-traffic by design (a few requests per reload);
the data plane stays entirely inside Structured Streaming. Driving
Spark actions from HTTP threads is safe: SparkSession is
thread-safe, and each mutation holds the handler lock.
"""

from __future__ import annotations

import base64
import hmac
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from mirabelle_spark.streaming.lifecycle import StreamHandler

_LOG = logging.getLogger("mirabelle_spark.streaming.http_api")


def config_to_b64(config: dict) -> str:
    return base64.b64encode(json.dumps(config).encode("utf-8")).decode("ascii")


def config_from_b64(b64: str) -> dict:
    return json.loads(base64.b64decode(b64).decode("utf-8"))


class StreamApi:
    """Bind a :class:`StreamHandler` to an HTTP port.

    ``basic_auth=(user, password)`` guards every route like the
    reference's optional ``:basic-auth`` interceptor, which sits
    ahead of routing in the chain (http.clj:33-56): a request
    without matching ``Authorization: Basic ...`` credentials gets
    401 + ``WWW-Authenticate`` before any handler runs.
    """

    def __init__(
        self,
        handler: StreamHandler,
        host: str = "127.0.0.1",
        port: int = 0,
        basic_auth: tuple[str, str] | None = None,
        metrics=None,
    ):
        self.handler = handler
        self.metrics = metrics
        self._lock = threading.Lock()
        expected_auth = None
        if basic_auth is not None:
            user, password = basic_auth
            # kept as bytes: stdlib headers are latin-1 decoded str, and
            # hmac.compare_digest on str raises TypeError for non-ASCII
            # input — comparing bytes never does.
            expected_auth = b"Basic " + base64.b64encode(
                f"{user}:{password}".encode("utf-8")
            )
        api = self

        class _Req(BaseHTTPRequestHandler):
            # route table mirrors handler.clj:117-135
            def log_message(self, fmt, *args):  # noqa: N802 - stdlib name
                _LOG.debug(fmt, *args)

            def _send(self, status: int, body: dict):
                data = json.dumps(body).encode("utf-8")
                self._send_raw(status, data, "application/json")

            def _send_raw(self, status: int, data: bytes, ctype: str):
                if api.metrics is not None:
                    api.metrics.record_http(self.command, status, self.path)
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _body(self) -> dict:
                ln = int(self.headers.get("Content-Length") or 0)
                if not ln:
                    return {}
                return json.loads(self.rfile.read(ln).decode("utf-8"))

            def _stream_name(self) -> str | None:
                parts = [p for p in self.path.split("/") if p]
                if len(parts) == 4 and parts[:3] == ["api", "v1", "stream"]:
                    return parts[3]
                return None

            def _route(self, method: str):
                if expected_auth is not None and not hmac.compare_digest(
                    self.headers.get("Authorization", "").encode("latin-1"),
                    expected_auth,
                ):
                    data = json.dumps({"error": "unauthorized"}).encode("utf-8")
                    self.send_response(401)
                    self.send_header("WWW-Authenticate", 'Basic realm="mirabelle"')
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return None
                name = self._stream_name()
                try:
                    if self.path in ("/healthz", "/health") and method == "GET":
                        return self._send(200, {"message": "ok"})
                    if self.path == "/metrics" and method == "GET":
                        if api.metrics is None:
                            return self._send(
                                404, {"error": "metrics not configured"}
                            )
                        return self._send_raw(
                            200,
                            api.metrics.render().encode("utf-8"),
                            "text/plain; version=0.0.4",
                        )
                    if self.path == "/api/v1/stream" and method == "GET":
                        return self._send(
                            200, {"streams": api.handler.list_streams()}
                        )
                    if name is None:
                        return self._send(404, {"error": "not found"})
                    if method == "POST":  # add-stream (handler.clj:44-49)
                        body = self._body()
                        if not isinstance(body, dict) or "config" not in body:
                            return self._send(
                                400, {"error": "body must carry a 'config' key"}
                            )
                        config = config_from_b64(body["config"])
                        with api._lock:
                            api.handler.add_stream(
                                name, config, persist=bool(body.get("persist"))
                            )
                        return self._send(200, {"message": "stream added"})
                    if method == "GET":  # get-stream (handler.clj:63-71)
                        with api._lock:
                            if name not in api.handler.configs:
                                return self._send(
                                    404, {"error": f"stream {name} not found"}
                                )
                            cfg = api.handler.configs[name]
                        return self._send(200, {"config": config_to_b64(cfg)})
                    if method == "DELETE":  # remove-stream
                        with api._lock:
                            api.handler.remove_stream(name)
                        return self._send(200, {"message": "stream removed"})
                    if method == "PUT":  # push-event (handler.clj:50-57)
                        body = self._body()
                        if not isinstance(body, dict):
                            return self._send(
                                400, {"error": "body must be a JSON object"}
                            )
                        events = body.get("events", [])
                        with api._lock:
                            n = api.handler.push_events(name, events)
                        return self._send(200, {"message": "ok", "events": n})
                    return self._send(405, {"error": "method not allowed"})
                except KeyError as e:
                    # only stream-not-found reaches here now (body
                    # shape is validated inline above)
                    return self._send(404, {"error": str(e)})
                except ValueError as e:  # malformed JSON / bad base64
                    return self._send(400, {"error": f"bad request: {e}"})
                except Exception as e:  # noqa: BLE001 - surface, don't kill the thread
                    _LOG.exception("api error on %s %s", method, self.path)
                    return self._send(500, {"error": f"{type(e).__name__}: {e}"})

            def do_GET(self):  # noqa: N802
                self._route("GET")

            def do_POST(self):  # noqa: N802
                self._route("POST")

            def do_PUT(self):  # noqa: N802
                self._route("PUT")

            def do_DELETE(self):  # noqa: N802
                self._route("DELETE")

        self._server = ThreadingHTTPServer((host, port), _Req)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "StreamApi":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="mirabelle-http-api", daemon=True
        )
        self._thread.start()
        _LOG.info("stream api listening on port %d", self.port)
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=10)
