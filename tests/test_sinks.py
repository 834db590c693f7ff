"""Output layer (§2.2): file sink layout, tap, output registry, plan export."""

import os
import shutil
import tempfile

import pytest


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="mirabelle_sinks_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_file_sink_templated_path(make_events, spark, tmpdir):
    from mirabelle_spark import sinks

    df = make_events(
        [
            {"time": 1704067200, "metric": 1, "host": "a"},
            {"time": 1704067200, "metric": 2, "host": "b"},
        ]
    )
    sinks.file_sink(df, tmpdir, partition_fields=["host"], date_pattern="yyyy-MM-dd")
    back = spark.read.json(os.path.join(tmpdir, "host=a"))
    assert back.count() == 1


def test_output_registry_and_test_mode(make_events):
    from mirabelle_spark import sinks

    captured = []
    sinks.register_output("collector", lambda df: captured.append(df.count()))
    df = make_events([{"time": 1, "metric": 1}])
    sinks.output(df, "collector", test_mode=True)
    assert captured == []  # discarded in test mode (action.clj:693-694)
    sinks.output(df, "collector")
    assert captured == [1]
    with pytest.raises(KeyError):
        sinks.output(df, "missing")


def test_tap_and_debug(make_events):
    from mirabelle_spark import sinks

    store = {}
    df = make_events([{"time": 1, "metric": 1}])
    out = sinks.tap(df, store, "t1")
    assert out is df and store["t1"].count() == 1
    assert sinks.debug(df).count() == 1  # pass-through


def test_plan_dot_export(make_events):
    from mirabelle_spark import sinks

    df = make_events([{"time": 1, "metric": 1}]).filter("metric > 0")
    dot = sinks.plan_dot(df)
    assert dot.startswith("digraph plan {") and "n0" in dot


def test_prometheus_remote_write_shape(make_events):
    from pyspark.sql import functions as F

    from mirabelle_spark import sinks

    df = make_events(
        [
            {"time": 1, "metric": 1.5, "service": "cpu"},
            {"time": 2, "metric": 2.5, "service": "cpu"},
            {"time": 3, "metric": 9.0, "service": "mem"},
        ]
    ).withColumn("name", F.col("service")).withColumn(
        "attributes", F.create_map(F.lit("host"), F.lit("h1"))
    )
    shaped = sinks.prometheus_remote_write_shape(df)
    rows = {tuple(sorted((e.key, e.value) for e in r.labels)): r.samples
            for r in shaped.collect()}
    cpu = rows[(("__name__", "cpu"), ("host", "h1"))]
    assert [s.value for s in cpu] == [1.5, 2.5]
    assert cpu[0].timestamp == 1000  # ms


def test_publish_subscribe(make_events):
    from mirabelle_spark import sinks

    df = make_events([{"time": 1, "metric": 5}, {"time": 2, "metric": 50}])
    sinks.publish(df, "alerts", test_mode=True)
    assert sinks.subscribe("alerts") == []  # discarded in test mode
    sinks.publish(df, "alerts")
    got = sinks.subscribe("alerts", condition=[":>", "metric", 10])
    assert len(got) == 1 and got[0].count() == 1


def test_exception_stream(make_events):
    from mirabelle_spark.operators.transforms import exception_stream

    df = make_events([{"time": 1, "metric": 4}, {"time": 2, "metric": 0}])

    def risky(rec):
        return {"metric": 10.0 / rec["metric"]}

    ok, err = exception_stream(df, risky)
    assert [r.metric for r in ok.collect()] == [2.5]
    errs = err.collect()
    assert len(errs) == 1 and "ZeroDivisionError" in errs[0].error


def test_pubsub_bridge_per_subscriber_conditions(make_events, spark, tmp_path):
    """websocket.clj:47-119 semantics: each subscriber's condition
    filters the published events; remove stops delivery; the
    streaming edge dispatches via foreachBatch."""
    import json as _json
    import os

    from mirabelle_spark import sinks
    from mirabelle_spark import streaming as stx

    bridge = sinks.PubSubBridge()
    hi, lo = [], []
    sub_hi = bridge.add("alerts", [":>", "metric", 100], hi.append)
    bridge.add("alerts", [":<=", "metric", 100], lo.append)
    bridge.add("other", None, lambda line: (_ for _ in ()).throw(AssertionError))

    df = make_events([{"time": 1, "metric": 50}, {"time": 2, "metric": 150}])
    bridge.dispatch(df, "alerts")
    assert len(hi) == 1 and _json.loads(hi[0])["metric"] == 150
    assert len(lo) == 1 and _json.loads(lo[0])["metric"] == 50

    bridge.rm(sub_hi)
    bridge.dispatch(df, "alerts")
    assert len(hi) == 1 and len(lo) == 2  # removed sub got nothing more

    # streaming edge
    src_dir = tmp_path / "ps_in"
    src_dir.mkdir()
    (src_dir / "p.json").write_text(
        '{"time": "2024-01-01T00:00:01", "metric": 200.0, "host": "a"}\n'
        '{"time": "2024-01-01T00:00:02", "metric": 10.0, "host": "a"}\n'
    )
    stream = stx.file_source(spark, str(src_dir), "time timestamp, metric double, host string")
    lo.clear()
    q = bridge.stream_sink(stream, "alerts", checkpoint=str(tmp_path / "ps_ckpt"))
    q.awaitTermination(60)
    assert len(lo) == 1 and _json.loads(lo[0])["metric"] == 10.0


class _FakeHttp:
    """Local capture endpoint: executors POST over loopback; the test
    process records (path, headers, body)."""

    def __init__(self):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.requests = []
        lock = threading.Lock()
        captured = self.requests

        class H(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def do_POST(self):
                ln = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(ln)
                with lock:
                    # latin-1: lossless byte↔str for binary payloads
                    captured.append(
                        (self.path, dict(self.headers), body.decode("latin-1"))
                    )
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"{}")

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


def test_elasticsearch_sink_real_http(make_events):
    """output/elasticsearch.clj:125-177 over a live (local) HTTP
    endpoint: bulk ndjson action/doc pairs, daily index from event
    time, time dropped, @timestamp added, auth header carried.
    Delivery runs executor-side (foreachPartition → POST crosses the
    Python-worker/test process boundary)."""
    import json as _json

    from mirabelle_spark import sinks

    srv = _FakeHttp()
    try:
        df = make_events([
            {"time": 1704067200, "metric": 1.0, "host": "a", "service": "s1"},
            {"time": 1704153600, "metric": 2.0, "host": "b", "service": "s2"},
        ])
        sinks.elasticsearch_sink(
            df, "mirabelle", url=srv.url,
            headers={"Authorization": "Bearer tok"},
        )
        assert srv.requests, "no bulk request arrived"
        assert all(p == "/_bulk" for p, _, _ in srv.requests)
        assert all(
            h.get("Authorization") == "Bearer tok" for _, h, _ in srv.requests
        )
        lines = [
            ln for _, _, body in srv.requests for ln in body.splitlines() if ln
        ]
        assert len(lines) == 4  # action+doc per event
        pairs = [
            (_json.loads(lines[i]), _json.loads(lines[i + 1]))
            for i in range(0, len(lines), 2)
        ]
        by_index = {a["index"]["_index"]: d for a, d in pairs}
        assert set(by_index) == {"mirabelle-2024-01-01", "mirabelle-2024-01-02"}
        doc = by_index["mirabelle-2024-01-01"]
        assert doc["host"] == "a" and "time" not in doc
        assert doc["@timestamp"].startswith("2024-01-01T00:00:00")
    finally:
        srv.stop()


def test_pagerduty_sink_real_http(make_events):
    """output/pagerduty.clj:44-111 over a live (local) endpoint:
    critical→trigger / ok→resolve, severity mapping, dedup_key and
    summary joins, custom_details carries the event."""
    import json as _json

    from mirabelle_spark import sinks

    srv = _FakeHttp()
    try:
        df = make_events([
            {"time": 1704067200, "metric": 1.0, "host": "h1",
             "service": "api", "state": "critical"},
            {"time": 1704067300, "metric": 0.0, "host": "h1",
             "service": "api", "state": "ok"},
        ])
        sinks.pagerduty_sink(df, "rk-123", url=srv.url + "/v2/enqueue")
        bodies = sorted(
            (_json.loads(b) for _, _, b in srv.requests),
            key=lambda b: b["event_action"],
        )
        assert [b["event_action"] for b in bodies] == ["resolve", "trigger"]
        trig = bodies[1]
        assert trig["routing_key"] == "rk-123"
        assert trig["dedup_key"] == "h1-api"
        assert trig["payload"]["severity"] == "critical"
        assert trig["payload"]["source"] == "h1"
        assert trig["payload"]["summary"] == "h1 - api - critical"
        assert trig["payload"]["custom_details"]["metric"] == 1.0
        assert bodies[0]["payload"]["severity"] == "info"
    finally:
        srv.stop()


def test_websocket_pubsub_end_to_end(make_events):
    """transport/websocket.clj:40-119 over a REAL RFC 6455 socket: a
    hand-rolled client performs the handshake (accept key verified),
    subscribes to /channel/alerts with a base64 condition query, and
    receives only matching events as JSON text frames; close
    unsubscribes."""
    import base64 as _b64
    import hashlib as _hashlib
    import json as _json
    import os as _os
    import socket as _socket
    import time as _time
    from urllib.parse import quote

    from mirabelle_spark.sinks import PubSubBridge
    from mirabelle_spark.streaming import WebSocketPubSub

    bridge = PubSubBridge()
    ws = WebSocketPubSub(bridge).start()
    try:
        key = _b64.b64encode(_os.urandom(16)).decode()
        q = quote(_b64.b64encode(
            _json.dumps([":>", "metric", 10]).encode()).decode())
        s = _socket.create_connection(("127.0.0.1", ws.port), timeout=10)
        s.sendall((
            f"GET /channel/alerts?query={q} HTTP/1.1\r\n"
            "Host: localhost\r\nUpgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode())
        head = b""
        while b"\r\n\r\n" not in head:
            head += s.recv(4096)
        assert b"101 Switching Protocols" in head
        guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
        expect = _b64.b64encode(
            _hashlib.sha1((key + guid).encode()).digest()).decode()
        assert f"Sec-WebSocket-Accept: {expect}".encode() in head

        # wait for the subscription to register, then publish a batch
        deadline = _time.time() + 10
        while not bridge._subs and _time.time() < deadline:
            _time.sleep(0.05)
        df = make_events([
            {"time": 1, "metric": 5.0, "host": "low"},
            {"time": 2, "metric": 50.0, "host": "high"},
        ])
        bridge.dispatch(df, "alerts")
        bridge.dispatch(df, "other-channel")  # different channel: ignored

        def read_frame(sock):
            hdr = b""
            while len(hdr) < 2:
                hdr += sock.recv(2 - len(hdr))
            assert hdr[0] == 0x81  # FIN + text
            ln = hdr[1] & 0x7F
            assert ln < 126
            payload = b""
            while len(payload) < ln:
                payload += sock.recv(ln - len(payload))
            return _json.loads(payload)

        ev = read_frame(s)
        assert ev["host"] == "high" and ev["metric"] == 50.0
        s.settimeout(1.0)
        try:
            extra = s.recv(1)
            assert not extra, "unexpected extra frame"
        except TimeoutError:
            pass  # nothing else arrived: the metric<=10 event filtered out

        # masked close frame → server unsubscribes
        mask = _os.urandom(4)
        s.sendall(bytes([0x88, 0x80]) + mask)
        deadline = _time.time() + 10
        while bridge._subs and _time.time() < deadline:
            _time.sleep(0.05)
        assert not bridge._subs
        s.close()
    finally:
        ws.stop()


def _snappy_decompress(data: bytes) -> bytes:
    """Minimal snappy block decoder (literals + copies not needed —
    the encoder is all-literal, but verify tags strictly)."""
    # preamble varint
    i = 0
    ln = 0
    shift = 0
    while True:
        b = data[i]
        i += 1
        ln |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while i < len(data):
        tag = data[i]
        assert tag & 0x03 == 0, "non-literal element from all-literal encoder"
        l6 = tag >> 2
        i += 1
        if l6 < 60:
            n = l6 + 1
        else:
            nb = l6 - 59
            n = int.from_bytes(data[i:i + nb], "little") + 1
            i += nb
        out += data[i:i + n]
        i += n
    assert len(out) == ln
    return bytes(out)


def test_prometheus_remote_write_sink_real_wire(spark):
    """output/prometheus.clj:18-71 end-to-end: events → one
    timeseries per label set → REAL WriteRequest protobuf in snappy
    framing POSTed over HTTP. The test decodes the snappy block and
    parses the proto2 wire bytes back (same public wire format the
    riemann decoder implements)."""
    from mirabelle_spark import sinks
    from mirabelle_spark.riemann_wire import _fields

    srv = _FakeHttp()
    try:
        from datetime import datetime, timezone

        def _t(s_):
            return datetime.fromtimestamp(s_, tz=timezone.utc).replace(tzinfo=None)

        df = spark.createDataFrame(
            [
                (_t(1704067200), 1.5, "cpu", {"dc": "eu"}),
                (_t(1704067260), 2.5, "cpu", {"dc": "eu"}),
                (_t(1704067200), 9.0, "mem", {"dc": "us"}),
            ],
            "time timestamp, metric double, name string, attributes map<string,string>",
        )
        sinks.prometheus_remote_write_sink(df, srv.url + "/api/v1/write")
        assert srv.requests
        path, headers, _ = srv.requests[0]
        assert path == "/api/v1/write"
        assert headers.get("Content-Encoding") == "snappy"
        assert headers.get("X-Prometheus-Remote-Write-Version") == "0.1.0"

        raw = b"".join(
            _snappy_decompress(body.encode("latin-1"))
            for _, _, body in srv.requests
        )
        series = {}
        for fnum, _, ts_bytes in _fields(memoryview(raw)):
            assert fnum == 1  # WriteRequest.timeseries
            labels, samples = [], []
            for f2, _, v2 in _fields(ts_bytes):
                if f2 == 1:  # Label
                    parts = {f3: bytes(v3).decode() for f3, _, v3 in _fields(v2)}
                    labels.append((parts[1], parts[2]))
                elif f2 == 2:  # Sample
                    import struct as _struct
                    val = ts = None
                    for f3, wt, v3 in _fields(v2):
                        if f3 == 1:
                            val = _struct.unpack("<d", v3)[0]
                        elif f3 == 2:
                            ts = v3
                    samples.append((val, ts))
            series[tuple(labels)] = sorted(samples)
        cpu = series[(("__name__", "cpu"), ("dc", "eu"))]
        assert cpu == [(1.5, 1704067200000), (2.5, 1704067260000)]
        mem = series[(("__name__", "mem"), ("dc", "us"))]
        assert mem == [(9.0, 1704067200000)]
    finally:
        srv.stop()


def test_elasticsearch_sink_utc_index_on_non_utc_session(make_events, spark):
    """format-event pins ZoneOffset/UTC (output/elasticsearch.clj):
    an event at 2024-01-01T01:00:00Z must route to the 2024-01-01
    daily index and keep a UTC @timestamp even when the Spark
    session renders timestamps in a non-UTC zone (where the naive
    date_format would say 2023-12-31)."""
    import json as _json

    from mirabelle_spark import sinks

    srv = _FakeHttp()
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = make_events([
            {"time": 1704070800, "metric": 1.0, "host": "a"},  # 01:00Z
        ])
        sinks.elasticsearch_sink(df, "mirabelle", url=srv.url)
        lines = [
            ln for _, _, body in srv.requests for ln in body.splitlines() if ln
        ]
        action, doc = _json.loads(lines[0]), _json.loads(lines[1])
        assert action["index"]["_index"] == "mirabelle-2024-01-01"
        assert doc["@timestamp"] == "2024-01-01T01:00:00.000Z"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        srv.stop()


def test_websocket_pipelined_close_frame(make_events):
    """A client that sends its close frame in the same TCP segment as
    the handshake request must still be seen: the server answers the
    close and drops the subscriber (the handshake reader forwards
    bytes past \\r\\n\\r\\n into the frame loop)."""
    import base64 as _b64
    import os as _os
    import socket as _socket
    import time as _time

    from mirabelle_spark.sinks import PubSubBridge
    from mirabelle_spark.streaming import WebSocketPubSub

    bridge = PubSubBridge()
    ws = WebSocketPubSub(bridge).start()
    try:
        key = _b64.b64encode(_os.urandom(16)).decode()
        mask = _os.urandom(4)
        handshake = (
            "GET /channel/alerts HTTP/1.1\r\n"
            "Host: localhost\r\nUpgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
        s = _socket.create_connection(("127.0.0.1", ws.port), timeout=10)
        # handshake + masked close frame, one sendall → one segment
        s.sendall(handshake + bytes([0x88, 0x80]) + mask)
        buf = b""
        s.settimeout(10)
        # read until the server's close frame (0x88 0x00) after headers
        deadline = _time.time() + 10
        while _time.time() < deadline:
            if b"\r\n\r\n" in buf and buf.split(b"\r\n\r\n", 1)[1]:
                break
            chunk = s.recv(4096)
            if not chunk:
                break
            buf += chunk
        head, rest = buf.split(b"\r\n\r\n", 1)
        assert b"101 Switching Protocols" in head
        assert rest[:2] == bytes([0x88, 0x00]), rest
        # subscriber must be gone (close processed, not lost)
        deadline = _time.time() + 10
        while bridge._subs and _time.time() < deadline:
            _time.sleep(0.05)
        assert not bridge._subs
        s.close()
    finally:
        ws.stop()


def test_mirabelle_discard_tag(make_events):
    """howto/stream/_index.md:757-759: events tagged
    'mirabelle/discard' are ignored by every side-effecting action
    (outputs, publish!, log) but still flow through the stream and
    its taps."""
    from mirabelle_spark import sinks

    df = make_events([
        {"time": 1, "metric": 1.0, "host": "keep", "tags": ["x"]},
        {"time": 2, "metric": 2.0, "host": "drop",
         "tags": ["x", "mirabelle/discard"]},
        {"time": 3, "metric": 3.0, "host": "null-tags"},
    ])
    captured = []
    sinks.register_output("disc-test", lambda d: captured.extend(
        r.host for r in d.collect()))
    try:
        sinks.output(df, "disc-test")
        assert sorted(captured) == ["keep", "null-tags"]

        sinks.publish(df, "disc-chan")
        pub = [r.host for b in sinks.subscribe("disc-chan") for r in b.collect()]
        assert sorted(pub) == ["keep", "null-tags"]

        # taps see everything — discard hides only side effects
        store = {}
        sinks.tap(df, store, "t")
        assert store["t"].count() == 3
    finally:
        sinks._OUTPUTS.pop("disc-test", None)
        sinks._CHANNELS.pop("disc-chan", None)
