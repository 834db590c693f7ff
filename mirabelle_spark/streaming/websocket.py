"""Websocket pub/sub transport (transport/websocket.clj:40-119).

Real RFC 6455 server on stdlib sockets — this container has no
websocket library, and the protocol's server side is small: one
SHA-1 handshake plus text-frame encoding. Clients connect to
``ws://host:port/channel/<name>?query=<base64-condition>`` exactly
like the reference (websocket.clj:64-65 router; :40-60 query
parsing — the query travels base64-encoded, JSON here as this
repo's EDN mirror, ``"true"`` meaning match-all). Each connection
registers a subscriber on a :class:`~mirabelle_spark.sinks.
PubSubBridge`; published batches are filtered per-subscriber by the
shared condition compiler and delivered as JSON text frames.

The socket edge is driver-side by design: this is alert-rate egress
(humans watching dashboards), not a data-plane operator — the
condition filter still runs distributed inside ``dispatch`` before
any row reaches a socket.
"""

from __future__ import annotations

import base64
import hashlib
import json
import logging
import socketserver
import threading
from urllib.parse import parse_qs, unquote, urlsplit

from mirabelle_spark.sinks import PubSubBridge

_LOG = logging.getLogger("mirabelle_spark.streaming.websocket")

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept per RFC 6455 §4.2.2."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def text_frame(payload: str) -> bytes:
    """Server→client text frame (FIN set, unmasked)."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        head = bytes([0x81, n])
    elif n < 1 << 16:
        head = bytes([0x81, 126]) + n.to_bytes(2, "big")
    else:
        head = bytes([0x81, 127]) + n.to_bytes(8, "big")
    return head + data


def parse_query_condition(query_string: str):
    """``?query=`` → condition vector (websocket.clj:40-60):
    base64(JSON) with ``"true"`` as the match-all default."""
    params = parse_qs(query_string, keep_blank_values=True)
    raw = params.get("query", ["true"])[0]
    if raw == "true":
        return None  # always-true
    try:
        return json.loads(base64.b64decode(unquote(raw)).decode("utf-8"))
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"Invalid websocket query {raw!r} (base64)") from e


class WebSocketPubSub:
    """Bind a :class:`PubSubBridge` to a websocket port."""

    def __init__(self, bridge: PubSubBridge, host: str = "127.0.0.1", port: int = 0):
        self.bridge = bridge
        ws = self

        class _Conn(socketserver.BaseRequestHandler):
            def handle(self):
                sock = self.request
                sub_id = None
                try:
                    head = b""
                    while b"\r\n\r\n" not in head:
                        chunk = sock.recv(4096)
                        if not chunk:
                            return
                        head += chunk
                    # a client may pipeline its first frame with the
                    # handshake bytes — keep everything past the
                    # terminator and seed the read loop with it
                    head, _, pipelined = head.partition(b"\r\n\r\n")
                    request_line, *header_lines = head.split(b"\r\n")
                    method, target, _ = request_line.decode("latin-1").split(" ", 2)
                    headers = {}
                    for ln in header_lines:
                        if b":" in ln:
                            k, v = ln.decode("latin-1").split(":", 1)
                            headers[k.strip().lower()] = v.strip()
                    parts = urlsplit(target)
                    path_parts = [p for p in parts.path.split("/") if p]
                    key = headers.get("sec-websocket-key")
                    if (
                        method != "GET"
                        or key is None
                        or "websocket" not in headers.get("upgrade", "").lower()
                    ):
                        sock.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                        return
                    if len(path_parts) != 2 or path_parts[0] != "channel":
                        # unknown path: complete the handshake then close,
                        # like the reference (websocket.clj:92-95)
                        sock.sendall(_handshake_bytes(key))
                        sock.sendall(bytes([0x88, 0x00]))  # close frame
                        return
                    channel = path_parts[1]
                    cond = parse_query_condition(parts.query)
                    sock.sendall(_handshake_bytes(key))
                    send_lock = threading.Lock()

                    def send(line: str):
                        with send_lock:
                            sock.sendall(text_frame(line))

                    sub_id = ws.bridge.add(channel, cond, send)
                    self._read_loop(sock, send_lock, pipelined)
                except Exception:  # noqa: BLE001 - connection teardown
                    _LOG.debug("websocket connection error", exc_info=True)
                finally:
                    if sub_id is not None:
                        ws.bridge.rm(sub_id)

            def _read_loop(self, sock, send_lock, buf=b""):
                """Consume client frames: pong pings, exit on close.
                ``buf`` seeds bytes pipelined after the handshake."""
                while True:
                    while True:
                        frame = _parse_client_frame(buf)
                        if frame is None:
                            break
                        opcode, payload, buf = frame
                        if opcode == 0x8:  # close
                            with send_lock:
                                sock.sendall(bytes([0x88, 0x00]))
                            return
                        if opcode == 0x9:  # ping → pong
                            with send_lock:
                                sock.sendall(
                                    bytes([0x8A, len(payload)]) + payload
                                )
                    chunk = sock.recv(4096)
                    if not chunk:
                        return
                    buf += chunk

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Conn)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "WebSocketPubSub":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="mirabelle-ws", daemon=True
        )
        self._thread.start()
        _LOG.info("websocket pub/sub listening on port %d", self.port)
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def _handshake_bytes(client_key: str) -> bytes:
    return (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(client_key)}\r\n"
        "\r\n"
    ).encode("latin-1")


def _parse_client_frame(buf: bytes):
    """Parse one masked client frame; returns (opcode, payload, rest)
    or None if incomplete. Raises on unmasked client frames (RFC
    6455 §5.1 requires the server to fail the connection)."""
    if len(buf) < 2:
        return None
    opcode = buf[0] & 0x0F
    masked = buf[1] & 0x80
    ln = buf[1] & 0x7F
    i = 2
    if ln == 126:
        if len(buf) < 4:
            return None
        ln = int.from_bytes(buf[2:4], "big")
        i = 4
    elif ln == 127:
        if len(buf) < 10:
            return None
        ln = int.from_bytes(buf[2:10], "big")
        i = 10
    if not masked:
        raise ValueError("client frames must be masked (RFC 6455 §5.1)")
    if len(buf) < i + 4 + ln:
        return None
    mask = buf[i : i + 4]
    raw = buf[i + 4 : i + 4 + ln]
    payload = bytes(b ^ mask[j % 4] for j, b in enumerate(raw))
    return opcode, payload, buf[i + 4 + ln :]
