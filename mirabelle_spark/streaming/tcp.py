"""Live TCP ingest edge for Riemann protobuf clients.

The reference's TCP server (transport/tcp.clj:37-64,149-240) is a
Netty pipeline: 4-byte length-field frame decoder → protobuf ``Msg``
decode → handler that pushes each event into the stream named by the
event's ``:stream`` attribute (``:default`` otherwise) and replies
with an encoded ``{:ok true}`` ``Msg``. This is the same edge as a
stdlib threaded socket server — the thin stateless bridge in front
of the Spark data plane, composing :mod:`riemann_wire` the way the
websocket edge composes RFC 6455:

- frame: 4-byte big-endian length prefix + ``Msg`` payload
- decode: :func:`mirabelle_spark.riemann_wire.decode_msg` (pure
  stdlib proto2 wire parse)
- route: per-event ``stream`` attribute → that stream's ingest dir
  via ``StreamHandler.push_events`` (the running file source picks
  the batch up as the next micro-batch)
- ack: ``Msg{ok: true}`` wire bytes (field 2 varint), also
  length-prefixed; decode/route failures answer
  ``Msg{ok: false, error: ...}`` like the reference's error reply.

Heavy decode at scale stays distributed (`riemann_wire_events` over
Kafka); this edge exists for protocol-parity ingest of live
clients.
"""

from __future__ import annotations

import logging
import socketserver
import ssl
import struct
import threading

from mirabelle_spark.riemann_wire import decode_msg

_LOG = logging.getLogger("mirabelle_spark.streaming.tcp")


def server_ssl_context(
    key: str, cert: str, cacert: str | None = None, mtls: bool = True
) -> ssl.SSLContext:
    """TLS context for the ingest edge (transport/tcp.clj:110-129 —
    ``ssl/ssl-context key cert cacert`` + ``setNeedClientAuth true``).

    The reference enables TLS when key+cert+cacert are all present and
    always demands a client certificate; ``mtls=False`` relaxes that
    for server-auth-only deployments (a superset of the reference).
    """
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile=cert, keyfile=key)
    if cacert is not None:
        ctx.load_verify_locations(cafile=cacert)
    if mtls:
        ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx

OK_MSG = b"\x10\x01"  # Msg{ok: true}: field 2, varint 1


def error_msg(text: str) -> bytes:
    """Msg{ok: false, error: text} wire bytes."""
    b = text.encode("utf-8")
    if len(b) >= 0x80:  # keep the varint single-byte; truncate long errors
        # re-decode with errors="ignore" so the cut never splits a
        # multi-byte UTF-8 sequence (protobuf strings must be valid UTF-8)
        b = b[:127].decode("utf-8", "ignore").encode("utf-8")
    return b"\x10\x00" + b"\x1a" + bytes([len(b)]) + b


def _frame(payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + payload


class RiemannTcpServer:
    """Bind a :class:`StreamHandler` to a Riemann TCP port."""

    def __init__(
        self,
        handler,
        default_stream: str = "default",
        host: str = "127.0.0.1",
        port: int = 0,
        max_frame: int = 64 * 1024 * 1024,
        ssl_context: ssl.SSLContext | None = None,
    ):
        self.handler = handler
        srv = self

        class _Conn(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    head = self.rfile.read(4)
                    if len(head) < 4:
                        return  # client closed
                    (n,) = struct.unpack(">I", head)
                    if n > max_frame:
                        self.wfile.write(_frame(error_msg("frame too large")))
                        return
                    payload = self.rfile.read(n)
                    if len(payload) < n:
                        return  # truncated: connection died mid-frame
                    try:
                        events = decode_msg(payload)
                        srv._route(events)
                    except Exception as e:  # noqa: BLE001 - reply, don't kill thread
                        _LOG.warning("riemann tcp frame rejected: %s", e)
                        self.wfile.write(_frame(error_msg(str(e))))
                        continue
                    self.wfile.write(_frame(OK_MSG))

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

            def get_request(self):
                # TLS termination per accepted connection, the stdlib
                # analogue of Netty's per-channel SslHandler
                # (transport/tcp.clj:110-120, build-initializer ssl arm).
                sock, addr = super().get_request()
                if ssl_context is not None:
                    # handshake deferred to the per-connection thread's
                    # first read — a slow client must not stall the
                    # accept loop (Netty handshakes on the channel's own
                    # event loop for the same reason)
                    sock = ssl_context.wrap_socket(
                        sock, server_side=True, do_handshake_on_connect=False
                    )
                return sock, addr

            def handle_error(self, request, client_address):
                # a failed TLS handshake (bad/missing client cert,
                # plaintext client on a TLS port) must not spam stderr
                # or kill the accept loop
                _LOG.warning(
                    "connection error from %s", client_address, exc_info=True
                )

        self._server = _Server((host, port), _Conn)
        self._thread: threading.Thread | None = None
        self._default = default_stream

    def _route(self, events: list[dict]) -> None:
        """Group events by their ``stream`` attribute (gen-tcp-handler:
        ``(or (keyword (:stream event)) :default)``) and push each
        group into its stream's ingest dir."""
        by_stream: dict[str, list[dict]] = {}
        for ev in events:
            target = self._default
            for att in ev.get("attributes") or []:
                if att.get("key") == "stream" and att.get("value"):
                    target = att["value"]
                    break
            by_stream.setdefault(target, []).append(ev)
        for name, evs in by_stream.items():
            self.handler.push_events(name, evs)

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "RiemannTcpServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="mirabelle-tcp", daemon=True
        )
        self._thread.start()
        _LOG.info("riemann tcp server listening on port %d", self.port)
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=10)
