#!/usr/bin/env python
"""Sustained control-plane soak (VERDICT r7 ask #7).

Three named streams behind one StreamHandler, a live Riemann TCP
edge in front (4-byte-framed protobuf Msg, per-event `stream`
attribute routing), N events pushed through real sockets from three
concurrent clients, and ONE mid-run `reload` that recompiles only
the changed stream (stream.clj:129-143: untouched streams keep their
state; the reloaded one resumes from its checkpoint, so its counts
must still include pre-reload events).

Zero-loss criterion: per-stream SUM(metric) and COUNT in the memory
sinks equal exactly what the clients sent — across the reload window
and the file-source staging path.

Usage:
  python tools/soak_control_plane.py [--events 1000000] [--cpus 16]
      [--batch 10000]

Prints one JSON line with per-stream counts, ev/s for the socket
edge (send→ack, includes client-side encode + server pure-python
wire decode + routing) and end-to-end (first byte → all queries
drained), plus the reload diff.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import struct
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# -- minimal client-side protobuf Msg encode (mirrors the wire the
# reference's clients speak; the server decodes via riemann_wire) --


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(fnum: int, wtype: int) -> bytes:
    return _varint((fnum << 3) | wtype)


def _pb_str(fnum: int, s: str) -> bytes:
    b = s.encode()
    return _key(fnum, 2) + _varint(len(b)) + b


def _pb_len(fnum: int, payload: bytes) -> bytes:
    return _key(fnum, 2) + _varint(len(payload)) + payload


def event_bytes(service: str, metric: int, time_s: int, stream: str) -> bytes:
    ev = (
        _key(1, 0) + _varint(time_s)
        + _pb_str(3, service)
        + _key(13, 0) + _varint(metric << 1)  # zigzag(+metric)
    )
    attr = _pb_str(1, "stream") + _pb_str(2, stream)
    return ev + _pb_len(9, attr)


def read_frame(sock) -> bytes:
    head = b""
    while len(head) < 4:
        chunk = sock.recv(4 - len(head))
        if not chunk:
            raise ConnectionError("edge closed")
        head += chunk
    (n,) = struct.unpack(">I", head)
    body = b""
    while len(body) < n:
        body += sock.recv(n - len(body))
    return body


def run_soak(spark, events: int, batch: int, reloads: int = 1) -> dict:
    """The soak as a callable (pytest runs it small; main() runs it
    at 1M+): returns the summary dict printed by the CLI.
    ``reloads`` mid-run reloads fire from the soak2 client at even
    fractions of its send volume (rev bumps 2, 3, ...), each
    touching only soak2 — r9 runs 10M events / 2 reloads (VERDICT
    r8 ask #7)."""
    from pyspark.sql import functions as F

    from mirabelle_spark import streaming as stx
    from mirabelle_spark.streaming import RiemannTcpServer, StreamHandler

    class args:  # noqa: N801 - mirrors the CLI namespace
        pass

    args.events, args.batch = events, batch
    work = tempfile.mkdtemp(prefix="soak_cp_")
    schema = "time_s bigint, service string, metric_sint64 bigint"

    def compile_fn(sp, name, config):
        src = stx.file_source(sp, handler.ingest_dir(name), schema)
        return src.groupBy("service").agg(
            F.sum("metric_sint64").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )

    handler = StreamHandler(
        spark, os.path.join(work, "ck"), compile_fn,
        output_mode="complete", ingest_root=os.path.join(work, "in"),
    )
    streams = ["soak1", "soak2", "soak3"]
    configs = {n: {"rev": 1} for n in streams}
    for n in streams:
        handler.add_stream(n, configs[n])
    srv = RiemannTcpServer(handler, default_stream=streams[0]).start()

    per_stream = args.events // len(streams)
    sent = {n: 0 for n in streams}
    sent_lock = threading.Lock()
    marks = [per_stream * (i + 1) // (reloads + 1) for i in range(reloads)]
    fired = [threading.Event() for _ in marks]
    reload_diffs: list[dict] = []
    t_first = [None]

    def client(stream_name: str):
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=120)
        pushed = 0
        while pushed < per_stream:
            n = min(args.batch, per_stream - pushed)
            frame = b"".join(
                _pb_len(6, event_bytes(
                    f"svc{(pushed + i) % 8}", 1, 1_700_000_000 + pushed + i,
                    stream_name,
                ))
                for i in range(n)
            )
            if t_first[0] is None:
                t_first[0] = time.monotonic()
            s.sendall(struct.pack(">I", len(frame)) + frame)
            ack = read_frame(s)
            assert ack == b"\x10\x01", ack
            pushed += n
            with sent_lock:
                sent[stream_name] += n
            # mid-run reloads, fired from the soak2 client at even
            # send-volume fractions: soak2's config changes
            # (to_reload), the other two streams must not be touched
            if stream_name == "soak2":
                for ridx, mark in enumerate(marks):
                    if pushed >= mark and not fired[ridx].is_set():
                        fired[ridx].set()
                        new_cfg = {**configs, "soak2": {"rev": 2 + ridx}}
                        configs.update(new_cfg)
                        reload_diffs.append(handler.reload(new_cfg))
        s.close()

    t0 = time.monotonic()
    threads = [threading.Thread(target=client, args=(n,)) for n in streams]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    t_acked = time.monotonic()
    handler.process_all()
    t_drained = time.monotonic()

    results = {}
    lost = 0
    for n in streams:
        rows = spark.sql(f"select * from {n}").collect()
        total = sum(r.total for r in rows)
        cnt = sum(r.n for r in rows)
        results[n] = {"sent": sent[n], "count": int(cnt), "sum": int(total)}
        lost += sent[n] - cnt
    srv.stop()
    stops = handler.stop_all()

    def _jsonable(diff: dict) -> dict:
        return {k: sorted(v) if isinstance(v, set) else v
                for k, v in diff.items()}

    edge_s = t_acked - (t_first[0] or t0)
    e2e_s = t_drained - (t_first[0] or t0)
    total_sent = sum(sent.values())
    return {
        "events": total_sent,
        "streams": results,
        "lost": int(lost),
        "reload": _jsonable(reload_diffs[0]) if reload_diffs else {},
        "reloads": [_jsonable(d) for d in reload_diffs],
        "clean_stops": all(s["terminated"] for s in stops.values()),
        "edge_sec": round(edge_s, 2),
        "edge_ev_per_s": int(total_sent / edge_s),
        "e2e_sec": round(e2e_s, 2),
        "e2e_ev_per_s": int(total_sent / e2e_s),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--reloads", type=int, default=1)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    args = ap.parse_args()
    os.environ.setdefault("SPARK_GRAFT_SILENT", "1")
    from mirabelle_spark.session import get_spark

    spark = get_spark("soak_control_plane", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run_soak(spark, args.events, args.batch,
                              reloads=args.reloads)))


if __name__ == "__main__":
    main()
