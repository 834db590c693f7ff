"""Output layer (SURVEY §2.2) — batch realizations.

The reference dispatches events to named output components
(stream.clj:69-115); all outputs are auto-discarded in test mode
(action.clj:690-699). Here an output is a callable
``DataFrame -> None`` registered by name; streaming queries reach
the same callables through ``foreachBatch``.

Network outputs (elasticsearch `_bulk`, pagerduty events API,
prometheus remote-write) shape their payloads fully distributed
(JVM ``to_json``) and deliver executor-side over real HTTP
(stdlib urllib via ``http_transport`` — N partitions post in
parallel, the scale path). ``transport=`` stays injectable for
tests and for exotic clients; external-network egress is still
unavailable in this container, so the pytest coverage drives the
sinks against a local fake endpoint.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger("mirabelle_spark")

_OUTPUTS: dict[str, Callable[[DataFrame], None]] = {}


def register_output(name: str, fn: Callable[[DataFrame], None]) -> None:
    """Register a named output (the reference's config :outputs map +
    :type :custom builder surface, stream.clj:78-83)."""
    _OUTPUTS[name] = fn


def drop_discarded(df: DataFrame) -> DataFrame:
    """Events tagged ``mirabelle/discard`` are invisible to every
    side-effecting action — outputs, publish!, the log actions —
    while still flowing through the stream itself and its taps
    (howto/stream/_index.md:757-759). Null-safe: untagged rows
    (tags NULL) pass."""
    if "tags" not in df.columns:
        return df
    return df.filter(
        ~F.coalesce(
            F.array_contains(F.col("tags"), "mirabelle/discard"), F.lit(False)
        )
    )


def output(df: DataFrame, name: str, test_mode: bool = False) -> None:
    """``output!`` (action.clj:690-719): route rows to a configured
    output; no-op in test mode; ``mirabelle/discard``-tagged events
    never reach the output."""
    if test_mode:
        return
    if name not in _OUTPUTS:
        raise KeyError(f"unknown output {name!r}")
    _OUTPUTS[name](drop_discarded(df))


def file_sink(
    df: DataFrame,
    base_path: str,
    partition_fields: Sequence[str] = (),
    date_pattern: str | None = None,
    time_col: str = "time",
) -> None:
    """JSON-lines file output with field/date-templated paths
    (output/file.clj:10-50). The reference interpolates event fields
    + a date pattern into one file path; the distributed equivalent
    is partitionBy directories — same layout, parallel writers."""
    out = drop_discarded(df)
    parts = list(partition_fields)
    if date_pattern:
        out = out.withColumn("__date__", F.date_format(F.col(time_col), date_pattern))
        parts.append("__date__")
    writer = out.write.mode("append")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.json(base_path)


def tap(df: DataFrame, store: dict, name: str) -> DataFrame:
    """Test capture (action.clj:1724-1751): record the DataFrame
    under ``name`` and pass it through."""
    store[name] = df
    return df


def debug(df: DataFrame, level: str = "debug", limit: int = 20) -> DataFrame:
    """debug/info/error logging actions (action.clj:177-230): log
    rows as JSON at the given level, pass the stream through —
    unchanged, including ``mirabelle/discard``-tagged rows, which
    are only hidden from the log itself."""
    rows = drop_discarded(df).limit(limit).toJSON().collect()
    for r in rows:
        getattr(log, level if level != "error" else "error")(r)
    return df


def plan_dot(df: DataFrame) -> str:
    """Plan export (graphviz.clj:16-78 analog): render the optimized
    plan tree as graphviz dot."""
    plan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001
    lines = plan.toString().rstrip().split("\n")
    nodes, edges = [], []
    stack: list[tuple[int, int]] = []  # (depth, node_id)
    for i, line in enumerate(lines):
        stripped = line.lstrip(" :+-")
        depth = (len(line) - len(stripped)) // 3
        label = stripped.split("(")[0].strip()[:60].replace('"', "'")
        nodes.append(f'  n{i} [label="{label}"];')
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            edges.append(f"  n{stack[-1][1]} -> n{i};")
        stack.append((depth, i))
    return "digraph plan {\n" + "\n".join(nodes + edges) + "\n}\n"


# -- network outputs (JVM shaping + executor-side HTTP delivery) -----------


def http_transport(
    url: str, headers: dict | None = None, timeout_s: float = 5.0
) -> Callable[[bytes, str], int]:
    """POST bytes to a fixed URL (stdlib urllib). The returned
    closure is cloudpickle-safe, so it ships to executors — each
    partition opens its own connections (the reference's single
    RestClient is the single-node analog of this fan-out)."""

    def post(body: bytes, content_type: str = "application/json") -> int:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=body,
            method="POST",
            headers={"Content-Type": content_type, **(headers or {})},
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status

    return post


def elasticsearch_sink(
    df: DataFrame,
    index_prefix: str,
    url: str | None = None,
    transport: Callable[[bytes, str], int] | None = None,
    time_col: str = "time",
    batch_size: int = 1000,
    date_pattern: str = "yyyy-MM-dd",
    headers: dict | None = None,
) -> None:
    """ES bulk output (output/elasticsearch.clj:125-177).

    Each row becomes the bulk action/doc ndjson pair —
    ``{"index":{"_index":"prefix-yyyy-MM-dd"}}\\n{doc}`` with the
    reference's field rules (daily index from event time, ``time``
    dropped, ``@timestamp`` added) — built entirely JVM-side with
    ``to_json``. Delivery is ``foreachPartition``: every partition
    posts its own ndjson chunks of ``batch_size`` docs to
    ``{url}/_bulk``, in parallel across executors. ``headers``
    carries auth (the reference's Bearer/ApiKey defaults)."""
    # The reference pins formatting to UTC (output/elasticsearch.clj
    # format-event, ZoneOffset/UTC); date_format renders in the
    # session tz, so shift the instant's wall-clock to UTC first —
    # otherwise events near midnight route to the wrong daily index
    # on a non-UTC session.
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    utc_ts = F.to_utc_timestamp(F.col(time_col).cast("timestamp"), session_tz)
    index = F.concat(
        F.lit(index_prefix + "-"), F.date_format(utc_ts, date_pattern)
    )
    action = F.to_json(
        F.struct(F.struct(F.col("__index__").alias("_index")).alias("index"))
    )
    doc_cols = [c for c in df.columns if c != time_col]
    doc = F.to_json(
        F.struct(
            *[F.col(c) for c in doc_cols],
            F.date_format(
                utc_ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
            ).alias("@timestamp"),
        )
    )
    lines = df.withColumn("__index__", index).select(
        F.concat_ws("\n", action, doc).alias("line")
    )
    if transport is None:
        if url is None:
            raise NotImplementedError(
                "pass url= (posts to {url}/_bulk) or transport=(body, ctype)->status"
            )
        transport = http_transport(url.rstrip("/") + "/_bulk", headers)

    def send_partition(rows):
        batch: list[str] = []

        def flush():
            if batch:
                transport(
                    ("\n".join(batch) + "\n").encode("utf-8"),
                    "application/x-ndjson",
                )
                batch.clear()

        for r in rows:
            batch.append(r["line"])
            if len(batch) >= batch_size:
                flush()
        flush()

    lines.foreachPartition(send_partition)


def pagerduty_sink(
    df: DataFrame,
    routing_key: str,
    url: str = "https://events.pagerduty.com/v2/enqueue",
    transport: Callable[[bytes, str], int] | None = None,
    source_key: str = "host",
    summary_keys: Sequence[str] = ("host", "service", "state"),
    dedup_keys: Sequence[str] = ("host", "service"),
    state_col: str = "state",
    time_col: str = "time",
    headers: dict | None = None,
) -> None:
    """PagerDuty Events-v2 output (output/pagerduty.clj:44-111).

    The full request body is built JVM-side per alert: event_action
    from state (critical → trigger, ok → resolve, else trigger,
    pagerduty.clj:103-110), severity (ok → info, else the state or
    "critical"), summary = summary-keys joined " - ", dedup_key =
    dedup-keys joined "-", custom_details = the whole event.
    Delivery is one POST per alert from ``foreachPartition`` — the
    v2 enqueue API is per-event and alert volume is human-scale."""
    action = (
        F.when(F.col(state_col) == "critical", "trigger")
        .when(F.col(state_col) == "ok", "resolve")
        .otherwise("trigger")
    )
    severity = F.when(F.col(state_col) == "ok", "info").otherwise(
        F.coalesce(F.col(state_col), F.lit("critical"))
    )
    payload = F.struct(
        F.concat_ws(" - ", *[F.col(k) for k in summary_keys]).alias("summary"),
        F.col(source_key).alias("source"),
        severity.alias("severity"),
        F.date_format(F.col(time_col), "yyyy-MM-dd'T'HH:mm:ssXXX").alias(
            "timestamp"
        ),
        F.struct(*[F.col(c) for c in df.columns]).alias("custom_details"),
    )
    body = F.to_json(
        F.struct(
            F.lit(routing_key).alias("routing_key"),
            action.alias("event_action"),
            F.concat_ws("-", *[F.col(k) for k in dedup_keys]).alias("dedup_key"),
            payload.alias("payload"),
        )
    )
    shaped = df.select(body.alias("body"))
    if transport is None:
        transport = http_transport(url, headers)

    def send_partition(rows):
        for r in rows:
            transport(r["body"].encode("utf-8"), "application/json")

    shaped.foreachPartition(send_partition)


def prometheus_remote_write_shape(
    df: DataFrame,
    name_col: str = "name",
    metric_col: str = "metric",
    time_col: str = "time",
    attrs_col: str = "attributes",
) -> DataFrame:
    """Prometheus remote-write OUTPUT shape (prometheus.clj:32-65 +
    batcher output/batch.clj:12-68): group events into
    WriteRequest-shaped rows — one timeseries per label set with its
    samples (value, ms timestamp). The snappy+protobuf encode and
    POST belong to the injected transport; in streaming the batcher
    is `trigger(processingTime='5 seconds')` (Spark IS the batcher)."""
    labels = F.map_concat(
        F.create_map(F.lit("__name__"), F.col(name_col)),
        F.coalesce(F.col(attrs_col), F.create_map().cast("map<string,string>")),
    )
    keyed = df.select(
        labels.alias("__labels__"),
        F.struct(
            F.col(metric_col).alias("value"),
            (F.unix_micros(F.col(time_col)) / F.lit(1000)).cast("bigint").alias(
                "timestamp"
            ),
        ).alias("__sample__"),
    )
    return keyed.groupBy("__labels__").agg(
        F.sort_array(F.collect_list("__sample__")).alias("samples")
    ).select(
        F.map_entries("__labels__").alias("labels"), "samples"
    )


# -- pub/sub (publish!, action.clj:1983-2005 + pubsub.clj:5-30) -------------

_CHANNELS: dict[str, list] = {}


class PubSubBridge:
    """Websocket pub/sub edge (transport/websocket.clj:47-119), minus
    the socket: subscribers register a CHANNEL + a condition vector
    (the reference's base64-EDN ``?query=`` param) + a ``send``
    callable (the injected transport — a real deployment passes the
    websocket write; tests pass a list appender). Published batches
    are filtered per subscriber with the same condition compiler as
    ``where`` and delivered as JSON strings.

    Streaming: :meth:`stream_sink` attaches the dispatch as a
    ``foreachBatch`` sink. The per-subscriber collect is driver-side
    BY DESIGN — this is the egress edge (alert-rate traffic), not a
    data-plane operator; the filter itself still runs distributed
    before anything reaches the driver.
    """

    def __init__(self):
        self._subs: dict[int, tuple[str, object, Callable[[str], None]]] = {}
        self._next = 0

    def add(self, channel: str, condition, send: Callable[[str], None]) -> int:
        """pubsub/add: returns a subscription id (websocket.clj:66-77)."""
        from mirabelle_spark.conditions import compile_condition

        col = compile_condition(condition) if condition is not None else None
        sub_id = self._next
        self._next += 1
        self._subs[sub_id] = (channel, col, send)
        log.info("New websocket subscription %s %s", channel, sub_id)
        return sub_id

    def rm(self, sub_id: int) -> None:
        """pubsub/rm (the on-close action, websocket.clj:73-77)."""
        self._subs.pop(sub_id, None)

    def dispatch(self, df: DataFrame, channel: str) -> None:
        """Publish one batch to every subscriber of ``channel``."""
        for channel_s, cond, send in list(self._subs.values()):
            if channel_s != channel:
                continue
            part = df.filter(cond) if cond is not None else df
            for line in part.toJSON().collect():
                send(line)

    def stream_sink(self, df: DataFrame, channel: str, checkpoint: str | None = None):
        """Attach the bridge to a streaming DataFrame (foreachBatch)."""
        w = df.writeStream.foreachBatch(
            lambda batch, _epoch: self.dispatch(batch, channel)
        )
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.trigger(availableNow=True).start()


def publish(df: DataFrame, channel: str, test_mode: bool = False) -> None:
    """``publish!``: push the batch to an in-memory channel; no-op in
    test mode (the reference discards publish in tests too). The
    websocket layer of the reference is out of engine scope — a
    subscriber here is any consumer of :func:`subscribe`.
    ``mirabelle/discard``-tagged events are never published."""
    if test_mode:
        return
    _CHANNELS.setdefault(channel, []).append(drop_discarded(df))


def subscribe(channel: str, condition=None) -> list[DataFrame]:
    """Read a channel's published batches, optionally filtered by a
    condition vector (the `?query=<condition>` websocket filter,
    transport/websocket.clj:47-60)."""
    from mirabelle_spark.conditions import compile_condition

    batches = _CHANNELS.get(channel, [])
    if condition is None:
        return list(batches)
    c = compile_condition(condition)
    return [b.filter(c) for b in batches]


# -- prometheus remote-write wire encode (stdlib only) ----------------------


def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(fnum: int, wtype: int) -> bytes:
    return _pb_varint((fnum << 3) | wtype)


def _pb_bytes(fnum: int, payload: bytes) -> bytes:
    return _pb_field(fnum, 2) + _pb_varint(len(payload)) + payload


def encode_write_request(series: list[tuple[list[tuple[str, str]], list[tuple[float, int]]]]) -> bytes:
    """Prometheus ``WriteRequest`` proto2 wire bytes, hand-encoded
    (the public prometheus/prompb schema: WriteRequest.timeseries=1;
    TimeSeries.labels=1, .samples=2; Label.name=1, .value=2;
    Sample.value=1 (double), .timestamp=2 (ms varint)). Labels are
    sorted by name — required by the remote-write spec."""
    import struct as _struct

    out = bytearray()
    for labels, samples in series:
        ts = bytearray()
        for name, value in sorted(labels):
            lab = _pb_bytes(1, name.encode("utf-8")) + _pb_bytes(
                2, value.encode("utf-8")
            )
            ts += _pb_bytes(1, lab)
        for value, timestamp_ms in samples:
            smp = (
                _pb_field(1, 1)
                + _struct.pack("<d", float(value))
                + _pb_field(2, 0)
                + _pb_varint(int(timestamp_ms) & ((1 << 64) - 1))
            )
            ts += _pb_bytes(2, smp)
        out += _pb_bytes(1, bytes(ts))
    return bytes(out)


def snappy_frame(data: bytes) -> bytes:
    """Spec-valid snappy block encoding using only LITERAL elements
    (format_description.txt: preamble = uncompressed-length varint,
    then elements; literal tag low bits 00). Every decoder accepts
    it; ratio 1.0 — correctness-first, no C extension needed. The
    remote-write spec requires snappy block format, and this IS one.
    """
    out = bytearray(_pb_varint(len(data)))
    i = 0
    while i < len(data):
        chunk = data[i : i + 65536]
        n = len(chunk)
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 0xFF:
            out.append(60 << 2)
            out += (n - 1).to_bytes(1, "little")
        else:
            out.append(61 << 2)
            out += (n - 1).to_bytes(2, "little")
        out += chunk
        i += n
    return bytes(out)


def prometheus_remote_write_sink(
    df: DataFrame,
    url: str,
    transport: Callable[[bytes, str], int] | None = None,
    name_col: str = "name",
    metric_col: str = "metric",
    time_col: str = "time",
    attrs_col: str = "attributes",
    batch_size: int = 1000,
    headers: dict | None = None,
) -> None:
    """Prometheus remote-write output, wire-level
    (output/prometheus.clj:18-71 + prometheus.clj:32-65): events
    group into one timeseries per label set (__name__ from the name
    column, labels from attributes) with ms-timestamp samples — the
    grouping runs distributed (`prometheus_remote_write_shape`);
    each partition then encodes real WriteRequest protobuf, wraps it
    in snappy block framing, and POSTs with the remote-write
    headers. The reference batches 1000 events / 5 s
    (output/batch.clj); here the partition is the batch, and in
    streaming `trigger(processingTime='5 seconds')` is the timer."""
    shaped = prometheus_remote_write_shape(
        df, name_col=name_col, metric_col=metric_col,
        time_col=time_col, attrs_col=attrs_col,
    )
    if transport is None:
        transport = http_transport(
            url,
            {
                "Content-Encoding": "snappy",
                "X-Prometheus-Remote-Write-Version": "0.1.0",
                **(headers or {}),
            },
        )

    def send_partition(rows):
        batch: list = []
        n_samples = 0

        def flush():
            nonlocal n_samples
            if batch:
                transport(
                    snappy_frame(encode_write_request(batch)),
                    "application/x-protobuf",
                )
                batch.clear()
                n_samples = 0

        for r in rows:
            labels = [(e["key"], e["value"]) for e in r["labels"]]
            samples = [(s["value"], s["timestamp"]) for s in r["samples"]]
            batch.append((labels, samples))
            n_samples += len(samples)
            if n_samples >= batch_size:
                flush()
        flush()

    shaped.foreachPartition(send_partition)
