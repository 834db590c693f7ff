"""Ingest decoders (SURVEY §2.1) — the wire-format → event mappings.

The reference runs network servers (Netty TCP, HTTP) and decodes
protobuf in Java; a Spark engine ingests the same payloads from
Kafka/file sources where each wire message is already a nested row
(`from_protobuf()` upstream, or the JSON forms of the same shapes).
What these functions own is the semantic mapping — which fields land
where in the event model — expressed as pure Catalyst explodes and
projections, exactly mirroring the reference decoders cited below.

No network listeners here by design: on a cluster, the TCP/HTTP edge
is a thin stateless bridge into Kafka, and the heavy decode +
flatten runs distributed in these functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Expected nested shapes (documented DDL, used by tests):

RIEMANN_MSG_SCHEMA = (
    "events ARRAY<STRUCT<host STRING, service STRING, state STRING, "
    "description STRING, tags ARRAY<STRING>, ttl DOUBLE, "
    "time_s BIGINT, time_micros BIGINT, "
    "metric_sint64 BIGINT, metric_d DOUBLE, metric_f FLOAT, "
    "attributes ARRAY<STRUCT<key STRING, value STRING>>>>"
)

PROM_WRITE_REQUEST_SCHEMA = (
    "timeseries ARRAY<STRUCT<"
    "labels ARRAY<STRUCT<name STRING, value STRING>>, "
    "samples ARRAY<STRUCT<value DOUBLE, timestamp BIGINT>>>>"
)

OTEL_TRACES_SCHEMA = (
    "resource_spans ARRAY<STRUCT<"
    "resource STRUCT<attributes ARRAY<STRUCT<key STRING, value STRING>>>, "
    "schema_url STRING, "
    "scope_spans ARRAY<STRUCT<scope STRUCT<name STRING, version STRING>, "
    "spans ARRAY<STRUCT<trace_id STRING, span_id STRING, parent_span_id STRING, "
    "name STRING, kind INT, start_time_unix_nano BIGINT, end_time_unix_nano BIGINT, "
    "status STRUCT<code INT, message STRING>, "
    "attributes ARRAY<STRUCT<key STRING, value STRING>>, "
    "events ARRAY<STRUCT<time_unix_nano BIGINT, name STRING, "
    "attributes ARRAY<STRUCT<key STRING, value STRING>>, "
    "dropped_attributes_count INT>>, "
    "dropped_events_count INT, "
    "links ARRAY<STRUCT<trace_id STRING, span_id STRING, trace_state STRING, "
    "attributes ARRAY<STRUCT<key STRING, value STRING>>, "
    "dropped_attributes_count INT>>, "
    "dropped_links_count INT>>>>>>"
)

_OTEL_KINDS = {
    0: "unspecified", 1: "internal", 2: "server",
    3: "client", 4: "producer", 5: "consumer",
}
_OTEL_STATUS = {0: "unset", 1: "ok", 2: "error"}


def riemann_events(df: DataFrame) -> DataFrame:
    """Riemann protobuf Msg → events (transport/codec.clj:40-63).

    Mapping pinned to the reference decoder:
    - metric union prefers sint64, then double, then float
      (``decode-pb-metric``, codec.clj:12-19)
    - host lands under attributes.host (codec.clj:44-45)
    - time: µs field over s field, else null (the caller stamps
      receive-time, transport.clj:32-43; note the reference's TCP
      path drops proto time entirely — we keep it, documented
      divergence in its favor)
    """
    e = F.explode(F.col("events")).alias("e")
    ev = df.select(e)
    metric = F.coalesce(
        F.col("e.metric_sint64").cast("double"),
        F.col("e.metric_d"),
        F.col("e.metric_f").cast("double"),
    )
    time_us = F.coalesce(F.col("e.time_micros"), F.col("e.time_s") * 1_000_000)
    attrs = F.map_concat(
        F.when(
            F.col("e.host").isNotNull(), F.create_map(F.lit("host"), F.col("e.host"))
        ).otherwise(F.create_map().cast("map<string,string>")),
        F.coalesce(
            F.map_from_entries(F.col("e.attributes")),
            F.create_map().cast("map<string,string>"),
        ),
    )
    return ev.select(
        F.col("e.service").alias("service"),
        F.col("e.state").alias("state"),
        F.col("e.description").alias("description"),
        F.col("e.tags").alias("tags"),
        F.col("e.ttl").alias("ttl"),
        F.timestamp_micros(time_us).alias("time"),
        metric.alias("metric"),
        attrs.alias("attributes"),
    )


def prometheus_remote_write(df: DataFrame) -> DataFrame:
    """Prometheus WriteRequest → one event per sample
    (prometheus.clj:11-29): ``__name__`` label → name, remaining
    labels → attributes, ms timestamp → event time, value → metric."""
    series = df.select(F.explode(F.col("timeseries")).alias("s"))
    labels = F.map_from_entries(F.col("s.labels"))
    flat = series.select(
        labels.alias("__labels__"), F.explode(F.col("s.samples")).alias("smp")
    )
    return flat.select(
        F.element_at(F.col("__labels__"), "__name__").alias("name"),
        F.map_filter(F.col("__labels__"), lambda k, v: k != "__name__").alias(
            "attributes"
        ),
        F.col("smp.value").alias("metric"),
        F.timestamp_millis(F.col("smp.timestamp")).alias("time"),
    )


def fluentbit_logs(df: DataFrame, time_col: str = "date") -> DataFrame:
    """Fluent Bit log records (handler.clj:89-95): the ``date``
    field (epoch seconds, possibly fractional) becomes the event
    time; everything else passes through."""
    out = df.withColumn(
        "time", F.timestamp_micros((F.col(time_col) * 1_000_000).cast("bigint"))
    )
    return out.drop(time_col)


def otel_spans(df: DataFrame) -> DataFrame:
    """OTel ExportTraceServiceRequest → one event per span
    (otel/traces.clj:72-135): triple explode resource→scope→span;
    duration = end − start nanos becomes the metric, span status →
    state, service from resource attrs ``service.name``. Span
    ``events`` (event->map, traces.clj:57-62) and ``links``
    (link->map, traces.clj:64-70) ride along as nested arrays with
    their attribute lists folded to maps, plus the dropped-*-count
    fidelity fields."""
    rs = df.select(F.explode(F.col("resource_spans")).alias("rs"))
    ss = rs.select(
        F.map_from_entries(F.col("rs.resource.attributes")).alias("__res__"),
        F.col("rs.schema_url").alias("schema_url"),
        F.explode(F.col("rs.scope_spans")).alias("ss"),
    )
    sp = ss.select(
        "__res__",
        "schema_url",
        F.col("ss.scope.name").alias("scope"),
        F.explode(F.col("ss.spans")).alias("sp"),
    )
    kind_map = F.create_map(
        *[x for k, v in _OTEL_KINDS.items() for x in (F.lit(k), F.lit(v))]
    )
    status_map = F.create_map(
        *[x for k, v in _OTEL_STATUS.items() for x in (F.lit(k), F.lit(v))]
    )
    dur = F.col("sp.end_time_unix_nano") - F.col("sp.start_time_unix_nano")
    return sp.select(
        F.element_at(F.col("__res__"), "service.name").alias("service"),
        F.col("scope"),
        F.col("schema_url"),
        F.col("sp.trace_id").alias("trace_id"),
        F.col("sp.span_id").alias("span_id"),
        F.col("sp.parent_span_id").alias("parent_span_id"),
        F.col("sp.name").alias("name"),
        F.coalesce(
            F.element_at(kind_map, F.col("sp.kind")), F.lit("unrecognized")
        ).alias("kind"),
        F.coalesce(
            F.element_at(status_map, F.col("sp.status.code")), F.lit("unset")
        ).alias("state"),
        F.col("sp.status.message").alias("description"),
        F.col("sp.start_time_unix_nano").alias("start_time"),
        F.col("sp.end_time_unix_nano").alias("end_time"),
        F.timestamp_micros(
            (F.col("sp.end_time_unix_nano") / F.lit(1000)).cast("bigint")
        ).alias("time"),
        dur.cast("double").alias("metric"),
        F.map_from_entries(F.col("sp.attributes")).alias("attributes"),
        F.transform(
            F.col("sp.events"),
            lambda e: F.struct(
                e["time_unix_nano"].alias("time"),
                e["name"].alias("name"),
                F.map_from_entries(e["attributes"]).alias("attributes"),
                e["dropped_attributes_count"].alias("dropped_attributes_count"),
            ),
        ).alias("events"),
        F.col("sp.dropped_events_count").alias("dropped_events_count"),
        F.transform(
            F.col("sp.links"),
            lambda ln: F.struct(
                ln["trace_id"].alias("trace_id"),
                ln["span_id"].alias("span_id"),
                ln["trace_state"].alias("state"),
                F.map_from_entries(ln["attributes"]).alias("attributes"),
                ln["dropped_attributes_count"].alias("dropped_attributes_count"),
            ),
        ).alias("links"),
        F.col("sp.dropped_links_count").alias("dropped_links_count"),
    )


def reinject_batch(df: DataFrame, transform, iterations: int = 1) -> DataFrame:
    """``reinject!`` (action.clj:1643-1678) — feed results back into
    the stream. Spark DAGs are acyclic, so batch reinjection is a
    bounded iterative union (streaming uses sink-topic → source-topic
    loopback, documented in SURVEY §2.1). ``transform`` maps a batch
    of events to the events to reinject."""
    out = df
    current = df
    for _ in range(iterations):
        current = transform(current)
        out = out.unionByName(current)
    return out
