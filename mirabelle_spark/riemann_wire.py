"""Riemann protobuf WIRE decode — real bytes → nested event rows.

The reference decodes `Proto$Msg` with the Java protobuf runtime
(transport/codec.clj:40-63, schema src/java/proto/riemann/proto.proto).
On a cluster the natural Spark form is `from_protobuf()` over a Kafka
`value` column, but this container ships neither the spark-protobuf
connector jar nor the python protobuf package — so this module
implements the tiny subset of the PUBLIC proto2 wire format the
Riemann schema needs (varint / zigzag sint64 / fixed64 / fixed32 /
length-delimited, from the protobuf encoding spec), as a plain-python
parser executed per Arrow batch via ``mapInPandas``.

The output rows use :data:`mirabelle_spark.sources.RIEMANN_MSG_SCHEMA`,
so :func:`mirabelle_spark.sources.riemann_events` applies the exact
reference field mapping (metric union sint64 > double > float,
host → attributes, µs-over-s time) unchanged on top. Swapping this
parser for `from_protobuf()` on a real cluster changes ONE line and
no schema.

Field numbers (proto.proto):
  Msg.events = 6 (nested Event)
  Event: time=1 state=2 service=3 host=4 description=5 tags=7
         ttl=8(float) attributes=9(nested) time_micros=10
         metric_sint64=13(sint64) metric_d=14(double) metric_f=15(float)
  Attribute: key=1 value=2
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

from mirabelle_spark.sources import RIEMANN_MSG_SCHEMA


def _read_varint(buf: memoryview, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _signed64(n: int) -> int:
    """Two's-complement view of an unsigned varint: proto2 int64
    fields (Event.time=1, time_micros=10) encode negatives as
    10-byte varints; without the wrap they surface as ~2^64 and
    overflow the BIGINT column downstream."""
    return n - (1 << 64) if n >= 1 << 63 else n


def _fields(buf: memoryview) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, raw_value) triples."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fnum, wtype = key >> 3, key & 0x7
        if wtype == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wtype == 1:  # fixed64
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            val = bytes(buf[i : i + 8])
            i += 8
        elif wtype == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError("truncated length-delimited field")
            val = buf[i : i + ln]
            i += ln
        elif wtype == 5:  # fixed32
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            val = bytes(buf[i : i + 4])
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def _decode_attribute(buf: memoryview) -> dict:
    out = {"key": None, "value": None}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            out["key"] = bytes(val).decode("utf-8")
        elif fnum == 2:
            out["value"] = bytes(val).decode("utf-8")
    return out


def _decode_event(buf: memoryview) -> dict:
    ev = {
        "host": None, "service": None, "state": None, "description": None,
        "tags": None, "ttl": None, "time_s": None, "time_micros": None,
        "metric_sint64": None, "metric_d": None, "metric_f": None,
        "attributes": None,
    }
    tags: list[str] = []
    attrs: list[dict] = []
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            ev["time_s"] = _signed64(val)
        elif fnum == 2:
            ev["state"] = bytes(val).decode("utf-8")
        elif fnum == 3:
            ev["service"] = bytes(val).decode("utf-8")
        elif fnum == 4:
            ev["host"] = bytes(val).decode("utf-8")
        elif fnum == 5:
            ev["description"] = bytes(val).decode("utf-8")
        elif fnum == 7:
            tags.append(bytes(val).decode("utf-8"))
        elif fnum == 8:
            ev["ttl"] = struct.unpack("<f", val)[0]
        elif fnum == 9:
            attrs.append(_decode_attribute(val))
        elif fnum == 10:
            ev["time_micros"] = _signed64(val)
        elif fnum == 13:
            ev["metric_sint64"] = _zigzag(val)
        elif fnum == 14:
            ev["metric_d"] = struct.unpack("<d", val)[0]
        elif fnum == 15:
            ev["metric_f"] = struct.unpack("<f", val)[0]
    if tags:
        ev["tags"] = tags
    if attrs:
        ev["attributes"] = attrs
    # proto2 "has" semantics: ttl is float; keep python float (Spark FLOAT)
    return ev


def decode_msg(payload: bytes) -> list[dict]:
    """Decode one wire `Msg` into its list of event dicts."""
    events = []
    for fnum, _, val in _fields(memoryview(payload)):
        if fnum == 6:
            events.append(_decode_event(val))
    return events


def riemann_wire_events(df: DataFrame, payload_col: str = "value") -> DataFrame:
    """binary `Msg` payloads → decoded Riemann events.

    ``df[payload_col]`` holds one encoded Msg per row (the Kafka
    `value` shape). Decode runs distributed per Arrow batch; the
    result is fed through :func:`sources.riemann_events` so the
    reference's field mapping lives in exactly one place.
    """
    import pandas as pd

    from mirabelle_spark.sources import riemann_events

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [{"events": decode_msg(p)} for p in pdf[payload_col] if p is not None]
            yield pd.DataFrame(rows, columns=["events"])

    nested = df.mapInPandas(_decode, schema=RIEMANN_MSG_SCHEMA)
    return riemann_events(nested)
