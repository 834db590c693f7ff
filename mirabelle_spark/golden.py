"""Golden stream-test harness (the reference's own test format).

The reference's product test harness (test.clj:41-82, doc
howto/tests/_index.md) maps a test name to ``{:input [events]
:taps {tap-name [expected-events]} :target stream}``: inject the
inputs, diff each tap's captured events against the expectation.
Deterministic by construction because clocks are event time.

Here a case is ``{"input": [event dicts], "tree": action-tree,
"taps": {name: [expected row dicts]}}`` and runs in batch; the
streaming twin of the same tree can be asserted with an
availableNow trigger for batch/stream parity.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mirabelle_spark.plans.builder import Ctx, compile_stream


def _df_from_events(spark: SparkSession, rows: list[dict]):
    norm = []
    for i, r in enumerate(rows):
        norm.append(
            {
                "time_s": float(r["time"]) if r.get("time") is not None else None,
                "metric": float(r["metric"]) if r.get("metric") is not None else None,
                "host": r.get("host"),
                "service": r.get("service"),
                "state": r.get("state"),
                "tags": r.get("tags"),
                "seq": i,
            }
        )
    df = spark.createDataFrame(
        norm,
        schema="time_s double, metric double, host string, service string, "
        "state string, tags array<string>, seq bigint",
    )
    return df.withColumn("time", F.timestamp_seconds("time_s")).drop("time_s")


def run_case(spark: SparkSession, case: dict) -> dict[str, list[str]]:
    """Run one golden case; returns {tap: list of mismatch messages}
    (empty lists everywhere = pass)."""
    df = _df_from_events(spark, case["input"])
    ctx = compile_stream(
        df, case["tree"], Ctx(order_cols=("seq",), test_mode=True)
    )
    failures: dict[str, list[str]] = {}
    for tap_name, expected in case.get("taps", {}).items():
        msgs: list[str] = []
        if tap_name not in ctx.taps:
            failures[tap_name] = [f"tap {tap_name!r} never captured"]
            continue
        got_rows = ctx.taps[tap_name].collect()
        got = [
            {k: _norm(v) for k, v in r.asDict().items() if v is not None}
            for r in got_rows
        ]
        exp = [{k: _norm(v) for k, v in e.items()} for e in expected]
        for e in exp:
            if not any(all(g.get(k) == v for k, v in e.items()) for g in got):
                msgs.append(f"expected event not captured: {e}")
        if len(got) != len(exp):
            msgs.append(f"count mismatch: got {len(got)}, expected {len(exp)}")
        failures[tap_name] = msgs
    return failures


def assert_case(spark: SparkSession, case: dict) -> None:
    failures = run_case(spark, case)
    problems = {t: m for t, m in failures.items() if m}
    assert not problems, f"golden case failed: {problems}"


def _norm(v: Any) -> Any:
    import datetime

    if isinstance(v, datetime.datetime):
        return v.timestamp()
    if isinstance(v, float) and v.is_integer():
        return v
    return v
