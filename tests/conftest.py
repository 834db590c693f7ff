"""Shared fixtures: one local SparkSession + literal-event helpers.

Test pattern mirrors the reference's layer-1 operator tests
(test/mirabelle/action_test.clj): literal event list in → exact
emitted rows out.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from mirabelle_spark.session import get_spark

    s = get_spark(app_name="mirabelle_tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def make_events(spark):
    """Build an event DataFrame from dicts with numeric ``time``
    seconds; schema: time TIMESTAMP, metric DOUBLE, host STRING,
    service STRING, state STRING, tags ARRAY<STRING>, seq BIGINT
    (arrival order)."""
    from pyspark.sql import functions as F

    def _make(rows: list[dict]):
        norm = []
        for i, r in enumerate(rows):
            norm.append(
                {
                    "time_s": float(r["time"]) if r.get("time") is not None else None,
                    "metric": (
                        float(r["metric"]) if r.get("metric") is not None else None
                    ),
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

    return _make


@pytest.fixture(scope="session")
def collect_sorted():
    def _collect(df, *cols):
        rows = df.select(*cols) if cols else df
        return sorted([tuple(r) for r in rows.collect()])

    return _collect
