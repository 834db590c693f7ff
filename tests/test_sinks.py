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
