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
