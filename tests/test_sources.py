"""Ingest decoders (§2.1): wire-shape → event mapping parity."""

from pyspark.sql import functions as F


def test_riemann_decode_metric_union(spark):
    from mirabelle_spark import sources

    rows = [
        (
            [
                # sint64 wins over d (codec.clj:12-19)
                ("h1", "api", "ok", None, ["t1"], 60.0, None, 1_700_000_000_000_000,
                 7, 9.5, None, [("dc", "eu")]),
                # only float set
                ("h2", "db", None, "desc", None, None, 1_700_000_000, None,
                 None, None, 2.5, None),
            ],
        )
    ]
    df = spark.createDataFrame(rows, sources.RIEMANN_MSG_SCHEMA)
    out = {r.service: r for r in sources.riemann_events(df).collect()}
    assert out["api"].metric == 7.0
    assert out["api"].attributes == {"host": "h1", "dc": "eu"}
    assert out["api"].tags == ["t1"]
    assert out["db"].metric == 2.5
    assert out["db"].attributes == {"host": "h2"}
    assert out["db"].time.year >= 2023  # time_s fallback applied


def test_prometheus_remote_write_flatten(spark):
    from mirabelle_spark import sources

    rows = [
        (
            [
                (
                    [("__name__", "http_requests_total"), ("job", "api")],
                    [(1.0, 1700000000000), (2.0, 1700000060000)],
                ),
            ],
        )
    ]
    df = spark.createDataFrame(rows, sources.PROM_WRITE_REQUEST_SCHEMA)
    out = sources.prometheus_remote_write(df).orderBy("time").collect()
    assert len(out) == 2
    assert out[0].name == "http_requests_total"
    assert out[0].attributes == {"job": "api"}  # __name__ removed
    assert out[0].metric == 1.0
    assert out[1].time.minute == out[0].time.minute + 1  # ms → timestamp


def test_fluentbit_date_to_time(spark):
    from mirabelle_spark import sources

    df = spark.createDataFrame(
        [(1700000000.25, "hello", "warn")], "date double, message string, level string"
    )
    out = sources.fluentbit_logs(df).collect()[0]
    assert out.message == "hello" and "date" not in out.asDict()
    assert abs(out.time.timestamp() - 1700000000.25) < 1e-6


def test_otel_span_flatten(spark):
    from mirabelle_spark import sources

    span = (
        "abc123", "def456", "", "GET /api", 2,  # kind 2 = server
        1_700_000_000_000_000_000, 1_700_000_001_500_000_000,
        (2, "boom"),  # status error
        [("http.method", "GET")],
    )
    rows = [([({"attributes": [("service.name", "frontend")]}, "url1",
               [((("scope1", "v1")), [span])]),],)]
    df = spark.createDataFrame(rows, sources.OTEL_TRACES_SCHEMA)
    out = sources.otel_spans(df).collect()[0]
    assert out.service == "frontend"
    assert out.kind == "server"
    assert out.state == "error"
    assert out.description == "boom"
    assert out.metric == 1.5e9  # duration nanos
    assert out.attributes == {"http.method": "GET"}
    assert out.trace_id == "abc123"


def test_reinject_batch(make_events):
    from mirabelle_spark import sources
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "metric": 1}])
    out = sources.reinject_batch(df, lambda d: tr.scale(d, 10.0), iterations=2)
    assert sorted(r.metric for r in out.collect()) == [1.0, 10.0, 100.0]
