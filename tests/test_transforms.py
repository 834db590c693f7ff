"""Scalar transforms (reference action.clj §2.4 families)."""

from pyspark.sql import functions as F


def test_with_default(make_events, collect_sorted):
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "metric": 5, "state": None}])
    out = tr.with_fields(df, {"state": "critical", "env": "prod"})
    row = out.select("state", "env").collect()[0]
    assert (row.state, row.env) == ("critical", "prod")

    out2 = tr.default_fields(df, {"state": "ok", "metric": 0.0})
    row2 = out2.select("state", "metric").collect()[0]
    assert (row2.state, row2.metric) == ("ok", 5.0)  # metric kept, state defaulted


def test_tag_untag(make_events):
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "tags": ["a"]}, {"time": 2, "tags": None}])
    tagged = tr.tag(df, ["a", "b"])
    got = [r.tags for r in tagged.orderBy("seq").collect()]
    assert got == [["a", "b"], ["a", "b"]]  # dedup + null-tags treated as empty
    untagged = tr.untag(tagged, "a")
    assert [r.tags for r in untagged.orderBy("seq").collect()] == [["b"], ["b"]]


def test_scale_increment_decrement(make_events):
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "metric": 10}])
    assert tr.scale(df, 2.5).collect()[0].metric == 25.0
    assert tr.increment(df).collect()[0].metric == 11.0
    assert tr.decrement(df).collect()[0].metric == 9.0


def test_sformat_to_string(make_events):
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "host": "web1", "service": "api"}])
    out = tr.sformat(df, "%s/%s", "label", ["host", "service"])
    assert out.collect()[0].label == "web1/api"
    df2 = make_events([{"time": 1, "metric": 3}])
    assert tr.to_string(df2, "metric").collect()[0].metric == "3.0"


def test_base64_roundtrip(make_events):
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "service": "hello world"}])
    enc = tr.to_base64(df, "service")
    assert enc.collect()[0].service == "aGVsbG8gd29ybGQ="
    dec = tr.from_base64(enc, "service")
    assert dec.collect()[0].service == "hello world"


def test_from_json_extract_iterate(make_events, spark):
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "service": '{"a": 7, "b": "x"}'}])
    parsed = tr.from_json(df, "service", "a BIGINT, b STRING", target="p")
    row = parsed.select("p.a", "p.b").collect()[0]
    assert (row.a, row.b) == (7, "x")
    extracted = tr.extract(parsed, "p")
    assert extracted.columns == ["a", "b"]

    arr = df.withColumn("xs", F.array(F.lit(1), F.lit(2), F.lit(3)))
    exploded = tr.iterate_on(arr, "xs")
    assert sorted(r.xs for r in exploded.collect()) == [1, 2, 3]


def test_keys_ops(make_events):
    from mirabelle_spark.operators import transforms as tr

    df = make_events([{"time": 1, "metric": 1, "host": "h"}])
    assert set(tr.keep_keys(df, ["host", "metric"]).columns) == {"host", "metric"}
    assert "metric" not in tr.sdissoc(df, "metric").columns
    renamed = tr.rename_keys(df, {"host": "hostname"})
    assert "hostname" in renamed.columns and "host" not in renamed.columns


def test_custom_registry(make_events):
    from mirabelle_spark.operators import transforms as tr

    tr.register_custom("double-metric", lambda df: tr.scale(df, 2.0))
    df = make_events([{"time": 1, "metric": 4}])
    assert tr.custom(df, "double-metric").collect()[0].metric == 8.0


def test_sflatten(make_events):
    from mirabelle_spark.operators import transforms as tr
    from mirabelle_spark.operators import windows as win

    df = make_events([{"time": 1, "metric": 1}, {"time": 2, "metric": 2}])
    w = win.fixed_time_window(df, 60.0, time_col="time", event_cols=["seq", "metric"])
    flat = tr.sflatten(w, "events")
    assert sorted(r.metric for r in flat.collect()) == [1.0, 2.0]
