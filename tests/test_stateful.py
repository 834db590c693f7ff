"""Order-dependent stateful operators (reference §2.3/§2.4)."""


def test_changed(make_events, collect_sorted):
    from mirabelle_spark.operators import stateful as st

    rows = [
        {"time": 1, "state": "ok"},
        {"time": 2, "state": "ok"},
        {"time": 3, "state": "critical"},
        {"time": 4, "state": "critical"},
        {"time": 5, "state": "ok"},
    ]
    df = make_events(rows)
    out = st.changed(df, "state", init="ok", time_col="time", order_cols=["seq"])
    # init="ok": first two suppressed; transitions at seq 2 and 4 pass
    assert [r[0] for r in collect_sorted(out, "seq")] == [2, 4]


def test_ddt_docstring_example(make_events):
    from mirabelle_spark.operators import stateful as st

    # action.clj:1066-1068: {1,1} then {10,4} → metric (10-1)/(4-1) = 3
    df = make_events([{"time": 1, "metric": 1}, {"time": 4, "metric": 10}])
    out = st.ddt(df, time_col="time", order_cols=["seq"]).collect()
    assert len(out) == 1 and out[0].metric == 3.0


def test_ddt_pos_drops_negative(make_events):
    from mirabelle_spark.operators import stateful as st

    df = make_events(
        [{"time": 1, "metric": 10}, {"time": 2, "metric": 5}, {"time": 3, "metric": 7}]
    )
    out = st.ddt_pos(df, time_col="time", order_cols=["seq"])
    assert [r.metric for r in out.orderBy("time").collect()] == [2.0]


def test_smax_smin_docstring_examples(make_events):
    from mirabelle_spark.operators import stateful as st

    # action.clj smax doc: inputs (1,10) (2,3) (3,11) → outputs 10, 10, 11
    df = make_events(
        [{"time": 1, "metric": 10}, {"time": 2, "metric": 3}, {"time": 3, "metric": 11}]
    )
    mx = st.smax(df, time_col="time", order_cols=["seq"])
    assert sorted(r.metric for r in mx.collect()) == [10.0, 10.0, 11.0]
    mn = st.smin(df, time_col="time", order_cols=["seq"])
    assert sorted(r.metric for r in mn.collect()) == [3.0, 3.0, 10.0]


def test_above_dt(make_events, collect_sorted):
    from mirabelle_spark.operators import stateful as st

    # condition must hold CONTINUOUSLY for > 10s before events pass
    rows = [
        {"time": 0, "metric": 100},   # flip starts at 0
        {"time": 5, "metric": 100},   # 5 ≤ 0+10 → no
        {"time": 11, "metric": 100},  # 11 > 10 → pass
        {"time": 12, "metric": 1},    # invalid → reset
        {"time": 13, "metric": 100},  # new flip at 13
        {"time": 30, "metric": 100},  # 30 > 23 → pass
    ]
    df = make_events(rows)
    out = st.above_dt(df, threshold=50, dt_s=10.0, time_col="time", order_cols=["seq"])
    assert [r[0] for r in collect_sorted(out, "seq")] == [2, 5]


def test_stable(make_events, collect_sorted):
    from mirabelle_spark.operators import stateful as st

    rows = [
        {"time": 0, "state": "ok"},       # run lasts 0..12 > 10 → all pass
        {"time": 6, "state": "ok"},
        {"time": 12, "state": "ok"},
        {"time": 13, "state": "critical"},  # flap: run lasts 1s → suppressed
        {"time": 14, "state": "ok"},        # run 14..16 < 10 → suppressed
        {"time": 16, "state": "ok"},
    ]
    df = make_events(rows)
    out = st.stable(df, 10.0, "state", time_col="time", order_cols=["seq"])
    assert [r[0] for r in collect_sorted(out, "seq")] == [0, 1, 2]


def test_zscore_rolling_window(spark):
    """Known-value rolling z-score: window moments over the trailing
    range frame, NULL below min_n or at zero variance."""
    from pyspark.sql import functions as F

    from mirabelle_spark.operators import stateful as st

    rows = [(i, float(t), v) for i, (t, v) in enumerate(
        [(0, 10.0), (10, 10.0), (20, 40.0), (1000, 7.0)]
    )]
    df = spark.createDataFrame(rows, "event_id bigint, t double, value double") \
        .withColumn("time", F.timestamp_micros((F.col("t") * 1e6).cast("long")))
    out = {r.event_id: r.z for r in st.zscore(
        df, 60.0, time_col="time", metric_col="value", out="z"
    ).collect()}
    assert out[0] is None            # n=1 < min_n
    assert out[1] is None            # n=2 but variance 0
    mean = 20.0; var = (100 + 100 + 1600) / 3 - 400  # population
    assert abs(out[2] - (40.0 - mean) / var ** 0.5) < 1e-12
    assert out[3] is None            # window rolled past; n=1 again
    # partition independence
    again = {r.event_id: r.z for r in st.zscore(
        df.repartition(7), 60.0, time_col="time", metric_col="value", out="z"
    ).collect()}
    assert again == out
