"""Window operators (reference §2.5; action_test.clj window cases)."""

from pyspark.sql import functions as F


def test_fixed_event_window_complete_only(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events([{"time": t, "metric": t} for t in range(5)])
    w = win.fixed_event_window(df, 2, time_col="time", order_cols=["seq"])
    rows = sorted(
        [(r.window_id, [e.metric for e in r.events]) for r in w.collect()]
    )
    # 5 events, n=2 → two complete windows; the 5th event never flushes
    assert rows == [(0, [0.0, 1.0]), (1, [2.0, 3.0])]


def test_moving_event_window(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events([{"time": t, "metric": t} for t in range(4)])
    w = win.moving_event_window(df, 3, time_col="time", order_cols=["seq"],
                                value_col="metric")
    got = {r.seq: r.events for r in w.collect()}
    assert got[0] == [0.0]
    assert got[2] == [0.0, 1.0, 2.0]
    assert got[3] == [1.0, 2.0, 3.0]


def test_fixed_time_window_buckets(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events(
        [{"time": 1, "metric": 1}, {"time": 59, "metric": 2}, {"time": 61, "metric": 3}]
    )
    w = win.fixed_time_window(df, 60.0, time_col="time", event_cols=["metric"])
    rows = sorted((r.window_start, [e.metric for e in r.events]) for r in w.collect())
    assert rows == [(0.0, [1.0, 2.0]), (60.0, [3.0])]


def test_fixed_time_window_negative_times(make_events):
    # floored window math for negative event times (action.clj:2380-2385)
    from mirabelle_spark.operators import windows as win

    df = make_events([{"time": -1, "metric": 1}, {"time": 1, "metric": 2}])
    w = win.fixed_time_window(df, 60.0, time_col="time", event_cols=["metric"])
    starts = sorted(r.window_start for r in w.collect())
    assert starts == [-60.0, 0.0]


def test_moving_time_window_horizon(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events(
        [{"time": 0, "metric": 0}, {"time": 5, "metric": 5}, {"time": 10, "metric": 10}]
    )
    w = win.moving_time_window(df, 10.0, time_col="time", value_col="metric")
    got = {r.seq: r.events for r in w.collect()}
    # window is (t-10, t]: at t=10 the t=0 event is exactly 10s old → excluded
    assert got[2] == [5.0, 10.0]
    assert got[1] == [0.0, 5.0]


def test_ssort(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events(
        [{"time": 1, "metric": 10}, {"time": 4, "metric": 2}, {"time": 9, "metric": 7}]
    )
    s = win.ssort(df, 60.0, "metric", time_col="time", payload_cols=["metric"])
    rows = [(r.seq, r.metric) for r in s.orderBy("seq").collect()]
    assert rows == [(0, 2.0), (1, 7.0), (2, 10.0)]


def test_coalesce_latest_per_key(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events(
        [
            {"time": 10, "host": "a", "metric": 1},
            {"time": 50, "host": "a", "metric": 2},   # latest for a in window 0
            {"time": 55, "host": "b", "metric": 3},
        ]
    )
    c = win.coalesce_op(df, 60.0, fields=["host"], time_col="time",
                        order_cols=["seq"])
    rows = sorted((r.host, r.metric) for r in c.collect())
    assert rows == [("a", 2.0), ("b", 3.0)]


def test_project_two_conditions(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events(
        [
            {"time": 1, "service": "enq", "metric": 10},
            {"time": 2, "service": "deq", "metric": 4},
            {"time": 3, "service": "enq", "metric": 20},  # latest enq
        ]
    )
    p = win.project(
        df,
        [[":=", "service", "enq"], [":=", "service", "deq"]],
        60.0,
        time_col="time",
        order_cols=["seq"],
    )
    row = p.collect()[0]
    assert (row.metric_1, row.metric_2) == (20.0, 4.0)


def test_coalesce_ticks_fill_forward(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events(
        [
            {"time": 5, "host": "a", "metric": 1},
            {"time": 33, "host": "a", "metric": 2},
            {"time": 8, "host": "b", "metric": 3},
        ]
    )
    c = win.coalesce_ticks(
        df, 10.0, fields=["host"], time_col="time", default_ttl_s=25.0,
        order_cols=["seq"],
    )
    got = sorted((r.host, r.tick, r.metric) for r in c.collect())
    # buffer persists: a@5 re-emits at ticks 10/20/30 (next a event is
    # at 33 > horizon 30); b@8 likewise — the key point vs plain
    # per-bucket coalesce, which would emit each key once
    assert got == [
        ("a", 10.0, 1.0), ("a", 20.0, 1.0), ("a", 30.0, 1.0),
        ("b", 10.0, 3.0), ("b", 20.0, 3.0), ("b", 30.0, 3.0),
    ]


def test_coalesce_ticks_expiry(make_events):
    from mirabelle_spark.operators import windows as win

    df = make_events(
        [{"time": 5, "host": "a", "metric": 1}, {"time": 95, "host": "b", "metric": 2}]
    )
    c = win.coalesce_ticks(
        df, 10.0, fields=["host"], time_col="time", default_ttl_s=12.0,
        order_cols=["seq"],
    )
    got = sorted((r.host, r.tick) for r in c.collect())
    # a@5 expires after t=17 → only tick 10; b@95 has horizon 90 → none
    assert got == [("a", 10.0)]
