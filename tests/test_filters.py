"""Filter/routing operators (reference action_test.clj: where :21,
throttle :528, expired :XXX families)."""


def test_over_under(make_events, collect_sorted):
    from mirabelle_spark.operators import filters as flt

    df = make_events([{"time": 1, "metric": 5}, {"time": 2, "metric": 50}])
    assert [r[0] for r in collect_sorted(flt.over(df, 10), "seq")] == [1]
    assert [r[0] for r in collect_sorted(flt.under(df, 10), "seq")] == [0]


def test_tagged_all(make_events, collect_sorted):
    from mirabelle_spark.operators import filters as flt

    df = make_events(
        [
            {"time": 1, "tags": ["a", "b", "c"]},
            {"time": 2, "tags": ["a"]},
            {"time": 3, "tags": None},
        ]
    )
    assert [r[0] for r in collect_sorted(flt.tagged_all(df, ["a", "b"]), "seq")] == [0]
    # empty wanted set: subset? of empty set is always true, even for nil tags
    assert [r[0] for r in collect_sorted(flt.tagged_all(df, []), "seq")] == [0, 1, 2]


def test_split_branches(make_events, collect_sorted):
    from mirabelle_spark.operators import filters as flt

    df = make_events(
        [{"time": 1, "metric": 100}, {"time": 2, "metric": 50}, {"time": 3, "metric": 1}]
    )
    branches = flt.split_branches(
        df, [([":>", "metric", 80], "hi"), ([":>", "metric", 20], "mid")], default="lo"
    )
    assert [r[0] for r in collect_sorted(branches["hi"], "seq")] == [0]
    assert [r[0] for r in collect_sorted(branches["mid"], "seq")] == [1]
    assert [r[0] for r in collect_sorted(branches["lo"], "seq")] == [2]


def test_expired_running_clock(make_events, collect_sorted):
    from mirabelle_spark.operators import filters as flt

    # arrival order: a late event (time=10) after clock reached 500
    rows = [
        {"time": 100, "metric": 1},
        {"time": 500, "metric": 1},
        {"time": 10, "metric": 1},  # 490s older than running max → expired (ttl 120)
        {"time": 600, "metric": 1},
    ]
    df = make_events(rows)
    exp = flt.expired(df, time_col="time", ttl_col=None, state_col=None,
                      arrival_cols=["seq"])
    assert [r[0] for r in collect_sorted(exp, "seq")] == [2]
    ok = flt.not_expired(df, time_col="time", ttl_col=None, state_col=None,
                         arrival_cols=["seq"])
    assert [r[0] for r in collect_sorted(ok, "seq")] == [0, 1, 3]


def test_expired_keyed_clock(make_events, collect_sorted):
    """Downstream of `by`, each key owns its clock (per-fork state)."""
    from mirabelle_spark.operators import filters as flt

    rows = [
        {"time": 100, "metric": 1, "host": "a"},
        {"time": 500, "metric": 1, "host": "a"},
        {"time": 10, "metric": 1, "host": "a"},   # expired vs a's clock (500)
        {"time": 10, "metric": 1, "host": "b"},   # b's clock is only 10 → fine
    ]
    df = make_events(rows)
    exp = flt.expired(df, time_col="time", ttl_col=None, state_col=None,
                      arrival_cols=["seq"], by=["host"])
    assert [r[0] for r in collect_sorted(exp, "seq")] == [2]


def test_expired_plan_has_no_single_partition_window(make_events):
    """The scale contract: neither the keyed clock nor the global
    two-pass clock may plan an Exchange SinglePartition (one task
    sorting the world)."""
    from mirabelle_spark.operators import filters as flt

    rows = [{"time": float(i), "metric": 1, "host": f"h{i % 3}"} for i in range(20)]
    df = make_events(rows)
    for kwargs in ({"by": ["host"]}, {}):
        out = flt.expired(df, time_col="time", ttl_col=None, state_col=None,
                          arrival_cols=["seq"], **kwargs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan


def test_throttle_anchored(make_events, collect_sorted):
    from mirabelle_spark.operators import filters as flt

    # reference semantics (action.clj:1163-1217): window anchored at
    # first passing event; reset when t >= anchor + duration
    rows = [
        {"time": 0, "metric": 1},   # pass (opens window at 0, n=1)
        {"time": 1, "metric": 1},   # pass (n=2)
        {"time": 2, "metric": 1},   # drop (count=2 reached)
        {"time": 9, "metric": 1},   # drop (still inside [0,10))
        {"time": 10, "metric": 1},  # pass (new window anchored at 10)
        {"time": 11, "metric": 1},  # pass (n=2)
        {"time": 12, "metric": 1},  # drop
        {"time": None, "metric": 1},  # dropped: no time
    ]
    df = make_events(rows)
    out = flt.throttle_batch(df, count=2, duration_s=10.0, by=(), time_col="time",
                             order_cols=["seq"])
    assert [r[0] for r in collect_sorted(out, "seq")] == [0, 1, 4, 5]


def test_throttle_aligned_vs_anchored_divergence(make_events, collect_sorted):
    from mirabelle_spark.operators import filters as flt

    # anchor at t=5: aligned buckets would reset at t=10; anchored resets at 15
    rows = [
        {"time": 5, "metric": 1},
        {"time": 11, "metric": 1},   # same anchored window [5,15) → drop (count=1)
        {"time": 15, "metric": 1},   # new window
    ]
    df = make_events(rows)
    out = flt.throttle_batch(df, count=1, duration_s=10.0, time_col="time",
                             order_cols=["seq"])
    assert [r[0] for r in collect_sorted(out, "seq")] == [0, 2]
