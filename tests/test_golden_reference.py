"""Reference-test parity: golden cases ported verbatim from the
reference's own suite (test/mirabelle/action_test.clj), run through
the DSL builder + golden harness. Input events and expected outputs
are copied from the cited deftest bodies (values only — the harness
re-expresses them as dicts); each case cites its source lines.

Cases whose inputs need nested structs or arrive out of time order
(the reference is arrival-ordered; our batch ops are event-time
ordered) are covered by the operator unit tests instead.
"""

import pytest
from pyspark.sql import functions as F

from mirabelle_spark.golden import assert_case


def _case(spark, tree, inp, expected, tap="out"):
    assert_case(
        spark,
        {
            "input": inp,
            "tree": {**tree, "children": [{"action": "tap", "params": [tap]}]},
            "taps": {tap: expected},
        },
    )


def test_where_golden(spark):
    """action_test.clj:21-60 (pos?, >, and, or vectors)."""
    _case(spark, {"action": "where", "params": [[":pos?", "metric"]]},
          [{"metric": 10}, {"metric": -1}],
          [{"metric": 10}])
    _case(spark, {"action": "where", "params": [[":>", "metric", 20]]},
          [{"metric": -1}, {"metric": 30}, {"metric": 0}],
          [{"metric": 30}])
    _case(spark, {"action": "where",
                  "params": [[":and", [":>", "metric", 20], [":<", "metric", 40]]]},
          [{"metric": -1}, {"metric": 30}, {"metric": 31}, {"metric": 50}],
          [{"metric": 30}, {"metric": 31}])
    _case(spark, {"action": "where",
                  "params": [[":or", [":<", "metric", 20], [":>", "metric", 40]]]},
          [{"metric": -1}, {"metric": 30}, {"metric": 31}, {"metric": 50}],
          [{"metric": -1}, {"metric": 50}])


def test_increment_decrement_golden(spark):
    """action_test.clj:127-140."""
    _case(spark, {"action": "increment", "params": []},
          [{"metric": 10}, {"metric": 11}],
          [{"metric": 11}, {"metric": 12}])
    _case(spark, {"action": "decrement", "params": []},
          [{"metric": 10}, {"metric": 11}],
          [{"metric": 9}, {"metric": 10}])


def test_default_golden(spark):
    """action_test.clj:228-246 (flat field case)."""
    _case(spark, {"action": "default", "params": [{"state": "ok"}]},
          [{"metric": 1},
           {"state": "critical", "metric": 2},
           {"state": "critical", "metric": 3},
           {"state": "ok", "metric": 4},
           {"metric": 5},
           {"state": "critical", "metric": 6}],
          [{"state": "ok", "metric": 1},
           {"state": "critical", "metric": 2},
           {"state": "critical", "metric": 3},
           {"state": "ok", "metric": 4},
           {"state": "ok", "metric": 5},
           {"state": "critical", "metric": 6}])


def test_with_golden(spark):
    """action_test.clj:310-326 (flat field case)."""
    _case(spark, {"action": "with", "params": [{"state": "ok"}]},
          [{"metric": 1},
           {"state": "critical", "metric": 2},
           {"state": "ok", "metric": 4},
           {"metric": 5}],
          [{"state": "ok", "metric": 1},
           {"state": "ok", "metric": 2},
           {"state": "ok", "metric": 4},
           {"state": "ok", "metric": 5}])


def test_above_dt_golden(spark):
    """cond-dt*-test, action_test.clj:211-227: [:> :metric 10] held
    10s; null-time events are skipped entirely."""
    _case(spark, {"action": "above-dt",
                  "params": [{"threshold": 10, "duration": 10}]},
          [{"time": 1, "metric": 12},
           {"time": 4, "metric": 12},
           {"metric": 12},
           {"time": 12, "metric": 12},
           {"time": 22, "metric": 13},
           {"time": 23, "metric": 1},
           {"metric": 1},
           {"time": 25, "metric": 11},
           {"time": 36, "metric": 12}],
          [{"time": 12.0, "metric": 12},
           {"time": 22.0, "metric": 13},
           {"time": 36.0, "metric": 12}])


def test_ddt_golden(spark):
    """dtt*-test, action_test.clj:466-488 (rate = Δmetric/Δtime;
    ddt-pos drops negative rates and skips null metrics)."""
    _case(spark, {"action": "ddt", "params": []},
          [{"metric": 1, "time": 1},
           {"metric": 10, "time": 4},
           {"metric": 11, "time": 7},
           {"metric": 8, "time": 10}],
          [{"metric": 3.0, "time": 4.0},
           {"metric": 1 / 3, "time": 7.0},
           {"metric": -1.0, "time": 10.0}])
    _case(spark, {"action": "ddt-pos", "params": []},
          [{"metric": 1, "time": 1},
           {"metric": 10, "time": 4},
           {"metric": 11, "time": 7},
           {"metric": 0, "time": 10},
           {"time": 12},
           {"metric": 4, "time": 12}],
          [{"metric": 3.0, "time": 4.0},
           {"metric": 1 / 3, "time": 7.0},
           {"metric": 2.0, "time": 12.0}])


def test_scale_golden(spark):
    """action_test.clj:489-498."""
    _case(spark, {"action": "scale", "params": [10]},
          [{"metric": 1, "time": 1}, {"metric": 10, "time": 4}],
          [{"metric": 10, "time": 1.0}, {"metric": 100, "time": 4.0}])


def test_split_golden(spark):
    """split*-test, action_test.clj:499-527: first-match routing with
    two branches."""
    from mirabelle_spark.golden import run_case

    case = {
        "input": [
            {"metric": 1, "time": 1, "state": "ok"},
            {"metric": 1, "time": 1, "state": "warning"},
            {"metric": 1, "time": 1},
            {"metric": 10, "time": 4, "state": "critical"},
            {"metric": 1, "time": 1, "state": "foo"},
            {"metric": 100, "time": 1, "state": "ok"},
        ],
        "tree": {
            "action": "split",
            "params": [[[":=", "state", "critical"], [":=", "state", "ok"]]],
            "children": [
                {"action": "tap", "params": ["crit"]},
                {"action": "tap", "params": ["ok"]},
            ],
        },
        "taps": {
            "crit": [{"metric": 10, "time": 4.0, "state": "critical"}],
            "ok": [{"metric": 1, "time": 1.0, "state": "ok"},
                   {"metric": 100, "time": 1.0, "state": "ok"}],
        },
    }
    failures = run_case(spark, case)
    assert not any(failures.values()), failures


def test_throttle_golden(spark):
    """throttle*-test, action_test.clj:528-568 (both counts; the
    out-of-order time-3 event is dropped either way)."""
    inp = [{"metric": 1, "time": t, "state": "ok"}
           for t in [0, 1, 5, 7, 3, 12, 14, 16, 18]]
    _case(spark, {"action": "throttle",
                  "params": [{"count": 1, "duration": 5}]},
          inp,
          [{"metric": 1, "time": t} for t in [0.0, 5.0, 12.0, 18.0]])
    _case(spark, {"action": "throttle",
                  "params": [{"count": 2, "duration": 5}]},
          inp,
          [{"metric": 1, "time": t} for t in [0.0, 1.0, 5.0, 7.0, 12.0, 14.0, 18.0]])


def test_ewma_golden(spark):
    """ewma-timeless*-test, action_test.clj:649-683 (r = 0, 1, 0.5)."""
    inp135 = [{"metric": 1, "time": 0}, {"metric": 3, "time": 1},
              {"metric": 5, "time": 2}]
    _case(spark, {"action": "ewma-timeless", "params": [0]},
          inp135, [{"metric": 0.0, "time": t} for t in [0.0, 1.0, 2.0]])
    _case(spark, {"action": "ewma-timeless", "params": [1]},
          inp135,
          [{"metric": 1.0, "time": 0.0}, {"metric": 3.0, "time": 1.0},
           {"metric": 5.0, "time": 2.0}])
    _case(spark, {"action": "ewma-timeless", "params": [0.5]},
          [{"metric": 1, "time": t} for t in [0, 1, 2]],
          [{"metric": 0.5, "time": 0.0}, {"metric": 0.75, "time": 1.0},
           {"metric": 0.875, "time": 2.0}])


def test_over_under_golden(spark):
    """action_test.clj:684-716."""
    inp = [{"metric": m} for m in [10, 1, 4, 12, 11, 1, 9, 14]]
    _case(spark, {"action": "over", "params": [10]},
          inp, [{"metric": m} for m in [12, 11, 14]])
    _case(spark, {"action": "under", "params": [10]},
          inp, [{"metric": m} for m in [1, 4, 1, 9]])


def test_changed_golden(spark):
    """changed*-test, action_test.clj:717-731 (flat field, init ok)."""
    _case(spark, {"action": "changed", "params": [{"field": "state", "init": "ok"}]},
          [{"metric": 1, "state": "ok"},
           {"metric": 2, "state": "ok"},
           {"metric": 3, "state": "critical"},
           {"metric": 4, "state": "critical"},
           {"metric": 4.5, "state": "critical"},
           {"metric": 5, "state": "ok"},
           {"metric": 6, "state": "critical"}],
          [{"metric": 3, "state": "critical"},
           {"metric": 5, "state": "ok"},
           {"metric": 6, "state": "critical"}])


def test_stable_golden(spark):
    """stable*-test second case, action_test.clj:1117-1137: a run
    stable past dt flushes ALL its buffered events, including the
    ones that arrived before dt elapsed."""
    _case(spark, {"action": "stable", "params": [10, "state"]},
          [{"state": "critical", "time": 1},
           {"state": "critical", "time": 9},
           {"state": "critical", "time": 12},
           {"state": "critical", "time": 13}],
          [{"state": "critical", "time": 1.0},
           {"state": "critical", "time": 9.0},
           {"state": "critical", "time": 12.0},
           {"state": "critical", "time": 13.0}])


def test_sdissoc_golden(spark):
    """sdissoc*-test flat cases, action_test.clj:808-836 (drop
    host+service; rows keep remaining fields)."""
    _case(spark, {"action": "sdissoc", "params": [["host", "service"]]},
          [{"host": "h1", "service": "s1", "metric": 1},
           {"host": "h2", "metric": 2}],
          [{"metric": 1}, {"metric": 2}])


def test_tagged_all_golden(spark):
    """tagged-all*-test, action_test.clj:868-885."""
    _case(spark, {"action": "tagged-all", "params": [["foo"]]},
          [{"metric": 3}, {"metric": 1, "tags": ["a"]},
           {"metric": 2, "tags": ["foo"]}],
          [{"metric": 2, "tags": ["foo"]}])
    _case(spark, {"action": "tagged-all", "params": [["foo", "bar"]]},
          [{"metric": 3},
           {"metric": 1, "tags": ["a"]},
           {"metric": 2, "tags": ["foo"]},
           {"metric": 3.5, "tags": ["foo", "bar"]}],
          [{"metric": 3.5, "tags": ["foo", "bar"]}])


def test_tag_untag_golden(spark):
    """tag*/untag*-test, action_test.clj:419-465 (add keeps order and
    dedups; untag removes)."""
    _case(spark, {"action": "tag", "params": [["foo"]]},
          [{"metric": 1}, {"metric": 2, "tags": ["foo"]},
           {"metric": 3, "tags": ["a"]}],
          [{"metric": 1, "tags": ["foo"]},
           {"metric": 2, "tags": ["foo"]},
           {"metric": 3, "tags": ["a", "foo"]}])
    _case(spark, {"action": "untag", "params": [["foo"]]},
          [{"metric": 1, "tags": ["foo"]}, {"metric": 2, "tags": ["a", "foo"]}],
          [{"metric": 1, "tags": []}, {"metric": 2, "tags": ["a"]}])


def test_sformat_golden(spark):
    """sformat*-test second case, action_test.clj:1031-1040:
    template into an existing field."""
    _case(spark, {"action": "sformat", "params": ["%s-cc", "service", ["host"]]},
          [{"host": "aa", "service": "bb"}],
          [{"host": "aa", "service": "aa-cc"}])


def test_rename_keys_golden(spark):
    """rename-keys*-test flat case, action_test.clj:1138-1151: a row
    whose source key is absent keeps its existing target value."""
    _case(spark, {"action": "rename-keys", "params": [{"host": "service"}]},
          [{"host": "foo", "service": "bar", "metric": 1},
           {"service": "bar", "metric": 2}],
          [{"service": "foo", "metric": 1},
           {"service": "bar", "metric": 2}])


def test_keep_keys_golden(spark):
    """keep-keys*-test flat case, action_test.clj:1180-1192."""
    _case(spark, {"action": "keep-keys", "params": [["host", "service", "metric"]]},
          [{"host": "foo", "service": "bar", "state": "ok", "metric": 10},
           {"host": "foo", "service": "baz", "time": 4},
           {"service": "bar"}],
          [{"host": "foo", "service": "bar", "metric": 10},
           {"host": "foo", "service": "baz"},
           {"service": "bar"}])


def test_to_string_golden(spark):
    """to-string-test, action_test.clj:1525-1535: str(nil) = ''."""
    _case(spark, {"action": "to-string", "params": [["state"]]},
          [{"metric": 1}, {"metric": 2, "state": "ok"}],
          [{"metric": 1, "state": ""}, {"metric": 2, "state": "ok"}])


def test_by_fixed_event_window_golden(spark):
    """by-test 'simple example', stream_test.clj:279-309: per-host
    forks each fill their own size-2 windows."""
    from mirabelle_spark.plans import build_stream
    from mirabelle_spark.golden import _df_from_events

    rows = [
        {"host": "foo", "metric": 1, "time": 1},
        {"host": "foo", "metric": 2, "time": 1},
        {"host": "bar", "metric": 3, "time": 1},
        {"host": "bar", "metric": 4, "time": 1},
        {"host": "bar", "metric": 5, "time": 2},
        {"host": "bar", "metric": 6, "time": 2},
        {"host": "baz", "metric": 4, "time": 1},
        {"host": "baz", "metric": 7, "time": 4},
    ]
    df = _df_from_events(spark, rows)
    taps = build_stream(
        df,
        {
            "action": "by",
            "params": [{"fields": ["host"]}],
            "children": [
                {
                    "action": "fixed-event-window",
                    "params": [{"size": 2}],
                    "children": [{"action": "tap", "params": ["win"]}],
                }
            ],
        },
        order_cols=("seq",),
        test_mode=True,
    )
    got = sorted(
        (r.host, tuple(sorted(e.metric for e in r.events)))
        for r in taps["win"].collect()
    )
    assert got == [
        ("bar", (3.0, 4.0)),
        ("bar", (5.0, 6.0)),
        ("baz", (4.0, 7.0)),
        ("foo", (1.0, 2.0)),
    ]


def test_new_config_diff_golden():
    """new-config-test, stream_test.clj:487-512: the reload diff."""
    from mirabelle_spark.streaming.lifecycle import diff_config

    same = diff_config({"foo": {}, "bar": {}}, {"foo": {}, "bar": {}})
    assert same == {"to_remove": set(), "to_add": set(), "to_reload": set()}

    add = diff_config({"foo": {}, "bar": {}}, {"foo": {}, "bar": {}, "baz": {}})
    assert add == {"to_remove": set(), "to_add": {"baz"}, "to_reload": set()}

    reload_ = diff_config(
        {"foo": {}, "bar": {}}, {"foo": {}, "bar": {"foo": 1}, "baz": {}}
    )
    assert reload_ == {"to_remove": set(), "to_add": {"baz"}, "to_reload": {"bar"}}

    remove = diff_config({"foo": {}, "bar": {}}, {"foo": {}})
    assert remove == {"to_remove": {"bar"}, "to_add": set(), "to_reload": set()}


def test_custom_action_golden(spark):
    """custom-action-test, stream_test.clj:30-67: a registered custom
    action compiles inside a stream like a built-in."""
    from mirabelle_spark.operators import filters as flt
    from mirabelle_spark.plans.builder import register_action

    register_action(
        "my-custom-action", lambda df, ctx, cond: flt.where(df, cond)
    )
    _case(spark, {"action": "my-custom-action", "params": [[":>", "metric", 10]]},
          [{"metric": 12}, {"metric": 9}, {"metric": 13}],
          [{"metric": 12}, {"metric": 13}])


def test_base64_golden(spark):
    """to/from-base64*-test flat cases, action_test.clj:979-1016."""
    _case(spark, {"action": "to-base64", "params": [["host"]]},
          [{"host": "aa", "service": "bb"},
           {"host": "bb", "service": "aa", "state": "critical"}],
          [{"host": "YWE=", "service": "bb"},
           {"host": "YmI=", "service": "aa", "state": "critical"}])
    _case(spark, {"action": "from-base64", "params": [["host"]]},
          [{"host": "YWE=", "service": "YmI="},
           {"host": "YmI=", "service": "YWE=", "state": "critical"}],
          [{"host": "aa", "service": "YmI="},
           {"host": "bb", "service": "YWE=", "state": "critical"}])


def test_aggregation_delay_golden(spark):
    """aggregation*-test, stream_test.clj:1227-1300: all three cases
    — no delay (final open window never flushes), delay toleration
    (late-but-tolerated events fold in, too-old events drop), and
    negative event times."""
    # no delay
    _case(spark, {"action": "aggregation",
                  "params": [{"duration": 10, "aggr-fn": "sum", "delay": 0}]},
          [{"time": 0, "metric": 10}, {"time": 7, "metric": 1},
           {"time": 11, "metric": 3}, {"time": 14, "metric": 8},
           {"time": 19, "metric": 1}, {"time": 20, "metric": 2},
           {"time": 23, "metric": 4}, {"time": 60, "metric": 1},
           {"time": 64, "metric": 4}, {"time": 70, "metric": 3}],
          [{"time": 7.0, "metric": 11.0}, {"time": 19.0, "metric": 12.0},
           {"time": 23.0, "metric": 6.0}, {"time": 64.0, "metric": 5.0}])
    # delay: late-but-tolerated 8,9 fold into [0,10); too-old 1 drops
    _case(spark, {"action": "aggregation",
                  "params": [{"duration": 10, "aggr-fn": "sum", "delay": 5}]},
          [{"time": 0, "metric": 10}, {"time": 7, "metric": 1},
           {"time": 11, "metric": 3}, {"time": 8, "metric": 2},
           {"time": 9, "metric": 2}, {"time": 1, "metric": 2},
           {"time": 14, "metric": 8}, {"time": 19, "metric": 1},
           {"time": 20, "metric": 2}, {"time": 23, "metric": 4},
           {"time": 25, "metric": 4}],
          [{"time": 9.0, "metric": 15.0}, {"time": 19.0, "metric": 12.0}])
    # negative event times
    _case(spark, {"action": "aggregation",
                  "params": [{"duration": 10, "aggr-fn": "sum", "delay": 5}]},
          [{"time": 0, "metric": 10}, {"time": -3, "metric": 10},
           {"time": -2, "metric": 1}, {"time": 3, "metric": 1},
           {"time": 11, "metric": 3}, {"time": 8, "metric": 2},
           {"time": 9, "metric": 2}, {"time": 1, "metric": 2},
           {"time": 14, "metric": 8}, {"time": 19, "metric": 1},
           {"time": 20, "metric": 2}, {"time": 23, "metric": 4},
           {"time": 25, "metric": 4}],
          [{"time": -2.0, "metric": 11.0}, {"time": 9.0, "metric": 15.0},
           {"time": 19.0, "metric": 12.0}])


def test_multiset_matcher_consumes_rows():
    """Duplicate expectations must not all satisfy themselves on one
    actual row while an unexpected row slips through (lengths equal):
    the matcher consumes each matched actual (test.clj:41-82 compares
    exactly)."""
    from mirabelle_spark.golden import _multiset_mismatches

    got = [{"metric": 1.0}, {"metric": 99.0}]
    exp = [{"metric": 1.0}, {"metric": 1.0}]
    assert _multiset_mismatches(got, exp)  # second {1.0} has no row left

    # exact multiset → clean
    assert not _multiset_mismatches(
        [{"metric": 1.0}, {"metric": 1.0}], [{"metric": 1.0}, {"metric": 1.0}]
    )
    # subset semantics per-event still hold (expected keys only)
    assert not _multiset_mismatches(
        [{"metric": 1.0, "host": "a"}], [{"metric": 1.0}]
    )


def test_launch_tests_directory_runner(spark):
    """test_test.clj:7-19 ported: the directory-based product runner
    over the JSON mirror of test/resources/test/{successful,failed}.
    The successful corpus passes wholesale IN BOTH MODES (r8, VERDICT
    r7 ask #8): mode="dual" runs every case batch AND availableNow-
    streaming — every action in the corpus (custom/where/by/
    sessionize/zscore/tap) has a streaming twin, so the same trees
    and the same expectations must hold under twin dispatch. The
    failed corpus reports one error per mode, each naming :t2 and
    the mode that failed. :custom resolves through custom_actions to
    the where compiler (:custom-actions {:custom where*})."""
    import os

    from mirabelle_spark.golden import launch_tests
    from mirabelle_spark.operators import filters as flt

    custom = {"custom": lambda df, ctx, cond: flt.where(df, cond)}
    base = os.path.join(os.path.dirname(__file__), "resources", "golden")

    ok = launch_tests(
        spark,
        [os.path.join(base, "successful", "streams")],
        [os.path.join(base, "successful", "tests")],
        custom_actions=custom,
        mode="dual",
    )
    assert ok == "All tests successful"

    bad = launch_tests(
        spark,
        [os.path.join(base, "failed", "streams")],
        [os.path.join(base, "failed", "tests")],
        custom_actions=custom,
        mode="dual",
    )
    assert "2 errors" in bad
    assert "in test :t2\n" in bad
    assert "in test :t2 (streaming)\n" in bad
    # the custom-action shadow is restored after the run
    from mirabelle_spark.plans.builder import _ACTIONS

    assert _ACTIONS["custom"] is not custom["custom"]


def test_throttle_golden_reference_case(spark):
    """action_test.clj:528-567 (both arities). The reference arrival
    order includes a late t=3 event; our batch op is event-time
    ordered, and under the anchored-window recurrence both orders
    drop it — outputs match the deftest verbatim."""
    events = [
        {"time": t, "metric": 1, "state": "ok"}
        for t in (0, 1, 5, 7, 3, 12, 14, 16, 18)
    ]
    _case(spark, {"action": "throttle",
                  "params": [{"count": 1, "duration": 5}]},
          events,
          [{"time": 0.0}, {"time": 5.0}, {"time": 12.0}, {"time": 18.0}])
    _case(spark, {"action": "throttle",
                  "params": [{"count": 2, "duration": 5}]},
          events,
          [{"time": 0.0}, {"time": 1.0}, {"time": 5.0}, {"time": 7.0},
           {"time": 12.0}, {"time": 14.0}, {"time": 18.0}])


def test_coll_percentiles_golden_reference_case(spark):
    """action_test.clj:857-868: quantiles [0, 0.5, 1] over the
    window [3,1,2] → 1/2/3. Divergence (documented in COVERAGE.md):
    the reference labels each output with attributes {:quantile "q"};
    we emit a typed `quantile` column instead of a string-keyed
    attribute map."""
    _case(spark, {"action": "coll-percentiles",
                  "params": [{"quantiles": [0, 0.5, 1], "duration": 10}]},
          [{"time": 1, "metric": 3}, {"time": 2, "metric": 1},
           {"time": 3, "metric": 2}],
          [{"metric": 1.0, "quantile": 0.0},
           {"metric": 2.0, "quantile": 0.5},
           {"metric": 3.0, "quantile": 1.0}])


def test_by_fork_golden_reference_case(spark):
    """stream_test.clj:279-309 (simple example): `by :host` forks
    fixed-event-window state per key — each host fills its own
    2-event buckets, never mixing. Batch folds all 8 events at once,
    so the assertion is the reference's FINAL recorder state."""
    from mirabelle_spark.golden import _df_from_events
    from mirabelle_spark.plans.builder import Ctx, compile_stream

    events = [
        {"host": "foo", "metric": 1, "time": 1},
        {"host": "foo", "metric": 2, "time": 1},
        {"host": "bar", "metric": 3, "time": 1},
        {"host": "bar", "metric": 4, "time": 1},
        {"host": "bar", "metric": 5, "time": 2},
        {"host": "bar", "metric": 6, "time": 2},
        {"host": "baz", "metric": 4, "time": 1},
        {"host": "baz", "metric": 7, "time": 4},
    ]
    df = _df_from_events(spark, events)
    tree = {
        "action": "by", "params": [{"fields": ["host"]}],
        "children": [{
            "action": "fixed-event-window", "params": [{"size": 2}],
            "children": [{"action": "test-action", "params": ["rec"]}],
        }],
    }
    ctx = compile_stream(df, tree, Ctx(order_cols=("seq",), test_mode=True))
    got = sorted(
        (r.host, r.window_id, tuple((e.metric, e.time.timestamp()) for e in r.events))
        for r in ctx.taps["rec"].collect()
    )
    assert got == [
        ("bar", 0, ((3.0, 1.0), (4.0, 1.0))),
        ("bar", 1, ((5.0, 2.0), (6.0, 2.0))),
        ("baz", 0, ((4.0, 1.0), (7.0, 4.0))),
        ("foo", 0, ((1.0, 1.0), (2.0, 1.0))),
    ]


# ---------------------------------------------------------------------------
# batch AND streaming: the same builder tree compiles over a bounded
# DataFrame and over a file-source streaming DataFrame (stateless
# actions are streaming-transparent — same operators, no twins needed).
# Cases are the reference deftest values (action_test.clj lines cited).

_STREAMABLE_GOLDEN_CASES = [
    ("where_pos", {"action": "where", "params": [[":pos?", "metric"]]},
     [{"metric": 10}, {"metric": -1}], [{"metric": 10}]),                      # :21
    ("where_and", {"action": "where",
                   "params": [[":and", [":>", "metric", 20], [":<", "metric", 40]]]},
     [{"metric": -1}, {"metric": 30}, {"metric": 31}, {"metric": 50}],
     [{"metric": 30}, {"metric": 31}]),                                        # :39
    ("where_or", {"action": "where",
                  "params": [[":or", [":<", "metric", 20], [":>", "metric", 40]]]},
     [{"metric": -1}, {"metric": 30}, {"metric": 31}, {"metric": 50}],
     [{"metric": -1}, {"metric": 50}]),                                        # :49
    ("increment", {"action": "increment", "params": []},
     [{"metric": 10}, {"metric": 11}], [{"metric": 11}, {"metric": 12}]),      # :127
    ("decrement", {"action": "decrement", "params": []},
     [{"metric": 10}, {"metric": 11}], [{"metric": 9}, {"metric": 10}]),       # :134
    ("over", {"action": "over", "params": [10]},
     [{"metric": 41}, {"metric": 9}], [{"metric": 41}]),                       # :252
    ("under", {"action": "under", "params": [10]},
     [{"metric": 41}, {"metric": 9}], [{"metric": 9}]),                        # :252
    ("scale", {"action": "scale", "params": [100]},
     [{"metric": 10}, {"metric": 1.2}], [{"metric": 1000}, {"metric": 120}]),  # :890
    ("with", {"action": "with", "params": [{"state": "critical"}]},
     [{"metric": 10, "state": "ok"}], [{"metric": 10, "state": "critical"}]),  # :62
    ("default", {"action": "default", "params": [{"state": "ok"}]},
     [{"metric": 1}, {"metric": 2, "state": "critical"}],
     [{"metric": 1, "state": "ok"}, {"metric": 2, "state": "critical"}]),      # :110
    ("sdissoc", {"action": "sdissoc", "params": [["host", "service"]]},
     [{"metric": 1, "host": "h", "service": "s"}], [{"metric": 1}]),           # :937
    ("tagged_all", {"action": "tagged-all", "params": ["foo"]},
     [{"metric": 3}, {"metric": 1, "tags": ["a"]}, {"metric": 2, "tags": ["foo"]}],
     [{"metric": 2, "tags": ["foo"]}]),                                        # :869
    ("tag", {"action": "tag", "params": ["foo"]},
     [{"metric": 1}], [{"metric": 1, "tags": ["foo"]}]),                       # :62
]

_GOLDEN_STREAM_SCHEMA = (
    "time double, metric double, host string, service string, "
    "state string, tags array<string>, seq bigint"
)


@pytest.mark.parametrize(
    "name,tree,inp,expected",
    _STREAMABLE_GOLDEN_CASES,
    ids=[c[0] for c in _STREAMABLE_GOLDEN_CASES],
)
def test_golden_batch_and_streaming(spark, tmp_path, name, tree, inp, expected):
    import json as _json

    from mirabelle_spark.golden import _multiset_mismatches, _norm
    from mirabelle_spark.plans.builder import Ctx, compile_stream
    from mirabelle_spark.streaming import to_memory

    # batch
    _case(spark, tree, inp, expected)

    # streaming: identical tree over a file source, availableNow
    src_dir = tmp_path / name
    src_dir.mkdir()
    with open(src_dir / "p.json", "w") as f:
        for i, r in enumerate(inp):
            f.write(_json.dumps({
                "time": float(r["time"]) if r.get("time") is not None else None,
                "metric": r.get("metric"), "host": r.get("host"),
                "service": r.get("service"), "state": r.get("state"),
                "tags": r.get("tags"), "seq": i,
            }) + "\n")
    stream = (
        spark.readStream.format("json")
        .schema(_GOLDEN_STREAM_SCHEMA)
        .load(str(src_dir))
        .withColumn("time", F.timestamp_seconds("time"))
    )
    full_tree = {**tree, "children": [{"action": "tap", "params": ["out"]}]}
    ctx = compile_stream(stream, full_tree, Ctx(order_cols=("seq",), test_mode=True))
    q = to_memory(ctx.taps["out"], f"golden_{name}")
    q.awaitTermination(60)
    got = [
        {k: _norm(v) for k, v in r.asDict().items() if v is not None}
        for r in spark.sql(f"select * from golden_{name}").collect()
    ]
    exp = [{k: _norm(v) for k, v in e.items()} for e in expected]
    assert not _multiset_mismatches(got, exp), (got, exp)


def test_moving_event_window_golden_reference_case(spark):
    """action_test.clj:616-645: after each event, the trailing ≤5
    events form the window."""
    from mirabelle_spark.golden import _df_from_events
    from mirabelle_spark.plans.builder import Ctx, compile_stream

    times = [0, 1, 3, 9, 10, 29]
    events = [{"metric": 1, "time": t, "state": "ok"} for t in times]
    tree = {
        "action": "moving-event-window", "params": [{"size": 5}],
        "children": [{"action": "tap", "params": ["out"]}],
    }
    ctx = compile_stream(
        _df_from_events(spark, events), tree, Ctx(order_cols=("seq",), test_mode=True)
    )
    got = sorted(
        tuple(e.time.timestamp() for e in r.events)
        for r in ctx.taps["out"].collect()
    )
    assert got == sorted([
        (0.0,), (0.0, 1.0), (0.0, 1.0, 3.0), (0.0, 1.0, 3.0, 9.0),
        (0.0, 1.0, 3.0, 9.0, 10.0), (1.0, 3.0, 9.0, 10.0, 29.0),
    ])


def test_coll_top_bottom_golden_reference_case(spark):
    """action_test.clj:1060-1084: top-2 / bottom-2 per window —
    three event-windows expressed as three time buckets."""
    wins = [[10, 4, 100, 2], [10], [-10, 1, 2, 0]]
    events = [
        {"time": w * 10 + i, "metric": m}
        for w, ms in enumerate(wins)
        for i, m in enumerate(ms)
    ]
    _case(spark, {"action": "coll-top", "params": [{"nb": 2, "duration": 10}]},
          events,
          [{"metric": 100.0}, {"metric": 10.0},   # window 1
           {"metric": 10.0},                       # window 2
           {"metric": 2.0}, {"metric": 1.0}])      # window 3
    _case(spark, {"action": "coll-bottom", "params": [{"nb": 2, "duration": 10}]},
          events,
          [{"metric": 2.0}, {"metric": 4.0},
           {"metric": 10.0},
           {"metric": -10.0}, {"metric": 0.0}])


def test_coll_quotient_golden_reference_case(spark):
    """action_test.clj:344-351: sequential fold 1/10/5 = 0.02."""
    _case(spark, {"action": "coll-quotient", "params": [{"duration": 10}]},
          [{"time": 0, "metric": 1}, {"time": 1, "metric": 10},
           {"time": 2, "metric": 5}],
          [{"metric": 0.02}])


def test_expired_not_expired_golden_reference_cases(spark):
    """action_test.clj:183-209: expiry vs the arrival-ordered stream
    clock (running max time) — state "expired" short-circuits, ttl
    defaults to 120, age computed against the clock (60), boundary
    age == ttl is NOT expired."""
    _case(spark, {"action": "expired", "params": []},
          [{"state": "expired"}, {"state": "ok"}, {"time": 60},
           {"time": 10}, {"time": 10, "ttl": 10}, {"time": 10, "ttl": 50}],
          [{"state": "expired"}, {"time": 10.0, "ttl": 10.0}])
    _case(spark, {"action": "not-expired", "params": []},
          [{"state": "expired"}, {"state": "ok"}, {"time": 1},
           {"time": 60}, {"time": 1, "ttl": 10}, {"time": 1, "ttl": 120}],
          [{"state": "ok"}, {"time": 1.0}, {"time": 60.0},
           {"time": 1.0, "ttl": 120.0}])


def test_cond_dt_golden_reference_case(spark):
    """action_test.clj:211-226: condition must hold > dt across
    events; null-time events are skipped entirely (neither pass nor
    reset — `when event-time`); an invalid event resets the flip."""
    _case(spark, {"action": "cond-dt",
                  "params": [[":>", "metric", 10], {"duration": 10}]},
          [{"time": 1, "metric": 12}, {"time": 4, "metric": 12},
           {"metric": 12},
           {"time": 12, "metric": 12}, {"time": 22, "metric": 13},
           {"time": 23, "metric": 1}, {"metric": 1},
           {"time": 25, "metric": 11}, {"time": 36, "metric": 12}],
          [{"time": 12.0, "metric": 12.0}, {"time": 22.0, "metric": 13.0},
           {"time": 36.0, "metric": 12.0}])


def test_multiset_matcher_overlapping_expectations():
    """Subset-match is not an equivalence relation: a broad
    expectation must not strand a narrower one that only one row can
    satisfy (most-specific-first consumption)."""
    from mirabelle_spark.golden import _multiset_mismatches

    got = [{"metric": 1, "host": "a"}, {"metric": 1}]
    exp = [{"metric": 1}, {"metric": 1, "host": "a"}]
    assert _multiset_mismatches(got, exp) == []
    # a genuinely missing expectation still fails
    assert _multiset_mismatches(got, [{"metric": 2}, {"metric": 1}, {"metric": 1}])


def test_coll_mean_golden_reference_case(spark):
    """action_test.clj:155-174: per-window mean, incl. the
    multi-field window whose mean is 20. Windows expressed as
    duration-10 time buckets; our coll-mean emits the typed metric
    (the reference also carries the max-time event's fields)."""
    _case(spark, {"action": "coll-mean", "params": [{"duration": 10}]},
          [{"time": 0, "metric": 10},
           {"time": 10, "metric": 10}, {"time": 11, "metric": 12},
           {"time": 20, "metric": 10},
           {"time": 33, "metric": 10}, {"time": 31, "metric": 20},
           {"time": 32, "metric": 30}],
          [{"metric": 10.0}, {"metric": 11.0}, {"metric": 10.0},
           {"metric": 20.0}])


def test_coll_max_min_sum_golden_reference_cases(spark):
    """action_test.clj:333-374: one window [1, 10, nil, nil, 5] →
    max 10 / min 1 / sum 16 (nil metrics count as 0 for sum, are
    ignored by max/min)."""
    events = [{"time": 0, "metric": 1}, {"time": 1, "metric": 10},
              {"time": 2}, {"time": 3}, {"time": 4, "metric": 5}]
    _case(spark, {"action": "coll-max", "params": [{"duration": 10}]},
          events, [{"metric": 10.0}])
    _case(spark, {"action": "coll-min", "params": [{"duration": 10}]},
          events, [{"metric": 1.0}])
    _case(spark, {"action": "coll-sum", "params": [{"duration": 10}]},
          events, [{"metric": 16.0}])


def test_coll_rate_golden_reference_cases(spark):
    """action_test.clj:375-404: sum/time-span per window; a
    single-event (zero-span) window emits the plain sum."""
    _case(spark, {"action": "coll-rate", "params": [{"duration": 100}]},
          [{"time": 1, "metric": 1}],
          [{"metric": 1.0}])
    _case(spark, {"action": "coll-rate", "params": [{"duration": 100}]},
          [{"time": 1, "metric": 1}, {"time": 2, "metric": 10},
           {"time": 3, "metric": 4}, {"time": 1, "metric": 10},
           {"time": 4, "metric": 5}],
          [{"metric": 10.0}])  # 30 / (4-1)
    _case(spark, {"action": "coll-rate", "params": [{"duration": 100}]},
          [{"time": 0, "metric": 1}, {"time": 2, "metric": 1},
           {"time": 3, "metric": 1}, {"time": 1, "metric": 1},
           {"time": 10, "metric": 1}],
          [{"metric": 0.5}])  # 5 / 10
    _case(spark, {"action": "coll-rate", "params": [{"duration": 100}]},
          [{"time": 1, "metric": 1}, {"time": 2, "metric": 2},
           {"time": 3, "metric": 1}],
          [{"metric": 2.0}])  # 4 / 2


def test_coll_increase_golden_reference_case(spark):
    """action_test.clj:1442-1458: counter increase = latest − oldest
    per window; a counter reset (negative increase) emits nothing."""
    _case(spark, {"action": "coll-increase", "params": [{"duration": 13}]},
          [{"time": 1, "metric": 10}, {"time": 2, "metric": 20},
           {"time": 11, "metric": 50},
           {"time": 14, "metric": 60}, {"time": 25, "metric": 90}],
          [{"metric": 40.0}, {"metric": 30.0}])
    _case(spark, {"action": "coll-increase", "params": [{"duration": 13}]},
          [{"time": 1, "metric": 10}, {"time": 2, "metric": 20},
           {"time": 11, "metric": 1}],
          [])


def test_coll_count_golden_reference_case(spark):
    """action_test.clj count*-test: events per window (the empty
    window of the reference's direct-injection harness cannot occur
    in an event stream; sizes 1/2/3 covered)."""
    _case(spark, {"action": "coll-count", "params": [{"duration": 10}]},
          [{"time": 0},
           {"time": 10}, {"time": 11},
           {"time": 20}, {"time": 21}, {"time": 22}],
          [{"metric": 1.0}, {"metric": 2.0}, {"metric": 3.0}])


def test_ratio_golden_reference_case(spark):
    """action_test.clj ratio-test: error/total count ratio per
    duration-10 window ([:= :state error] vs [:true]); our ratio
    emits the typed metric per window."""
    _case(spark, {"action": "ratio",
                  "params": [[[":=", "state", "error"], [":true"]],
                             {"duration": 10}]},
          [{"state": "ok", "time": 1}, {"state": "ok", "time": 2},
           {"state": "ok", "time": 2}, {"state": "error", "time": 3},
           {"state": "ok", "time": 4},
           {"state": "ok", "time": 12}, {"state": "error", "time": 13},
           {"state": "ok", "time": 19}],
          [{"metric": 0.2}, {"metric": 1 / 3}])


def test_sdo_golden_reference_case(spark):
    """action_test.clj:176-181: sdo is a structural no-op."""
    _case(spark, {"action": "sdo", "params": []},
          [{"metric": 10}], [{"metric": 10.0}])


def test_moving_time_window_golden_reference_case(spark):
    """action_test.clj moving-time-window*: after each event, all
    events within the trailing 5 s (inclusive window = duration−ε,
    so the time-13 window keeps 10/11/13 but drops 7)."""
    from mirabelle_spark.golden import _df_from_events
    from mirabelle_spark.plans.builder import Ctx, compile_stream

    events = [{"time": t} for t in [3, 5, 7, 10, 11, 13]]
    tree = {
        "action": "moving-time-window", "params": [{"duration": 5}],
        "children": [{"action": "tap", "params": ["out"]}],
    }
    ctx = compile_stream(
        _df_from_events(spark, events), tree, Ctx(order_cols=("seq",), test_mode=True)
    )
    got = sorted(
        tuple(e.time.timestamp() for e in r.events)
        for r in ctx.taps["out"].collect()
    )
    assert got == sorted([
        (3.0,), (3.0, 5.0), (3.0, 5.0, 7.0), (7.0, 10.0),
        (7.0, 10.0, 11.0), (10.0, 11.0, 13.0),
    ])


def test_ssort_golden_reference_case(spark):
    """action_test.clj ssort*-test: buffer 5 s, re-emit sorted by
    time. Batch sorts every bucket (no delay-based tail drop — the
    streaming twin owns the watermark semantics), so ALL events
    emerge bucket-sorted."""
    times = [0, 3, 2, 4, 1, 10, 14, 12, 19, 49, 47, 51, 49, 100]
    _case(spark, {"action": "ssort", "params": [{"duration": 5, "field": "time"}]},
          [{"time": t} for t in times],
          [{"time": float(t)} for t in sorted(times)])


def test_aggr_rate_golden_reference_case(spark):
    """action_test.clj aggr-rate*-test (no delay): rate = events per
    window / duration. The reference's recorder stops before the
    final [30,40) window flushes; batch folds everything, so that
    window's 0.1 appears too."""
    _case(spark, {"action": "rate", "params": [{"duration": 10}]},
          [{"time": 0, "metric": 10}, {"time": 7, "metric": 1},
           {"time": 11, "metric": 3}, {"time": 14, "metric": 8},
           {"time": 19, "metric": 1}, {"time": 20, "metric": 2},
           {"time": 21, "metric": 2}, {"time": 21, "metric": 2000},
           {"time": 24, "metric": 24}, {"time": 22, "metric": 24},
           {"time": 31, "metric": 1}],
          [{"metric": 0.2}, {"metric": 0.3}, {"metric": 0.5},
           {"metric": 0.1}])


def test_percentiles_golden_reference_case(spark):
    """action_test.clj percentiles-test: window [100, 200×5, 800] →
    q0/q0.5/q0.99/q1 = 100/200/800/800; the 800@12 second window
    (all quantiles 800) also folds in batch. We emit a typed
    quantile column (the reference labels via attributes)."""
    _case(spark, {"action": "percentiles",
                  "params": [{"quantiles": [0, 0.5, 0.99, 1], "duration": 10}]},
          [{"time": 1, "metric": 100}] +
          [{"time": 2, "metric": 200} for _ in range(5)] +
          [{"time": 4, "metric": 800}, {"time": 12, "metric": 800}],
          [{"metric": 100.0, "quantile": 0.0}, {"metric": 200.0, "quantile": 0.5},
           {"metric": 800.0, "quantile": 0.99}, {"metric": 800.0, "quantile": 1.0},
           {"metric": 800.0, "quantile": 0.0}, {"metric": 800.0, "quantile": 0.5},
           {"metric": 800.0, "quantile": 0.99}, {"metric": 800.0, "quantile": 1.0}])


def test_sessionize_golden_batch_and_streaming(spark, tmp_path):
    """Dual-mode golden case for the beyond-reference `sessionize`
    action (r7: the 13-case stateless corpus predates it): the same
    `by host -> sessionize` tree over a bounded DataFrame and over a
    file-source stream on availableNow yields identical sessions."""
    import json as _json

    from mirabelle_spark.plans.builder import Ctx, compile_stream
    from mirabelle_spark.streaming import to_memory

    inp = [
        {"time": 0.0, "metric": 1.0, "host": "a"},
        {"time": 10.0, "metric": 3.0, "host": "a"},
        {"time": 500.0, "metric": 5.0, "host": "a"},
        {"time": 5.0, "metric": 7.0, "host": "b"},
    ]
    expected = {
        ("a", 0, 2, 4.0), ("a", 500_000_000, 1, 5.0), ("b", 5_000_000, 1, 7.0),
    }
    tree = {
        "action": "by", "params": [{"fields": ["host"]}],
        "children": [{
            "action": "sessionize", "params": [{"gap": 30.0}],
            "children": [{"action": "tap", "params": ["sess"]}],
        }],
    }

    from mirabelle_spark.golden import _df_from_events
    bctx = compile_stream(
        _df_from_events(spark, inp), tree, Ctx(order_cols=("seq",), test_mode=True)
    )
    got_b = {
        (r.host, r.session_start, r.n_events, r.metric)
        for r in bctx.taps["sess"].collect()
    }
    assert got_b == expected

    src_dir = tmp_path / "sess_src"
    src_dir.mkdir()
    with open(src_dir / "p.json", "w") as f:
        for r in inp:
            f.write(_json.dumps(r) + "\n")
    stream = (
        spark.readStream.format("json")
        .schema("time double, metric double, host string")
        .load(str(src_dir))
        .withColumn("time", F.timestamp_seconds("time"))
    )
    sctx = compile_stream(stream, tree, Ctx(streaming=True, test_mode=True))
    q = to_memory(sctx.taps["sess"], "golden_sess_dual", output_mode="complete")
    q.awaitTermination(60)
    got_s = {
        (r.host, r.session_start, r.n_events, r.metric)
        for r in spark.sql("select * from golden_sess_dual").collect()
    }
    assert got_s == expected


def test_zscore_golden_batch_and_streaming(spark, tmp_path):
    """Dual-mode golden case for the beyond-reference `zscore` action
    (streaming twin added r7): same `by host -> zscore` tree, both
    modes, identical z column (warmup rows NULL below min-n)."""
    import json as _json

    from mirabelle_spark.plans.builder import Ctx, compile_stream
    from mirabelle_spark.streaming import to_memory

    inp = [
        {"time": 0.0, "metric": 1.0, "host": "a"},
        {"time": 10.0, "metric": 3.0, "host": "a"},
        {"time": 500.0, "metric": 5.0, "host": "a"},
        {"time": 1.0, "metric": 2.0, "host": "b"},
    ]
    # host a: t=0 warmup (n=1); t=10 window {1,3}: mean 2, var 1, z=1;
    # t=500 window {5} alone (n=1) -> NULL; host b: single event -> NULL
    expected = {(1.0, None), (3.0, 1.0), (5.0, None), (2.0, None)}
    tree = {
        "action": "by", "params": [{"fields": ["host"]}],
        "children": [{
            "action": "zscore", "params": [{"window": 60.0, "min-n": 2}],
            "children": [{"action": "tap", "params": ["z"]}],
        }],
    }

    from mirabelle_spark.golden import _df_from_events
    bctx = compile_stream(
        _df_from_events(spark, inp), tree, Ctx(order_cols=("seq",), test_mode=True)
    )
    got_b = {(r.metric, r.zscore) for r in bctx.taps["z"].collect()}
    assert got_b == expected

    src_dir = tmp_path / "zs_src"
    src_dir.mkdir()
    with open(src_dir / "p.json", "w") as f:
        for r in inp:
            f.write(_json.dumps(r) + "\n")
    stream = (
        spark.readStream.format("json")
        .schema("time double, metric double, host string")
        .load(str(src_dir))
        .withColumn("time", F.timestamp_seconds("time"))
    )
    sctx = compile_stream(stream, tree, Ctx(streaming=True, test_mode=True))
    q = to_memory(sctx.taps["z"], "golden_zs_dual")
    q.awaitTermination(60)
    got_s = {(r.metric, r.zscore) for r in spark.sql("select * from golden_zs_dual").collect()}
    assert got_s == expected


# Note: the r7 golden-dir additions (streams_r7.json / test_r7.json —
# sessionize + zscore through the directory runner) ride
# test_launch_tests_directory_runner above.
