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
                "ttl": float(r["ttl"]) if r.get("ttl") is not None else None,
                "seq": i,
            }
        )
    df = spark.createDataFrame(
        norm,
        schema="time_s double, metric double, host string, service string, "
        "state string, tags array<string>, ttl double, seq bigint",
    )
    return df.withColumn("time", F.timestamp_seconds("time_s")).drop("time_s")


def _multiset_mismatches(got: list[dict], exp: list[dict]) -> list[str]:
    """Multiset compare: each expected event CONSUMES one matching
    actual row (subset match on the expected keys). Matching without
    removal lets duplicate expectations all satisfy themselves on a
    single row while an unexpected actual slips through unchecked —
    the reference runner compares exactly (test.clj:41-82)."""
    msgs: list[str] = []
    remaining = list(got)
    # consume most-specific expectations (most keys) first: subset
    # matching is not an equivalence relation, so a broad expectation
    # greedily eating a row can strand a narrower one that only that
    # row satisfies — specificity ordering makes greedy exact here
    # whenever expectations are nested (the overlap shape the EDN
    # corpus actually uses). Known limit: two same-arity expectations
    # whose match sets overlap but aren't nested can still strand each
    # other (greedy != maximum bipartite matching); if the corpus ever
    # grows such a case, replace this loop with Hopcroft–Karp over the
    # subset-match relation
    for e in sorted(exp, key=lambda d: -len(d)):
        hit = next(
            (
                i
                for i, g in enumerate(remaining)
                if all(g.get(k) == v for k, v in e.items())
            ),
            None,
        )
        if hit is None:
            msgs.append(f"expected event not captured: {e}")
        else:
            remaining.pop(hit)
    if len(got) != len(exp):
        msgs.append(f"count mismatch: got {len(got)}, expected {len(exp)}")
    return msgs


def run_case(spark: SparkSession, case: dict) -> dict[str, list[str]]:
    """Run one golden case; returns {tap: list of mismatch messages}
    (empty lists everywhere = pass)."""
    df = _df_from_events(spark, case["input"])
    ctx = compile_stream(
        df, case["tree"], Ctx(order_cols=("seq",), test_mode=True)
    )
    failures: dict[str, list[str]] = {}
    for tap_name, expected in case.get("taps", {}).items():
        if tap_name not in ctx.taps:
            failures[tap_name] = [f"tap {tap_name!r} never captured"]
            continue
        got_rows = ctx.taps[tap_name].collect()
        got = [
            {k: _norm(v) for k, v in r.asDict().items() if v is not None}
            for r in got_rows
        ]
        exp = [{k: _norm(v) for k, v in e.items()} for e in expected]
        failures[tap_name] = _multiset_mismatches(got, exp)
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


def _stream_from_events(spark: SparkSession, rows: list[dict], src_dir: str):
    """File-source streaming twin of :func:`_df_from_events`: the
    same rows as JSON lines → readStream with the identical schema.
    One file here means one micro-batch — the dual-mode runner's
    point is streaming-twin dispatch + sink semantics (the per-twin
    cross-batch state tests live in test_streaming.py)."""
    import json
    import os

    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "input.json"), "w") as f:
        for i, r in enumerate(rows):
            f.write(json.dumps({
                "time_s": float(r["time"]) if r.get("time") is not None else None,
                "metric": float(r["metric"]) if r.get("metric") is not None else None,
                "host": r.get("host"),
                "service": r.get("service"),
                "state": r.get("state"),
                "tags": r.get("tags"),
                "ttl": float(r["ttl"]) if r.get("ttl") is not None else None,
                "seq": i,
            }) + "\n")
    stream = (
        spark.readStream.format("json")
        .schema(
            "time_s double, metric double, host string, service string, "
            "state string, tags array<string>, ttl double, seq bigint"
        )
        .load(src_dir)
    )
    return stream.withColumn("time", F.timestamp_seconds("time_s")).drop("time_s")


_DUAL_SEQ = [0]  # unique memory-sink names across a session's runs


def _collect_tap_streaming(spark, tap_df) -> list:
    """Drain one streaming tap through an availableNow memory sink.
    Aggregation taps (windowed/sessionized `Aggregate` in the
    analyzed plan) run in COMPLETE mode — append only emits windows
    the watermark has sealed, which on a finite input silently drops
    the final window/session (it wouldn't raise, it would just lose
    rows); everything else (per-event twins, keyed state) appends —
    the same mode split the dual-mode parity tests apply by hand."""
    from mirabelle_spark.streaming.core import to_memory

    _DUAL_SEQ[0] += 1
    name = f"golden_dual_{_DUAL_SEQ[0]}"
    # structural walk of the analyzed plan, not a plan-STRING
    # substring match: a literal containing "Aggregate" must not flip
    # the output mode (ADVICE r8 #4)
    stack = [tap_df._jdf.queryExecution().analyzed()]
    has_agg = False
    while stack and not has_agg:
        node = stack.pop()
        if node.nodeName() == "Aggregate":
            has_agg = True
        else:
            kids = node.children()
            stack.extend(kids.apply(i) for i in range(kids.size()))
    mode = "complete" if has_agg else "append"
    q = to_memory(tap_df, name, output_mode=mode)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming tap {name} did not drain within 300 s — "
            "refusing to diff a partial memory sink"
        )
    return spark.sql(f"select * from {name}").collect()


def launch_tests(
    spark: SparkSession,
    stream_dirs: list[str],
    test_dirs: list[str],
    custom_actions: dict | None = None,
    mode: str = "batch",
) -> str:
    """The reference's product test runner (test.clj:41-90 /
    ``mirabelle test``): stream configs and test cases load from
    directories; each test pushes its input into the target stream
    (or every ``default: true`` stream) and diffs each tap against
    the expectation. Returns the same human-readable verdict string
    ("All tests successful" / "N errors" + per-test detail).

    File format is the JSON mirror of the EDN dirs: stream files hold
    ``{name: {"default": bool, "actions": tree}}``, test files hold
    ``{name: {"input": [events], "target": name?, "taps": {...}}}``.
    Taps share one namespace across streams (pushing to two default
    streams that both tap "foo" unions into one tap), matching the
    reference's global tap atom.

    ``custom_actions`` maps action names to
    ``fn(df, ctx, *params) -> DataFrame`` — the reference's
    ``:custom-actions`` config (test.clj:52-54 wires e.g.
    ``{:custom where*}``); entries shadow built-in actions for the
    duration of the run.

    ``mode``: ``"batch"`` (the reference runner's shape),
    ``"streaming"`` (the same trees compiled over an availableNow
    file source, dispatching to the streaming twins), or ``"dual"``
    (every case must pass BOTH — errors name the failing mode).
    """
    import json
    import os

    from mirabelle_spark.plans.builder import _ACTIONS, _USER_ACTIONS

    shadowed: dict = {}
    newly_user: list[str] = []
    for cname, cfn in (custom_actions or {}).items():
        shadowed[cname] = _ACTIONS.get(cname)
        _ACTIONS[cname] = cfn
        if cname not in _USER_ACTIONS:
            # shadows are spec-free for the run (their params follow
            # the user fn's contract, e.g. {:custom where*})
            _USER_ACTIONS.add(cname)
            newly_user.append(cname)

    def read_dirs(dirs: list[str]) -> dict:
        out: dict = {}
        for d in dirs:
            for fname in sorted(os.listdir(d)):
                path = os.path.join(d, fname)
                if os.path.isfile(path):
                    with open(path) as f:
                        out.update(json.load(f))
        return out

    streams = read_dirs(stream_dirs)
    tests = read_dirs(test_dirs)
    errors: list[str] = []
    try:
        for m in ("batch", "streaming") if mode == "dual" else (mode,):
            _run_tests(spark, streams, tests, errors, mode=m)
    finally:
        for cname, old in shadowed.items():
            if old is None:
                _ACTIONS.pop(cname, None)
            else:
                _ACTIONS[cname] = old
        for cname in newly_user:
            _USER_ACTIONS.discard(cname)
    if not errors:
        return "All tests successful"
    return f"{len(errors)} errors\n" + "\n\n----\n\n".join(errors)


def _run_tests(
    spark, streams: dict, tests: dict, errors: list[str], mode: str = "batch"
) -> None:
    import tempfile

    label = "" if mode == "batch" else f" ({mode})"
    for test_name, cfg in tests.items():
        try:
            if mode == "streaming":
                src = tempfile.mkdtemp(prefix=f"golden_{test_name}_")
                df = _stream_from_events(spark, cfg["input"], src)
            else:
                df = _df_from_events(spark, cfg["input"])
            target = cfg.get("target")
            if target:
                run = {target: streams[target]}
            else:
                run = {n: s for n, s in streams.items() if s.get("default")}
            taps: dict[str, Any] = {}
            for _, stream_cfg in run.items():
                ctx = compile_stream(
                    df,
                    stream_cfg["actions"],
                    Ctx(streaming=True, test_mode=True)
                    if mode == "streaming"
                    else Ctx(order_cols=("seq",), test_mode=True),
                )
                for tap_name, tap_df in ctx.taps.items():
                    taps[tap_name] = (
                        taps[tap_name].unionByName(tap_df)
                        if tap_name in taps
                        else tap_df
                    )
            for tap_name, expected in cfg.get("taps", {}).items():
                if tap_name not in taps:
                    got_rows = []
                elif mode == "streaming":
                    got_rows = _collect_tap_streaming(spark, taps[tap_name])
                else:
                    got_rows = taps[tap_name].collect()
                got = [
                    {k: _norm(v) for k, v in r.asDict().items() if v is not None}
                    for r in got_rows
                ]
                exp = [{k: _norm(v) for k, v in e.items()} for e in expected]
                matched = not _multiset_mismatches(got, exp)
                if not matched:
                    errors.append(
                        f"Error in test :{test_name}{label}\nInvalid result for "
                        f"tap {tap_name}\nExpected:\n\n{exp}\n\nActual:\n\n{got}"
                    )
        except Exception as e:  # noqa: BLE001 - mirror :type :exception
            errors.append(
                f"Error in test :{test_name}{label}\nException during test\n{e}"
            )
