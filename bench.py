"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line (r17 shape — per-query sf0.1 MINIMA are back on
stdout; VERDICT r16 ask #1: the r15/r16 totals-only line left the
driver's PERF record with ``per_query: {}``, a null geomean and an
empty scaling table, so every round-over-round judgment had to be
scraped from stderr):
  {"metric": "headline_queries_total", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "n_queries": 54,
   "suite_steal_pct_max": S, "events_per_sec": R,
   "sf1": {"total": T, "n_queries": 26, "worst5": {...},
           "child_overhead_median": O, "steal_pct_max": S1}, "sf": 0.1}

The stdout line is kept UNDER 1,900 BYTES (asserted): the driver
records only a 2,000-byte stdout tail, and every fat payload
r12-r14 shipped truncated into an unparseable record (VERDICT r14
ask #3). Measured at 54 queries the full line is ~1,850 B; the
budget is preserved by dropping ``events_per_sec_runs_sec`` from
stdout (VERDICT r16's designated shed) and by trim-to-fit logic
that sheds sf1 detail BEFORE ever touching the queries map (the
driver's per-query contract outranks the sf1 worst-5). Everything
else — [min, median, max, steal] spreads, sf1 timings, same-JVM
sf0.1 bases, ratios, per-child JVM-overhead baselines, per-run
vectors, the streaming guard row — stays in the
``BENCH_DETAIL.json`` sidecar next to this script.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collection). Timings include Spark job execution, not
session startup.

Measurement hygiene (r2 verdict: recorded times were contention
noise, not plan cost; r8 verdict ask #2: make "environmental drift"
falsifiable; r13, closing the r10/r11/r12 thrice-asked JVM-state
item):
- each query runs BENCH_RUNS times (default 5) and reports the MIN —
  the plan's cost, not the machine's mood — plus the per-query
  spread ([min, median, max] under "spread") so round-over-round
  comparisons are made on minima with the noise band visible.
- the sf1 block runs ONE FRESH CHILD JVM PER QUERY (r14; the r13
  single shared child was retired after its own lesson repeated:
  identical sf0.1 code measured 1.65 s in the parent and 15.4 s as
  a late-list base INSIDE the shared child — a JVM soaks over its
  own lifetime, so every minimum silently depended on the query's
  list position, the same class of trap as r12's 116-s suite-soaked
  reading). Each child warms up untimed, then measures its query's
  sf0.1 base (min of 2) and sf1 time (min of BENCH_SF1_RUNS) —
  both sides of every ratio share one fresh JVM state, and any
  number is reproducible in isolation with
  SPARK_GRAFT_SF1_CHILD=<query> python bench.py.
- ``events_per_sec`` is a SUSTAINED number: the flagship
  where→by→window→sum pipeline over the sf1 events table (10× rows,
  multi-second run) in the fresh child — not extrapolated from one
  sub-second sf0.1 query (the r11/r12 ±30%-on-no-code-change
  artifact). Absent the sf1 block the field is omitted.
- every sf1 run also records the machine's HYPERVISOR-STEAL
  percentage over its own interval (/proc/stat; r15): this VM
  shows 1-9 % steal at idle and episodic noisy-neighbor storms
  that uniformly inflate whichever child they overlap — the
  mechanism behind the r14 driver record's 73.9 s ann_ivfpq_topk
  (reproduced in-context at 73.9/71.7/42.0 while the SAME child
  isolated minutes later read 7.4 s flat, with healthy ~5 s
  overhead probes throughout). A run with steal > 3 % buys up to
  two extra samples so the minimum has a chance to land in clear
  air; the per-run steal vector ships in BENCH_DETAIL.json and the
  block's max on stdout, so a hot record is attributable instead
  of mysterious.
- input splits: the profile still lowers
  ``spark.sql.files.maxPartitionBytes``/``openCostInBytes``, but
  KNOW WHAT IT DOES NOT DO (r13, PERF §80): local testdata files
  have ONE parquet row group, and parquet cannot split below
  row-group granularity — the small-split profile only multiplies
  EMPTY split descriptors (all rows stay in one task) and once even
  fooled a count-based rebalance probe into serializing the sf1
  char-grain explode onto one core (112 s vs 11 s). Real scan
  parallelism on this testdata comes from the operators' explicit
  rebalance (``scale.needs_rebalance``), not from this profile; it
  is kept only for round-over-round comparability. A real 100 TB
  table has thousands of row groups and needs neither.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one representative per operator family, weighted
# toward the shuffle/state-heavy paths that dominate at scale.
BENCH_QUERIES = [
    "where_basic",            # filter pushdown path
    "split_routing",          # CASE fan-out, one scan
    "agg_sum_hourly",         # windowed hash agg (partial+final)
    "by_sum_daily",           # multi-key windowed agg (`by`)
    "agg_percentiles_hourly", # sort_array per window
    "coll_top3",              # windowed top-K (rank + filter)
    "fixed_time_window_ids",  # collect_list windows
    "moving_event_window_vals",  # sliding count window (analytic)
    "ssort_sorted",           # window sort + explode
    "changed_transitions",    # lag transition detect
    "smax_running",           # running extremum (prefix max)
    "ewma_smoothed",          # keyed sequential scan (applyInPandas)
    "throttle",               # keyed anchored-window scan
    "coalesce_fill",          # per-bucket tick explosion (buffer persists)
    "dedup_exact_docs",       # hash dedup
    "dedup_clusters",         # iterative label propagation (graph rounds)
    "text_repetition",        # pure-Catalyst token-array transform
    "minhash_lsh_pairs",      # LSH banding + bucket-groupBy pairs (md5 signatures)
    "ngram_jaccard_pairs",    # LSH candidates + hashed-shingle exact verify
    "simhash_pairs",          # pandas-UDF signature + pigeonhole join
    "ann_bruteforce_topk",    # broadcast + fold dot products
    "ann_ivf_topk",           # fixed-quantizer cell probe (partition pruning shape)
    "ann_pq_topk",            # product-quantization ADC compressed scan
    "sessionize_user_events", # native session_window (dynamic merging windows)
    "zscore_events",          # range-frame rolling moments (decimal-exact)
    "tpch_pricing_summary",   # full-scan rollup (decimal-exact)
    "revenue_by_nation",      # star join: 2 shuffle + 2 broadcast joins
    # r7 additions
    "linear_quality_docs",    # hashed classifier inference (scan->project)
    "token_chunks_docs",      # content-defined chunking (per-doc window)
    "ann_sq_topk",            # SQ8 compressed scan
    "ann_ivfpq_topk",         # IVF-PQ: cell pruning x ADC scan
    "video_frame_sample",     # Arrow-batched container parse
    # r8 additions
    "ann_ivf_trained_topk",   # IVF with the TRAINED quantizer (same plan shape)
    # r9 additions
    "winnow_dedup_pairs",     # MOSS winnowing (gram mins -> bucket pairs)
    "bpe_segment_trained",    # trained-BPE replace chain over the vocab table
    # r10 additions
    "winnow_dedup_pairs_fast",  # xxhash64 winnowing (the 100 TB path)
    "dup_span_removed_docs",  # ExactSubstr span removal (corpus rewrite)
    "ann_ivfpq_rerank_topk",  # IVF-PQ + exact-L2 refinement (production ANN shape)
    # r11 additions
    "dup_span_removed_char_docs",  # byte-grain ExactSubstr (per-char explode)
    "logreg_quality_docs",    # trained-model inference (shuffle-free projection)
    "curate_head_docs",       # quality -> dedup -> mask compose
    "semdedup_survivors",     # k-means cluster-local semantic dedup
    "dsir_top_docs",          # importance-weight scoring + top-k select
    "contamination_bloom_docs",  # Bloom-prefiltered decontamination
    "curate_head_dsir_docs",  # trained domain-gated curation compose
    "volume_shipping",        # Q7-shaped two-fact-join star
    "bpe_fertility_by_lang",  # trained-tokenizer fit audit
    # r13 additions
    "dup_span_removed_twophase_docs",  # skew-bounded ExactSubstr detection
    "lm_quality_docs",        # bigram-LM perplexity gate (map-literal fold)
    # r14 additions
    "lm3_quality_docs",       # trigram-LM gate (3-level broadcast probe)
    "curate_head_lm_docs",    # curation head with join-routed LM gate
    # r16 additions: the perceptual near-dup trio end-to-end (real
    # codec decode in Arrow passes + band join + label propagation)
    "image_near_dups",        # netpbm dHash -> band pairs -> clusters
    "video_near_dups",        # container parse -> frame dHash set sig
    "audio_near_dups",        # WAV envelope dHash -> band pairs
]


# sf1 stress set: the most expensive queries at 10x rows
# (tools/make_sf1.py synthesis), to catch nonlinear blowups sf0.1
# hides. Runs in a FRESH child JVM (see module docstring).
SF1_QUERIES = [
    "dedup_clusters", "ngram_jaccard_pairs", "ann_ivf_topk",
    "minhash_lsh_pairs", "revenue_by_nation", "simhash_pairs",
    # r7 additions (VERDICT r7 ask #6)
    "ann_ivfpq_topk", "token_chunks_docs", "ann_sq_topk",
    "linear_quality_docs", "video_frame_sample", "soft_dedup_docs",
    # r9 additions
    "winnow_dedup_pairs", "bpe_segment_trained",
    # r10 additions
    "winnow_dedup_pairs_fast", "dup_span_removed_docs",
    # r11 additions
    "dup_span_removed_char_docs",
    "dsir_top_docs", "contamination_bloom_docs",
    "curate_head_dsir_docs", "volume_shipping",
    # r13: the sustained-throughput pipeline (events_per_sec source)
    "agg_sum_hourly",
    # r13: SemDeDup at production nlist (64-cell artifact × BLAS
    # kernel) — tracks nlist-prices-the-quadratic round-over-round;
    # the 8-cell arrow entry stays excluded (by-design quadratic)
    "semdedup_prod_arrow_survivors",
    # r13: the skew-bounded two-phase ExactSubstr detection — its
    # sf1 cost vs dup_span_removed_docs (window plan, same n) is
    # the price of hot-gram safety, tracked round-over-round
    "dup_span_removed_twophase_docs",
    # r13: the bigram-LM perplexity gate at 10x rows — the
    # broadcast-probe strategy's scale datapoint (the model side is
    # constant; the corpus side must scale linearly)
    "lm_quality_docs",
    # r14: the trigram gate — 3x the probe columns, ~3.5x the model
    # rows; must stay linear in the corpus like the bigram gate
    "lm3_quality_docs",
    # semdedup_survivors is deliberately NOT here: at the
    # pinned 8-cell quantizer its sf1 pair work is quadratic
    # BY DESIGN (~92 s; the nlist knob and the BLAS mode are
    # measured in PERF §68-69) — 3 runs would dominate the
    # whole bench for a known, documented shape
]


def _make_spark():
    from mirabelle_spark.session import get_spark

    return get_spark(
        app_name="mirabelle_bench",
        extra_conf={
            # local-data split sizing — kept for round-over-round
            # comparability only; it CANNOT create real parallelism
            # on one-row-group local files (parquet splits at
            # row-group granularity; the extra descriptors are
            # empty — see the module docstring and PERF §80)
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "131072",
        },
    )


def _cpu_times() -> tuple[int, int, int, int]:
    """(steal, idle, iowait, total) jiffies from /proc/stat — the
    machine-level counters that turn "the record is the record"
    into a diagnosable record (r15: the 73.9 s ann_ivfpq_topk
    mystery reproduced ONLY inside full-bench runs, with healthy
    5 s JVM-overhead probes and flat isolated reruns minutes
    later). Two distinct interference classes were measured: (a)
    hypervisor-steal storms (this VM shows 1-9 % steal at idle,
    episodes reach 18 %) that inflate whichever child they
    overlap; (b) zero-steal spikes where a run goes ~6-10× with
    the CPU nominally ours — the idle/iowait split recorded here
    separates genuine CPU burn from blocked-waiting for those.
    Returns zeros when unreadable."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        idle = vals[3] if len(vals) > 3 else 0
        iowait = vals[4] if len(vals) > 4 else 0
        return steal, idle, iowait, sum(vals)
    except Exception:
        return 0, 0, 0, 0


def _sf1_child(name: str) -> None:
    """ONE-QUERY fresh-JVM sf1 probe (r14): warm-up (where_basic +
    this query at sf0.1, untimed), then sf0.1 base (min of 2) and
    sf1 (min of BENCH_SF1_RUNS) timings; one JSON line to stdout.

    Why per-QUERY children (the r14 finding that retired the r13
    shared child): a JVM running the whole 26-query sf1 list SOAKS
    OVER ITS OWN LIFETIME — the same sf0.1 query measured 1.65 s in
    the parent and 15.4 s as a late-list base inside the r13-style
    shared child (9×: code-cache/GC/broadcast-backlog state, the
    §80-adjacent trap AGAIN), so every minimum silently depended on
    the query's LIST POSITION. One child per query makes each
    number position-independent and reproducible in isolation:
    SPARK_GRAFT_SF1_CHILD=<query> python bench.py."""
    import __spark_entry__ as entry_mod
    from tools.make_sf1 import ensure_sf1

    spark = _make_spark()
    # fixed-JVM-cost baseline (r15, VERDICT r14 ask #6): time a
    # trivial job + one tiny parquet scan in THIS child before any
    # warm-up, so the per-child overhead is a recorded number and a
    # contended or cold child is self-diagnosing (the r14 record's
    # 2× "regressions" on minhash/ivf were exactly this — lost
    # warm-up credit, not plans). Region has no nano timestamps, so
    # a plain read is safe.
    t0 = time.perf_counter()
    spark.range(1).count()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    overhead = time.perf_counter() - t0
    qs = entry_mod.queries()
    fn = qs[name]
    sf1_dir = ensure_sf1(spark, SF_DIR)
    # warm-up, untimed: session machinery + this query's own code
    # paths (JIT, parquet footers, Arrow init)
    qs["where_basic"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    b = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        b = dt if b is None else min(b, dt)
    sf1_runs = max(int(os.environ.get("BENCH_SF1_RUNS", "3")), 1)
    if name == "agg_sum_hourly":
        # the events_per_sec source: "sustained" means STEADY STATE,
        # and a fresh JVM reaches it only after several runs (min of
        # 3 read 1.95 s where min of 8 reads 1.59 s — pure JIT
        # warm-up, measured r14); the query is ~1.6 s so the extra
        # runs cost seconds
        sf1_runs = max(sf1_runs, 8)
    runs_vec: list[float] = []
    steal_vec: list[float] = []
    busy_vec: list[float] = []
    iowait_vec: list[float] = []

    def timed_run() -> None:
        s0, id0, io0, j0 = _cpu_times()
        t0 = time.perf_counter()
        fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
        runs_vec.append(round(time.perf_counter() - t0, 3))
        s1, id1, io1, j1 = _cpu_times()
        dj = j1 - j0
        steal_vec.append(round(100.0 * (s1 - s0) / dj, 1) if dj > 0 else 0.0)
        iowait_vec.append(
            round(100.0 * (io1 - io0) / dj, 1) if dj > 0 else 0.0
        )
        busy = dj - (id1 - id0) - (io1 - io0) - (s1 - s0)
        busy_vec.append(round(100.0 * busy / dj, 1) if dj > 0 else 0.0)

    for _ in range(sf1_runs):
        timed_run()
    # hypervisor-steal episodes last minutes and inflate EVERY run
    # they overlap (min-of-N can't see through them); when the
    # steal counter says the MINIMUM run was disturbed, buy up to 2
    # extra samples for an honest minimum instead of recording the
    # noise (r16: folded from any-run>3% to steal@min — a steal-free
    # minimum already IS the plan's cost, extra samples bought
    # nothing; VERDICT r15 "what's wrong" #3)
    extra = 0
    while (
        extra < 2
        and steal_vec[min(range(len(runs_vec)), key=runs_vec.__getitem__)] > 3.0
    ):
        timed_run()
        extra += 1
    out = {
        "name": name,
        "base": round(b, 3),
        "sf1": min(runs_vec),
        # full per-run vector (r15, VERDICT r14 ask #5): a contended
        # one-shot driver run shows as a uniformly inflated vector,
        # a JIT ramp as a strictly decreasing one — and the per-run
        # steal%, which separates neighbor noise from plan cost
        "sf1_runs_sec": runs_vec,
        "sf1_steal_pct": steal_vec,
        "sf1_busy_pct": busy_vec,
        "sf1_iowait_pct": iowait_vec,
        "sf1_median": round(statistics.median(runs_vec), 3),
        "overhead": round(overhead, 3),
        "runs": sf1_runs + extra,
    }
    if name == "agg_sum_hourly":
        # sustained engine throughput: the flagship pipeline over
        # the sf1 events table — a multi-second fixed-count run
        out["n_events"] = spark.read.parquet(
            f"{sf1_dir}/events.parquet"
        ).count()
    print(json.dumps(out))


def _run_sf1_block() -> dict:
    """Spawn one fresh child JVM per SF1 query (see _sf1_child) and
    assemble the block payload. ~12 s JVM startup per query is the
    price of position-independent minima."""
    import subprocess

    sf1_timings: dict[str, float] = {}
    base: dict[str, float] = {}
    ratios: dict[str, float | None] = {}
    overheads: dict[str, float] = {}
    run_vecs: dict[str, list[float]] = {}
    steal_vecs: dict[str, list[float]] = {}
    busy_vecs: dict[str, list[float]] = {}
    iowait_vecs: dict[str, list[float]] = {}
    block: dict = {}
    for name in SF1_QUERIES:
        env = dict(os.environ, SPARK_GRAFT_SF1_CHILD=name)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            block.setdefault("errors", {})[name] = proc.stderr[-300:]
            continue
        child = json.loads(proc.stdout.strip().splitlines()[-1])
        base[name] = child["base"]
        sf1_timings[name] = child["sf1"]
        # a sub-ms base rounds to 0.0 — record None instead of
        # aborting the whole block on ZeroDivisionError (ADVICE r14)
        ratios[name] = (
            round(child["sf1"] / child["base"], 2) if child["base"] else None
        )
        overheads[name] = child["overhead"]
        run_vecs[name] = child["sf1_runs_sec"]
        steal_vecs[name] = child.get("sf1_steal_pct", [])
        busy_vecs[name] = child.get("sf1_busy_pct", [])
        iowait_vecs[name] = child.get("sf1_iowait_pct", [])
        print(
            f"# sf1 {name}: {child['sf1']:.3f}s "
            f"({ratios[name] if ratios[name] is not None else 'n/a'}x "
            f"sf0.1 base {child['base']:.3f}s, "
            f"min of {child['runs']}, own JVM, "
            f"overhead {child['overhead']:.2f}s, "
            f"steal {max(steal_vecs[name] or [0.0]):.1f}%)",
            file=sys.stderr,
        )
        if "n_events" in child:
            block["events_per_sec"] = int(child["n_events"] / child["sf1"])
            block["events_per_sec_n_events"] = child["n_events"]
            block["events_per_sec_elapsed"] = child["sf1"]
            block["events_per_sec_runs_sec"] = child["sf1_runs_sec"]
    block.update(
        queries=sf1_timings,
        total=round(sum(sf1_timings.values()), 3),
        ratio_vs_sf0=ratios,
        base_sf0=base,
        child_overhead=overheads,
        runs_sec=run_vecs,
        steal_pct=steal_vecs,
        busy_pct=busy_vecs,
        iowait_pct=iowait_vecs,
        runs_per_query=max(int(os.environ.get("BENCH_SF1_RUNS", "3")), 1),
        fresh_jvm_per_query=True,
    )
    return block


def _run_streaming_block() -> dict | None:
    """Streaming-path throughput row for the round-over-round record
    (r16, VERDICT r15 ask #4): the reference is a STREAMING engine,
    but no BENCH_DETAIL entry tracked any streaming number, so a
    regression there was invisible to the driver record. One child
    run of tools/bench_streaming_state.py measures (a) the flagship
    micro-batch pipeline (windowed sum over 10M events — the JVM
    state tier) and (b) the sharded ewma keyed-state tier at 10M
    events / 1M keys. Goes to BENCH_DETAIL ONLY — the stdout line
    stays inside the driver's 2,000-byte tail window (ask #7).
    Failures degrade to an "error" field, never kill the bench."""
    import subprocess

    tool = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "bench_streaming_state.py",
    )
    events = int(os.environ.get("BENCH_STREAM_EVENTS", "10000000"))

    def attempt() -> dict:
        s0, _, _, j0 = _cpu_times()
        t0 = time.perf_counter()
        proc = subprocess.run(
            [
                sys.executable, tool,
                "--events", str(events),
                "--keys", "1000000",
                "--modes", "jvm,sharded",
            ],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        elapsed = round(time.perf_counter() - t0, 1)
        s1, _, _, j1 = _cpu_times()
        steal = round(100.0 * (s1 - s0) / (j1 - j0), 1) if j1 > j0 else 0.0
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            return {"error": proc.stderr[-300:], "elapsed_sec": elapsed,
                    "steal_pct": steal}
        try:
            res = json.loads(proc.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            return {"error": "unparseable tool output",
                    "elapsed_sec": elapsed, "steal_pct": steal}
        modes = res.get("modes", {})
        return {
            "events": res.get("events"),
            "keys": res.get("keys"),
            "pipeline_ev_s": modes.get("jvm", {}).get("ev_per_s"),
            "pipeline_sec": modes.get("jvm", {}).get("sec"),
            "state_tier_ev_s": modes.get("sharded", {}).get("ev_per_s"),
            "state_tier_sec": modes.get("sharded", {}).get("sec"),
            "steal_pct": steal,
            "elapsed_sec": elapsed,
        }

    # same steal policy as every other timed child (r16): a run under
    # a measured storm buys ONE retry, and the best per-mode readings
    # win — the first committed streaming row must not be a storm
    # sample (the r16 dry-run caught sharded ewma at 89k ev/s under
    # 9.3% steal vs 665k standalone minutes later)
    runs = [attempt()]
    if runs[0].get("error") is None and runs[0]["steal_pct"] > 3.0:
        runs.append(attempt())
    ok = [r for r in runs if r.get("error") is None]
    if not ok:
        return runs[0]
    out = max(
        ok,
        key=lambda r: (r.get("pipeline_ev_s") or 0)
        + (r.get("state_tier_ev_s") or 0),
    )
    out["pipeline_ev_s"] = max((r.get("pipeline_ev_s") or 0) for r in ok)
    out["state_tier_ev_s"] = max((r.get("state_tier_ev_s") or 0) for r in ok)
    out["runs"] = [
        {k: r.get(k) for k in
         ("pipeline_ev_s", "state_tier_ev_s", "steal_pct", "elapsed_sec")}
        for r in runs
    ]
    print(
        f"# streaming: pipeline {out['pipeline_ev_s']} ev/s, "
        f"sharded state tier {out['state_tier_ev_s']} ev/s "
        f"({events} events, {len(runs)} run(s), "
        f"steal {max(r['steal_pct'] for r in runs):.1f}%)",
        file=sys.stderr,
    )
    return out


def compact_stdout_line(payload: dict) -> str:
    """Serialize the stdout payload UNDER the driver's 2,000-byte
    tail window. The 1,900-byte budget is a hard guarantee, but
    TRIM-TO-FIT, not fail-closed (r16, ADVICE r15): the compact
    payload still carries unbounded content (up to one error string
    per sf1 child, worst5 names), and the old bare assert crashed
    AFTER writing the sidecar — exactly in a degraded round, the
    driver got NO stdout record at all. Shed detail in priority
    order (error values → error entries → worst5 entries → optional
    throughput fields → sf1 compact block → non-queries extras)
    until the line fits; the ``queries`` per-query map is the LAST
    thing to go (r17: it is the driver's per_query/scaling source —
    VERDICT r16 ask #1) and survives every realistic degradation.
    The full data is already in BENCH_DETAIL.json. Mutates payload;
    returns the final line."""

    def _fits() -> bool:
        return len(json.dumps(payload, separators=(",", ":"))) < 1900

    sf1c = payload.get("sf1")
    if not _fits() and isinstance(sf1c, dict):
        if "errors" in sf1c:
            sf1c["n_errors"] = len(sf1c["errors"])
            sf1c["errors"] = {k: v[-24:] for k, v in sf1c["errors"].items()}
            for k in list(sf1c["errors"]):
                if _fits():
                    break
                del sf1c["errors"][k]
            if not sf1c["errors"]:
                del sf1c["errors"]
        for k in list(sf1c.get("worst5", {})):
            if _fits():
                break
            del sf1c["worst5"][k]
    # shed optional scalars, then the whole sf1 compact block, before
    # ever touching the queries map
    for k in ("events_per_sec_elapsed", "n_events", "sf1"):
        if _fits():
            break
        payload.pop(k, None)
    if not _fits():
        payload = {
            k: payload[k]
            for k in (
                "metric", "value", "unit", "sf", "queries", "n_queries",
                "suite_steal_pct_max", "events_per_sec",
            )
            if k in payload
        }
    if not _fits():
        payload.pop("queries", None)
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) < 1900, f"bench stdout line {len(line)}B > budget"
    return line


def main() -> None:
    import __spark_entry__ as entry_mod

    child = os.environ.get("SPARK_GRAFT_SF1_CHILD")
    if child:
        _sf1_child(child)
        return

    runs = int(os.environ.get("BENCH_RUNS", "5"))
    spark = _make_spark()
    qs = entry_mod.queries()

    # warmup: JIT + parquet footer + Arrow init, outside the timings
    qs["where_basic"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    total = 0.0
    suite_steal: list[float] = []
    for name in BENCH_QUERIES:
        fn = qs[name]
        samples: list[float] = []
        st: list[float] = []

        def one_sample() -> None:
            s0, _, _, j0 = _cpu_times()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            s1, _, _, j1 = _cpu_times()
            st.append(
                round(100.0 * (s1 - s0) / (j1 - j0), 1) if j1 > j0 else 0.0
            )

        for _ in range(max(runs, 1)):
            one_sample()
        # steal-aware minima for the SUITE too (r16, VERDICT r15 ask
        # #2): r15 only RECORDED steal here, so the driver's one-shot
        # record kept minima that ran under a storm — its own record
        # showed sessionize_user_events 1.215 s at 7.4% steal@min and
        # tpch_pricing_summary 2.296 s at 6.7% as phantom 1.4-2.2×
        # "regressions" on untouched code. Same policy as the sf1
        # children: while the MIN run carries >3% steal, buy up to 2
        # extra samples so the recorded minimum can land in clear air.
        extra = 0
        while (
            extra < 2
            and st[min(range(len(samples)), key=samples.__getitem__)] > 3.0
        ):
            one_sample()
            extra += 1
        # pair each steal reading with its sample BEFORE sorting, so
        # the spread's min/median/max stay attributable
        order = sorted(range(len(samples)), key=samples.__getitem__)
        samples = [samples[i] for i in order]
        st = [st[i] for i in order]
        suite_steal.append(max(st))
        dt = round(samples[0], 3)
        timings[name] = dt
        spread[name] = [
            dt,
            round(statistics.median(samples), 3),
            round(samples[-1], 3),
            st[0],       # steal% during the MIN run — the one recorded
            max(st),     # worst steal% any run of this query saw
        ]
        total += dt
        print(
            f"# {name}: {dt:.3f}s (min of {len(samples)}; "
            f"med {spread[name][1]:.3f}, max {spread[name][2]:.3f}, "
            f"steal@min {st[0]:.1f}%)",
            file=sys.stderr,
        )

    payload = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "runs_per_query": max(runs, 1),
        "spread": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # sf1 stress block: ONE FRESH CHILD JVM PER QUERY (r14; see
    # _sf1_child for why the r13 shared child was retired — its
    # minima depended on list position). The parent session stops
    # first so each child gets the machine to itself. Linear
    # scaling on 32 local cores shows as ratio <= ~10.
    streaming_block = None
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf == "0.1":
        spark.stop()
        block = _run_sf1_block()
        streaming_block = _run_streaming_block()
        if "events_per_sec" in block:
            payload["events_per_sec"] = block.pop("events_per_sec")
            payload["n_events"] = block.pop("events_per_sec_n_events")
            payload["events_per_sec_elapsed"] = block.pop(
                "events_per_sec_elapsed"
            )
            # the per-run vector stays in the sf1 detail block only
            # (r17: VERDICT r16's designated shed — stdout budget now
            # carries the per-query map instead)
        payload["sf1"] = block

    # The driver records only a 2,000-BYTE TAIL of stdout; r12-r14's
    # payloads all truncated into "parsed": null (VERDICT r14 ask
    # #3). r17 (VERDICT r16 ask #1): the per-query sf0.1 MINIMA map
    # is back on stdout — it is the driver's per_query / geomean /
    # scaling source and fits the budget now that
    # events_per_sec_runs_sec moved to the sidecar (full line
    # measured ~1,850 B at 54 queries). Spreads, sf1 vectors and the
    # streaming guard row stay in the BENCH_DETAIL.json sidecar.
    detail = {
        "sf": payload["sf"],
        "runs_per_query": payload["runs_per_query"],
        "queries": dict(payload["queries"]),
        "spread": payload.pop("spread"),
    }
    payload["n_queries"] = len(detail["queries"])
    # one number on stdout attributes a hot suite total: the worst
    # steal% any suite run saw (per-query vectors in the sidecar —
    # spread rows carry [min, med, max, steal@min, steal_max])
    payload["suite_steal_pct_max"] = max(suite_steal, default=0.0)
    sf1 = payload.pop("sf1", None)
    if isinstance(sf1, dict) and "queries" in sf1:
        worst5 = dict(
            sorted(sf1["queries"].items(), key=lambda kv: -kv[1])[:5]
        )
        ovh = sorted(sf1["child_overhead"].values())
        steal_max = max(
            (s for v in sf1["steal_pct"].values() for s in v), default=0.0
        )
        compact = {
            "total": sf1["total"],
            "n_queries": len(sf1["queries"]),
            "worst5": worst5,
            "child_overhead_median": ovh[len(ovh) // 2] if ovh else None,
            "steal_pct_max": steal_max,
        }
        if "errors" in sf1:
            compact["errors"] = {
                k: v[-80:] for k, v in sf1["errors"].items()
            }
        payload["sf1"] = compact
        detail["sf1"] = sf1
    elif sf1 is not None:
        payload["sf1"] = sf1
    if streaming_block is not None:
        # round-over-round streaming guard (r16): BENCH_DETAIL only,
        # never stdout — the line budget is for the driver record
        detail["streaming"] = streaming_block
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
        "w",
    ) as fh:
        json.dump(detail, fh, indent=1)

    print(compact_stdout_line(payload))


if __name__ == "__main__":
    main()
