"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The stdout line is kept COMPACT (the driver records only a stdout
tail; r12/r13's fat payloads truncated into unparseable records —
VERDICT r13 ask #6): per-query minima and headline fields only.
Forensic detail — per-query [min, median, max] spreads, the sf1
block's same-JVM sf0.1 bases and ratios — goes to the
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
- the sf1 block runs in a FRESH CHILD JVM (subprocess; the parent
  session is stopped first). Evidence for why (VERDICT r12):
  identical char-grain ExactSubstr code measured 116 s in the
  suite-soaked bench JVM vs 32-53 s in a fresh session — the soaked
  heap/GC state, not the code, was the signal. Ratios vs sf0.1 are
  computed against base timings measured IN THE SAME fresh child,
  so both sides of every ratio share one JVM state.
- ``events_per_sec`` is a SUSTAINED number: the flagship
  where→by→window→sum pipeline over the sf1 events table (10× rows,
  multi-second run) in the fresh child — not extrapolated from one
  sub-second sf0.1 query (the r11/r12 ±30%-on-no-code-change
  artifact). Absent the sf1 block the field is omitted.
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


def _sf1_child() -> None:
    """Fresh-JVM sf1 block: base (sf0.1, min of 2) and sf1 (min of
    BENCH_SF1_RUNS) timings per query, one JSON line to stdout.
    Both sides of each ratio share this one fresh JVM state."""
    import __spark_entry__ as entry_mod
    from tools.make_sf1 import ensure_sf1

    spark = _make_spark()
    qs = entry_mod.queries()
    # warmup: JIT + parquet footer + Arrow init, outside the timings
    qs["where_basic"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    sf1_dir = ensure_sf1(spark, SF_DIR)
    # one UNTIMED warm-up pass over the whole sf1 list at sf0.1
    # (r14; VERDICT r13 ask #3): JIT-compiles every query's code
    # paths and warms the shuffle machinery before ANY timed run,
    # so cold-start stops polluting the per-query minima — the r13
    # fresh-child methodology otherwise charged the first query
    # families the whole JVM warm-up.
    for name in SF1_QUERIES:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    sf1_runs = int(os.environ.get("BENCH_SF1_RUNS", "3"))
    base: dict[str, float] = {}
    sf1_timings: dict[str, float] = {}
    ratios: dict[str, float] = {}
    for name in SF1_QUERIES:
        b = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            b = dt if b is None else min(b, dt)
        base[name] = round(b, 3)
        best = None
        for _ in range(max(sf1_runs, 1)):
            t0 = time.perf_counter()
            qs[name](spark, sf1_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        sf1_timings[name] = round(best, 3)
        ratios[name] = round(best / b, 2)
        print(
            f"# sf1 {name}: {sf1_timings[name]:.3f}s "
            f"({ratios[name]}x sf0.1 base {base[name]:.3f}s, min of {sf1_runs})",
            file=sys.stderr,
        )
    out = {
        "queries": sf1_timings,
        "total": round(sum(sf1_timings.values()), 3),
        "ratio_vs_sf0.1": ratios,
        "base_sf0.1": base,
        "runs_per_query": max(sf1_runs, 1),
        "fresh_jvm": True,
    }
    # sustained engine throughput: the flagship pipeline over the
    # sf1 events table — a multi-second fixed-event-count run
    n_events = spark.read.parquet(f"{sf1_dir}/events.parquet").count()
    out["events_per_sec"] = int(n_events / sf1_timings["agg_sum_hourly"])
    out["events_per_sec_n_events"] = n_events
    out["events_per_sec_elapsed"] = sf1_timings["agg_sum_hourly"]
    print(json.dumps(out))


def main() -> None:
    import __spark_entry__ as entry_mod

    if os.environ.get("SPARK_GRAFT_SF1_CHILD") == "1":
        _sf1_child()
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
    for name in BENCH_QUERIES:
        fn = qs[name]
        samples: list[float] = []
        for _ in range(max(runs, 1)):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        dt = round(samples[0], 3)
        timings[name] = dt
        spread[name] = [
            dt,
            round(statistics.median(samples), 3),
            round(samples[-1], 3),
        ]
        total += dt
        print(
            f"# {name}: {dt:.3f}s (min of {runs}; "
            f"med {spread[name][1]:.3f}, max {spread[name][2]:.3f})",
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

    # sf1 stress block in a FRESH child JVM (r13; see module
    # docstring): the parent session stops first so the child gets
    # the machine to itself, then the child re-measures sf0.1 bases
    # and sf1 minima in one clean JVM state and hands back one JSON
    # line. Linear scaling on 32 local cores shows as ratio <= ~10.
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf == "0.1":
        import subprocess

        spark.stop()
        env = dict(os.environ, SPARK_GRAFT_SF1_CHILD="1")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0:
            child = json.loads(proc.stdout.strip().splitlines()[-1])
            payload["events_per_sec"] = child.pop("events_per_sec")
            payload["n_events"] = child.pop("events_per_sec_n_events")
            payload["events_per_sec_elapsed"] = child.pop(
                "events_per_sec_elapsed"
            )
            payload["sf1"] = child
        else:
            payload["sf1"] = {"error": proc.stderr[-2000:]}

    # The driver records only a TAIL of stdout, and r12/r13's full
    # payloads were truncated into "parsed": null (VERDICT r13 ask
    # #6). Keep the one stdout line COMPACT — minima and headline
    # fields only — and move the forensic detail (per-query spreads,
    # sf1 bases and ratios) to a sidecar file next to this script.
    detail = {
        "spread": payload.pop("spread"),
        "sf": payload["sf"],
        "runs_per_query": payload["runs_per_query"],
    }
    sf1 = payload.get("sf1")
    if isinstance(sf1, dict) and "base_sf0.1" in sf1:
        detail["sf1_base_sf0.1"] = sf1.pop("base_sf0.1")
        detail["sf1_ratio_vs_sf0.1"] = sf1.pop("ratio_vs_sf0.1")
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
        "w",
    ) as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(payload, separators=(",", ":")))


if __name__ == "__main__":
    main()
