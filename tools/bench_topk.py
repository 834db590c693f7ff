"""Measure the ANN rank tail: the SHIPPED single-window form vs the
explicit two-phase ``ann.bounded_topk`` control (r15, VERDICT r14
ask #8 — executed, measured, REVERTED on this tool's evidence; PERF
§87. Protocol: tools/bench_prefilter.py's — fork one fresh python
per CONFIGURATION, one untimed warm-up, min-of-N).

The claim under test was that ``row_number() over
partitionBy(query_id) … rank <= k`` funnels each query's FULL
candidate mass through one task. It does NOT on Spark >= 3.5:
WindowGroupLimit pushdown puts a Partial sort-limit BELOW the
exchange (<= k rows per query per input partition move), which is
the same two-phase bound with one fewer exchange and a spillable
sort-limit instead of a per-group collect_list array. Measured on
the adversarial shape (1M-row corpus, nq=2): window 25.2 s,
two-phase 29.4 s — the optimizer's plan wins and the rankers keep
the declarative window. The probe scores a replicated sf1
embeddings corpus (REP x 20k rows x 64 dims, exact cosine) for NQ
queries — candidate mass per query grows with REP while NQ would
pin a genuinely-funneling form's parallelism.

Run:  python tools/bench_topk.py            # the sweep (forks children)
      BENCH_TOPK_CHILD="<form>:<rep>:<nq>" python tools/bench_topk.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 3


def _scored(spark, rep: int, nq: int):
    from pyspark.sql import functions as F

    from mirabelle_spark.pipeline import ann
    from mirabelle_spark.queries_pipeline import embs
    from tools.make_sf1 import ensure_sf1

    sf1 = ensure_sf1(spark, "/root/testdata/sf0.1")
    e = embs(spark, sf1)
    queries = e.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = e.select(F.col("vec_id"), ann.as_double_vec(F.col("embedding")).alias("__cv__"))
    if rep > 1:
        r = spark.range(rep).withColumnRenamed("id", "__r__")
        c = c.crossJoin(F.broadcast(r)).select(
            (F.col("vec_id") + F.col("__r__") * F.lit(10 ** 9)).alias("vec_id"),
            "__cv__",
        )
    q = queries.select(
        F.col("query_id"), ann.as_double_vec(F.col("embedding")).alias("__qv__")
    )
    joined = c.crossJoin(F.broadcast(q))
    return joined.withColumn("cosine", ann.cosine(F.col("__qv__"), F.col("__cv__")))


def _rank(scored, form: str, k: int = 5):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mirabelle_spark.pipeline import ann

    if form == "bounded":
        return ann.bounded_topk(
            scored, k, "cosine", "query_id", "vec_id", descending=True
        )
    # the shipped single-window form (WindowGroupLimit-bounded)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _child(spec: str) -> None:
    from mirabelle_spark.session import get_spark

    form, rep, nq = spec.split(":")
    rep, nq = int(rep), int(nq)
    spark = get_spark(app_name=f"bench_topk_{form}")
    run = lambda: _rank(_scored(spark, rep, nq), form).write.format(  # noqa: E731
        "noop"
    ).mode("overwrite").save()
    run()  # warm-up, untimed
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"form": form, "rep": rep, "nq": nq,
                      "sec": round(best, 3), "runs": RUNS}))


def main() -> None:
    spec = os.environ.get("BENCH_TOPK_CHILD")
    if spec:
        _child(spec)
        return
    # rep=50 -> 1M corpus rows per query's candidate set; nq=2 is
    # the adversarial point (a genuinely-funneling form would have
    # 2 tasks of 1M rows each). nq=32 uses rep=10 so total scored
    # mass (#rows x #queries) stays comparable between the points.
    for rep, nq in ((50, 2), (10, 32)):
        for form in ("window", "bounded"):
            env = dict(os.environ, BENCH_TOPK_CHILD=f"{form}:{rep}:{nq}")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-1500:])
                continue
            print(proc.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
    main()
