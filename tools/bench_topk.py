"""Measure the ANN rank tail: two-phase bounded_topk vs the retired
single-window form (r15, VERDICT r14 ask #8's "demonstrate it"
follow-through, same protocol as tools/bench_prefilter.py: fork one
fresh python per CONFIGURATION, one untimed warm-up, min-of-N).

The claim under test: ``row_number() over partitionBy(query_id)``
funnels each query's FULL candidate mass through one task, so with a
small query batch the rank tail serializes no matter how many cores
exist; the two-phase form's map-side partial keeps <= k structs per
(query, input-partition) and parallelizes with the SCAN, not with
the query count. The probe scores a replicated sf1 embeddings corpus
(REP x 20k rows x 64 dims, exact cosine) for NQ queries — candidate
mass per query grows with REP while NQ pins the old form's
parallelism ceiling.

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
    # the retired single-window form, reconstructed verbatim
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
    # rep=50 -> 1M corpus rows per query's candidate set; nq=2 pins
    # the old form at 2 tasks, nq=32 lets it use the machine
    for rep, nq in ((50, 2), (50, 32)):
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
