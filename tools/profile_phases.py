"""Per-query phase profiler for the r16 optimization round.

For each named query (default: the bench set) this splits one run
into the phases the guide's §1 asks for, in ONE warmed JVM:

  build    — Python-side DataFrame construction (py4j expression
             construction; single-threaded driver work)
  plan     — ``explain("formatted")`` (parse/analyze/optimize +
             physical planning; also single-threaded driver work);
             the text is saved to ``plans/r16/<name>_<tag>.txt``
  exec1    — first noop-sink run (includes per-stage codegen,
             task-binary broadcast, JIT)
  exec2/3  — repeat noop runs (steady-state execution)

Usage:
  python tools/profile_phases.py [--tag before] [--sf DIR] [name ...]

Writes one JSON line per query to stdout and a summary to stderr.
Plans land in plans/r16/ so the committed *_before.txt/_after.txt
evidence and the measurement come from the same run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan-file", action="store_true")
    ap.add_argument("--round", default="r17")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    import bench
    from mirabelle_spark.session import get_spark

    qs = entry_mod.queries()
    names = args.names or bench.BENCH_QUERIES
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.round,
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="profile_phases", extra_conf={
        "spark.sql.files.maxPartitionBytes": "1m",
        "spark.sql.files.openCostInBytes": "131072",
    })
    # warmup: JIT + parquet footers + Arrow init, as in bench.py
    qs["where_basic"](spark, args.sf).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t_plan = time.perf_counter() - t0
        if not args.no_plan_file:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan_txt)

        execs: list[float] = []
        for _ in range(max(args.runs, 1)):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            execs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)

        n_exchange = plan_txt.count("Exchange")
        n_py = (
            plan_txt.count("BatchEvalPython")
            + plan_txt.count("ArrowEvalPython")
            + plan_txt.count("MapInArrow")
            + plan_txt.count("MapInPandas")
            + plan_txt.count("FlatMapGroupsInPandas")
        )
        row = {
            "name": name,
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "execs": execs,
            "exec_min": min(execs),
            "exchanges": n_exchange,
            "python_nodes": n_py,
            "plan_bytes": len(plan_txt),
        }
        print(json.dumps(row))
        print(
            f"# {name}: build {t_build:.2f}s plan {t_plan:.2f}s "
            f"execs {execs} (Exchange×{n_exchange}, py×{n_py}, "
            f"plan {len(plan_txt)//1024}KB)",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
