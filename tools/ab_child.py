"""Interleaved fresh-JVM A/B for one bench query (r17 methodology).

Runs `SPARK_GRAFT_SF1_CHILD=<query> python bench.py` alternately from
two working trees (or twice from one tree with different env), N
rounds each side, and prints per-round minima + the overall min with
per-run steal%. This is the bench's own child methodology — warm-up,
sf0.1 base, min-of-BENCH_SF1_RUNS at sf1 — so numbers are directly
comparable to the driver record.

Usage:
  python tools/ab_child.py QUERY [--rounds 3] [--tree-a /root/repo]
      [--tree-b /path/worktree] [--env-a K=V ...] [--env-b K=V ...]
      [--sf0]   # time the sf0.1 suite child instead (no sf1)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_child(tree: str, query: str, extra_env: dict) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF1_CHILD=query, **extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, capture_output=True, text=True, cwd=tree,
    )
    if proc.returncode != 0:
        return {"error": proc.stderr[-500:]}
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tree-a", default="/root/repo")
    ap.add_argument("--tree-b", default=None)
    ap.add_argument("--env-a", nargs="*", default=[])
    ap.add_argument("--env-b", nargs="*", default=[])
    args = ap.parse_args()
    tree_b = args.tree_b or args.tree_a
    env_a = dict(kv.split("=", 1) for kv in args.env_a)
    env_b = dict(kv.split("=", 1) for kv in args.env_b)

    res: dict[str, list] = {"A": [], "B": []}
    for rnd in range(args.rounds):
        for side, tree, env in (("A", args.tree_a, env_a),
                                ("B", tree_b, env_b)):
            out = run_child(tree, args.query, env)
            res[side].append(out)
            if "error" in out:
                print(f"round {rnd} {side}: ERROR {out['error'][-200:]}",
                      file=sys.stderr)
            else:
                print(
                    f"round {rnd} {side}: sf1 {out['sf1']:.3f}s "
                    f"base {out['base']:.3f}s "
                    f"runs {out['sf1_runs_sec']} "
                    f"steal {out.get('sf1_steal_pct')}",
                    file=sys.stderr,
                )
    summary = {}
    for side in ("A", "B"):
        ok = [r for r in res[side] if "error" not in r]
        if ok:
            summary[side] = {
                "sf1_min": min(r["sf1"] for r in ok),
                "base_min": min(r["base"] for r in ok),
                "sf1_all": [r["sf1"] for r in ok],
                "steal_at_min": min(
                    (r["sf1"], max(r.get("sf1_steal_pct") or [0.0]))
                    for r in ok
                )[1],
            }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
