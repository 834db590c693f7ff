"""Reproducible `prefilter_w` economics experiment (r14; VERDICT
r13 "What's missing #2" asked for a DEMONSTRATED corpus profile
where the char-grain ExactSubstr prefilter wins — the r13 numbers
in PERF §74 came from an ad-hoc session no one else could re-run).

Builds a deterministic LOW-DUPLICATION corpus (the realistic crawl
profile the knob was designed for: a seeded hash-word stream with a
shared span injected into 1/dup_every of the docs, so
`dedup.prefilter_selectivity` lands near 1/dup_every), measures
that selectivity, then times `dup_span_removed` (char grain, n=20,
fast hash) WITH and WITHOUT `prefilter_w=8` — each configuration in
its own FRESH subprocess JVM (the bench methodology: a suite-soaked
JVM is noise, see bench.py), min over BENCH_PREFILTER_RUNS (default
2) timed runs after one untimed warm-up run.

Run:

    python tools/bench_prefilter.py              # 50k and 200k docs
    python tools/bench_prefilter.py 50000        # one size

Prints one JSON line per size:
  {"n_docs": N, "selectivity": s, "none_s": a, "prefilter_s": b,
   "ratio": b/a, ...}
ratio < 1 means the prefilter WINS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_GRAM = 20          # char n, the discriminative-length choice
PREF_W = 8           # winnow window of the prefilter pass
TOKENS_PER_DOC = 80  # ~560 chars/doc normalized (6-letter words)
DUP_EVERY = 20       # 1 in 20 docs carries the injected duplicate span


def corpus_path(n_docs: int) -> str:
    return f"/tmp/prefilter_corpus_v2_{n_docs}"


# 64 two-letter syllables; three per word → 262,144 distinct
# 6-LETTER words. Letters only: a digit-bearing vocab ("w12345")
# collapses the char-13-gram space onto a tiny {w,space,0-9}
# alphabet and manufactures ~25% fake candidate docs (measured) —
# realistic prose has letter-diverse grams, so the vocab must too.
_SYL = [
    a + b
    for a in "bcdfghjklmnpqrst"
    for b in "aeiou"[:4]
]  # 16 consonants × 4 vowels = 64


def build_corpus(spark, n_docs: int) -> str:
    """Deterministic low-dup corpus: doc i = 80 hash-words (three
    syllables each, seeded by (i, pos) — reproducible anywhere),
    plus a fixed 30-word span appended to every DUP_EVERY-th doc.
    Written once, reused across child runs (32 files so the scan
    splits)."""
    from pyspark.sql import functions as F

    path = corpus_path(n_docs)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    syl = F.array(*[F.lit(s) for s in _SYL])

    def word(i):
        h = F.xxhash64(F.col("id") * 1000 + i)

        def lane(shift):
            piece = F.call_function("shiftrightunsigned", h, F.lit(shift))
            return F.element_at(syl, F.pmod(piece, 64).cast("int") + 1)

        return F.concat(lane(0), lane(6), lane(12))

    words = F.transform(
        F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)), word
    )
    dup_span = " ".join(f"shared{j}" for j in range(30))
    text = F.concat(
        F.array_join(words, " "),
        F.when(
            F.col("id") % DUP_EVERY == 0, F.lit(" " + dup_span)
        ).otherwise(F.lit("")),
    )
    (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _child(n_docs: int, prefilter: int | None) -> None:
    from pyspark.sql import SparkSession

    from mirabelle_spark.pipeline import dedup

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(corpus_path(n_docs))

    def run() -> float:
        t0 = time.perf_counter()
        dedup.dup_span_removed(
            df, n=N_GRAM, grain="char", gram_hash="fast",
            prefilter_w=prefilter,
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run()  # untimed warm-up (JIT + scan footer)
    runs = int(os.environ.get("BENCH_PREFILTER_RUNS", "2"))
    print(json.dumps({"t": min(run() for _ in range(max(runs, 1)))}))


def main() -> None:
    if os.environ.get("PREFILTER_CHILD"):
        n_docs, pf = os.environ["PREFILTER_CHILD"].split(":")
        _child(int(n_docs), None if pf == "none" else int(pf))
        return

    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]
    from pyspark.sql import SparkSession

    from mirabelle_spark.pipeline import dedup

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # corpus builds + selectivity up front, then STOP the parent
    # JVM before any timed child runs (r14 review: a live 32-thread
    # parent is exactly the cross-JVM noise this tool's fresh-child
    # protocol claims to eliminate)
    selectivity = {}
    for n_docs in sizes:
        build_corpus(spark, n_docs)
        selectivity[n_docs] = dedup.prefilter_selectivity(
            spark.read.parquet(corpus_path(n_docs)),
            n=N_GRAM, prefilter_w=PREF_W, grain="char",
        )
    spark.stop()
    results = []
    for n_docs in sizes:
        sel = selectivity[n_docs]
        timing = {}
        for tag in ("none", str(PREF_W)):
            env = dict(os.environ, PREFILTER_CHILD=f"{n_docs}:{tag}")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-2000:])
                raise SystemExit(f"child failed for {n_docs}:{tag}")
            timing[tag] = json.loads(
                proc.stdout.strip().splitlines()[-1]
            )["t"]
        out = {
            "n_docs": n_docs,
            "selectivity": round(sel, 4),
            "none_s": round(timing["none"], 2),
            "prefilter_s": round(timing[str(PREF_W)], 2),
            "ratio": round(timing[str(PREF_W)] / timing["none"], 2),
            "n": N_GRAM, "w": PREF_W, "grain": "char",
            "dup_every": DUP_EVERY, "fresh_jvm_per_config": True,
        }
        results.append(out)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
