"""Synthesize an sf1 stress dataset (10× sf0.1) for bench smoke.

The driver ships sf0.001/0.01/0.1 only; the sf1 stress pass exists to
catch nonlinear blowups that sf0.1 hides (hot LSH buckets, cluster-
resolution round growth, skewed join fan-out). Tables are derived
from sf0.1 by 10-way replication with key offsets, built so workload
CHARACTERISTICS scale ~linearly instead of degenerately:

- ``documents``: every word of replica r>0 gets an ``r`` suffix, so
  cross-replica shingle sets are fully disjoint — replicas are NOT
  near-duplicates of each other (10 exact copies per doc would grow
  LSH candidate pairs quadratically by construction and measure the
  synthetic cliques, not the plan). Within a replica the original
  similarity structure is preserved verbatim.
- ``embeddings``: replica vectors get a small deterministic per-lane
  perturbation (sin(lane·r)·0.02) — same cluster geometry, no exact
  duplicate vectors; original vec_ids stay below the offset so
  ``vec_id < 10``-style query sets keep their size.
- ``lineitem``/``orders``: order keys offset per replica (FK between
  the two preserved); customer keys untouched so the star join fans
  out 10× over the same dimension tables.
- ``events``: replicated 10× with event_id AND user_id offset per
  replica — same 30-day time range, 10× rows and 10× distinct keys,
  so windowed by-key aggregations fan out linearly (r13; previously
  copied as-is, which left the sf1 throughput number measuring the
  sf0.1 table).
- dimensions (``customer``/``nation``/``region``/``supplier``/
  ``part``): copied as-is — at any scale these stay broadcast-side.

Everything is deterministic (no RNG, no clock): re-running produces
byte-identical inputs. Output lands in ``.cache/sf1`` (gitignored);
a ``_DONE`` marker skips rebuilds.

Write layout (r16, guide §6): every synthesized table is written as
``SPLITS`` hash-bucketed files (deterministic key hash, rows sorted
by key within each file — still byte-identical across rebuilds).
The v2 cache wrote ONE row group per table, and parquet cannot
split below row-group granularity — so every sf1 bench child
decoded its whole fact/doc/event table on a single core before any
parallelism existed (measured: the 6M-row lineitem scan alone cost
~7 s of the 8.8 s revenue_by_nation record; the Q1-shaped rollup
read 13.7 s raw vs 4.2 s hash-rebalanced, and a well-split file
needs no rebalance at all). A real 100 TB table has thousands of
row groups and never hits this; the layout here just stops the
local cache from hiding scan parallelism the plans already have.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE = 10**9  # replica key offset: far above any sf0.1 key
REPLICAS = 10


SPLITS = 32  # files per synthesized table (hash-bucketed, sorted)


def _write_split(df: DataFrame, path: str, key: str, *sort_cols: str) -> None:
    """Deterministic multi-file write: hash-partition on ``key``
    (no round-robin — its sort-before-repartition pays a single-
    threaded sort of the whole table, and its row placement depends
    on input order), sort rows within each file by the primary key
    so rebuilds stay byte-identical."""
    (
        df.repartition(SPLITS, F.col(key))
        .sortWithinPartitions(*(sort_cols or (key,)))
        .write.mode("overwrite")
        .parquet(path)
    )


def _with_replicas(df: DataFrame) -> DataFrame:
    """Cross the table with replica ids 0..9 — ONE scan of the
    source, 10× rows out (vs a 10-way union of scans)."""
    spark = df.sparkSession
    r = spark.range(REPLICAS).withColumnRenamed("id", "__r__")
    return df.crossJoin(F.broadcast(r))


def _documents(spark: SparkSession, src: str, dst: str) -> None:
    d = _with_replicas(spark.read.parquet(f"{src}/documents.parquet"))
    text = F.when(F.col("__r__") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1"), F.col("__r__").cast("string")),
        )
    )
    out = d.select(
        (F.col("doc_id") + F.col("__r__") * BASE).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))
    _write_split(out, f"{dst}/documents.parquet", "doc_id")


def _embeddings(spark: SparkSession, src: str, dst: str) -> None:
    e = _with_replicas(spark.read.parquet(f"{src}/embeddings.parquet"))
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            + F.sin((i + 1).cast("double") * F.col("__r__").cast("double"))
            * F.lit(0.02)
        ).cast("float"),
    )
    out = e.select(
        (F.col("vec_id") + F.col("__r__") * BASE).alias("vec_id"),
        F.when(F.col("__r__") == 0, F.col("embedding"))
        .otherwise(perturbed)
        .alias("embedding"),
        "label",
    )
    _write_split(out, f"{dst}/embeddings.parquet", "vec_id")


def _fact(spark: SparkSession, src: str, dst: str, name: str,
          key: str) -> None:
    df = _with_replicas(spark.read.parquet(f"{src}/{name}.parquet"))
    out = df.withColumn(key, F.col(key) + F.col("__r__") * BASE).drop("__r__")
    sort_cols = (
        ("l_orderkey", "l_linenumber") if name == "lineitem" else (key,)
    )
    _write_split(out, f"{dst}/{name}.parquet", key, *sort_cols)


def _events(spark: SparkSession, src: str, dst: str) -> None:
    """events scale 10× with BOTH event_id and user_id offset per
    replica: same 30-day time range, 10× rows AND 10× distinct keys,
    so windowed `by`-key aggregations fan out linearly (10× groups ×
    the original windows) instead of deepening the same 1,500 key
    groups 10×. (r13: events was previously COPIED like a dimension,
    which left the sf1 flagship-throughput run measuring the sf0.1
    table — a 0.3 s 'sustained' number.)"""
    df = _with_replicas(spark.read.parquet(f"{src}/events.parquet"))
    out = (
        df.withColumn("event_id", F.col("event_id") + F.col("__r__") * BASE)
        .withColumn("user_id", F.col("user_id") + F.col("__r__") * BASE)
        .drop("__r__")
    )
    _write_split(out, f"{dst}/events.parquet", "event_id")


def ensure_sf1(spark: SparkSession, src: str = "/root/testdata/sf0.1",
               dst: str | None = None) -> str:
    """Build (once) and return the sf1 directory."""
    if dst is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(repo, ".cache", "sf1")
    # v3: split write layout (r16) — see the module docstring; the
    # marker version forces one-row-group v2 caches to rebuild
    marker = os.path.join(dst, "_DONE_v3")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    # nanos timestamps arrive as long and are written back as long;
    # the type-driven loader normalization handles both identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    _documents(spark, src, dst)
    _embeddings(spark, src, dst)
    _fact(spark, src, dst, "lineitem", "l_orderkey")
    _fact(spark, src, dst, "orders", "o_orderkey")
    _events(spark, src, dst)
    for dim in ("customer", "supplier", "part", "nation", "region"):
        s = f"{src}/{dim}.parquet"
        if os.path.isfile(s):
            shutil.copyfile(s, f"{dst}/{dim}.parquet")
    with open(marker, "w") as f:
        f.write("ok\n")
    return dst


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mirabelle_spark.session import get_spark

    print(ensure_sf1(get_spark(app_name="make_sf1")))
