"""Scale utilities: skew handling, co-location, partition sizing.

Nothing here changes semantics — these are the knobs you reach for
when a correct plan meets a 100 TB key distribution. Kept as a
separate module so operators stay declarative and the scale policy
is explicit at the call site.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    salt_buckets: int = 32,
    out: str = "metric",
) -> DataFrame:
    """Two-stage aggregation for skewed keys: partial sum on
    (keys, salt) — spreading one hot key over ``salt_buckets``
    reducers — then final sum on keys. Decimal-exact, so the result
    is identical to the unsalted aggregate.

    Use when one key holds a large share of rows (AQE's skew-join
    handling covers joins, not aggregations). For uniform keys the
    extra stage only costs a second small shuffle.
    """
    salt = (F.xxhash64(F.monotonically_increasing_id()) % salt_buckets).alias("__salt__")
    partial = (
        df.select(*[F.col(k) for k in keys], value.alias("__v__"), salt)
        .groupBy(*keys, "__salt__")
        .agg(F.sum(F.col("__v__").cast("decimal(38,9)")).alias("__p__"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__p__").cast("double").alias(out))
    )


def colocate(
    left: DataFrame, right: DataFrame, keys: Sequence[str], partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Pre-partition both join sides on the same keys so the join
    (and any subsequent groupBy on those keys) reuses one exchange.
    On a real cluster prefer writing bucketed tables
    (``bucketBy(n, *keys).sortBy(*keys)``) so the shuffle is paid
    once at write time, not per query."""
    if partitions:
        return (
            left.repartition(partitions, *keys),
            right.repartition(partitions, *keys),
        )
    return left.repartition(*keys), right.repartition(*keys)


def write_bucketed(
    df: DataFrame, table: str, keys: Sequence[str], buckets: int = 256
) -> None:
    """Persist as a bucketed+sorted table: co-located, shuffle-free
    joins/aggregations on ``keys`` for every later query."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def partition_count_for(total_bytes: int, target_mb: int = 256) -> int:
    """Partitions sized so each holds ~target_mb (the shuffle-spill
    sweet spot); clamp to at least 2x default parallelism."""
    import math

    return max(64, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


# needs_rebalance arm 1 (see docstring): below this catalyst-stats
# size an explicit repartition is unconditionally cheap insurance;
# above it real inputs have many row groups and the split count is
# trustworthy.
REBALANCE_MAX_BYTES = 4 << 30  # 4 GiB

# logical nodes that force an exchange (or an explicit shuffling
# repartition) between the file scan and `df` — behind any of
# these the physical partition count is shuffle-determined, so the
# empty-parquet-split lie (arm 1's reason to distrust counts)
# cannot apply and the count probe is authoritative. Join is
# deliberately ABSENT: a broadcast join preserves the stream side's
# scan partitioning, descriptors and all, so behind one the lie can
# still apply. Plain ``Repartition`` is handled separately below —
# coalesce() prints the same node name with shuffle=false and
# merges partitions WITHOUT redistributing rows, which would leave
# the one-row-group skew intact.
_EXCHANGE_NODES = (
    "RepartitionByExpression",
    "RebalancePartitions",
    "Aggregate",
    "Window",
    "Sort",
    "Deduplicate",
)


def _plan_has_exchange(plan_str: str) -> bool:
    """Does the optimized LOGICAL plan contain a node that plans an
    exchange on the path to EVERY output row? Node names are matched
    at line heads (after the ``+- :- *`` tree art), never inside
    expression text, so a column literally named ``join_key`` can't
    false-positive. Two deliberate conservatisms (r14 review):

    - any ``Join`` in the plan → False: an exchange node might sit
      only on a broadcast join's BUILD side (e.g. a distinct'd
      benchmark table) while the stream side is still a raw scan
      whose descriptors lie — falling through to arms 1/2 merely
      costs one cheap narrow shuffle when wrong, while trusting the
      count re-opens the measured one-core trap (PERF §80).
    - any ``Union`` in the plan → False, same reasoning (ADVICE
      r14): a linear scan of the plan string can't tell WHICH
      branch an exchange node sits in — an Aggregate in one unioned
      corpus would vouch for the other branch's raw one-row-group
      scan. Union output partitioning is the concatenation of its
      children's, so one lying child means the count lies.
    - plain ``Repartition`` counts only with ``true`` (shuffle) on
      the line: ``coalesce()`` prints ``Repartition n, false`` and
      does NOT redistribute rows."""
    found = False
    for line in plan_str.splitlines():
        head = line.lstrip(" +-:*'(0123456789)")
        if head.startswith(("Join", "Union")):
            return False
        if head.startswith(_EXCHANGE_NODES):
            found = True
        elif head.startswith("Repartition ") and "true" in line:
            found = True
    return found


def needs_rebalance(df: DataFrame, target: int) -> bool:
    """Should an expensive projection over ``df`` be preceded by an
    explicit repartition? TWO arms, because split COUNT lies:
    parquet cannot split below row-group granularity, so a
    small-split scan profile over a one-row-group file yields
    ``target`` split DESCRIPTORS of which all but one are EMPTY — a
    count-only probe reads "well-partitioned" while one core does
    all the work (measured 112 s vs 11 s on the sf1 char-grain
    ExactSubstr; the real cause of the r12 "116 s regression" three
    rounds of bench forensics chased as JVM state).

    0. (r14, ADVICE r13) the optimized plan already contains an
       exchange-planning node (aggregate/join/window/repartition/…)
       between the scan and here → the physical partitioning is
       shuffle-determined, descriptors cannot be empty-split lies,
       and the count probe is authoritative — a mid-pipeline
       DataFrame fresh out of a shuffle no longer pays an
       unconditional extra exchange.
    1. catalyst plan-stats bytes < :data:`REBALANCE_MAX_BYTES` →
       rebalance unconditionally: the shuffle is bounded-cheap, and
       no count is trustworthy at sizes where files have ~1 row
       group. Driver-side, no job, no RDD planning.
    2. else (big input): rebalance only when the scan REALLY
       under-partitions (split count < ``target`` — the handful-of-
       unsplittable-.gz case). At 100 TB no arm moves bodies
       unless the scan was already degenerate."""
    size_bytes = None
    plan_str = ""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        plan_str = plan.toString()
        # py4j auto-converts the scala BigInt to a Python int
        size_bytes = int(plan.stats().sizeInBytes())
    except Exception:  # py4j/analysis failure — log, fall through
        import logging

        logging.getLogger(__name__).warning(
            "needs_rebalance: plan-stats probe failed; falling back "
            "to the partition-count arm",
            exc_info=True,
        )
    if _plan_has_exchange(plan_str):
        return df.rdd.getNumPartitions() < target
    if size_bytes is not None and size_bytes < REBALANCE_MAX_BYTES:
        return True
    return df.rdd.getNumPartitions() < target


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the input would serialize an expensive
    projection behind too few REAL partitions — a small parquet
    file arrives as ONE split (measured: the minhash shingle
    explode ran 1-way on 32 cores), and a small-split profile over
    a one-row-group file arrives as N splits with N-1 of them empty
    (see :func:`needs_rebalance`). The shuffle this adds is tiny
    compared to unlocking the cluster; no-op when the source is
    already genuinely well-split (the 100 TB case)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if needs_rebalance(df, target):
        return df.repartition(target)
    return df
