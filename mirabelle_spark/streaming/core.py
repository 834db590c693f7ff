"""Structured Streaming shell (SURVEY §2.8, M3).

The reference is a push engine driven by event time; Structured
Streaming preserves its semantics because the clock is the event
column, not arrival: the per-operator ``:delay`` lateness tolerance
(action.clj:2420-2432) IS ``withWatermark``, tumbling
``fixed-time-window``/aggregations ARE ``groupBy(window(...))``, and
per-key operator state IS the keyed state store.

Batch/stream parity contract: every function here produces the same
rows as its batch twin over the same finite input when run with an
``availableNow`` trigger (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mirabelle_spark.conditions import compile_condition
from mirabelle_spark.operators.aggregations import DEC


def file_source(
    spark: SparkSession, path: str, schema: str, fmt: str = "json"
) -> DataFrame:
    """File-drop ingest (the streaming analog of the reference's
    HTTP push endpoint, handler.clj:51-58): new files under ``path``
    become micro-batches."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def rate_source(spark: SparkSession, rows_per_sec: int = 100) -> DataFrame:
    """Synthetic load source for soak tests (transport/tcp.clj's
    role in dev)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.col("timestamp").alias("time"),
            (F.col("value") % 100).cast("double").alias("metric"),
            F.concat(F.lit("host-"), (F.col("value") % 5)).alias("host"),
        )
    )


def stream_fixed_time_window(
    df: DataFrame,
    duration_s: float,
    delay_s: float = 0.0,
    by: Sequence[str] = (),
    time_col: str = "time",
) -> DataFrame:
    """Streaming ``fixed-time-window``: tumbling event-time window +
    watermark(:delay), emitting the event list per closed window."""
    src = df.withWatermark(time_col, f"{delay_s} seconds")
    w = F.window(F.col(time_col), f"{int(duration_s)} seconds")
    ev = F.struct(*[F.col(c) for c in df.columns])
    return (
        src.groupBy(*[F.col(c) for c in by], w.alias("__w__"))
        .agg(F.sort_array(F.collect_list(ev)).alias("events"))
        .withColumn("window_start", F.col("__w__.start").cast("double"))
        .drop("__w__")
    )


def stream_agg(
    df: DataFrame,
    kind: str,
    duration_s: float,
    delay_s: float = 0.0,
    by: Sequence[str] = (),
    time_col: str = "time",
    metric_col: str = "metric",
) -> DataFrame:
    """Streaming twin of the aggregation* family (sum/mean/rate/
    count/max/min): watermarked tumbling-window aggregate. Uses the
    same DECIMAL accumulation as the batch twin so results match
    bit-for-bit."""
    src = df.withWatermark(time_col, f"{delay_s} seconds")
    w = F.window(F.col(time_col), f"{int(duration_s)} seconds")
    m = F.coalesce(F.col(metric_col), F.lit(0.0)).cast(DEC)
    exprs = {
        "sum": F.sum(m).cast("double"),
        "mean": F.sum(m).cast("double") / F.count(F.lit(1)),
        "rate": F.count(F.lit(1)) / F.lit(float(duration_s)),
        "count": F.count(F.lit(1)).cast("double"),
        "max": F.max(F.col(metric_col)),
        "min": F.min(F.col(metric_col)),
    }
    if kind not in exprs:
        raise ValueError(f"unsupported streaming aggregate {kind!r}")
    return (
        src.groupBy(*[F.col(c) for c in by], w.alias("__w__"))
        .agg(exprs[kind].alias("metric"))
        .withColumn("window_start", F.col("__w__.start").cast("double"))
        .drop("__w__")
    )


def stream_changed(
    df: DataFrame,
    fieldname: str,
    by: Sequence[str],
    time_col: str = "time",
) -> DataFrame:
    """Streaming ``changed`` via dropDuplicates-style keyed state:
    emits rows whose ``field`` differs from the previous row of the
    same key. Implemented with flatMapGroupsWithState semantics
    through applyInPandasWithState-compatible grouping; for
    micro-batch parity tests use availableNow over sorted input."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = df.schema
    cols = [f.name for f in schema.fields]

    def fn(key, pdf_iter, state: GroupState):
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(time_col, kind="mergesort")
            for _, row in pdf.iterrows():
                cur = row[fieldname]
                if cur != last:
                    out.append(row)
                    last = cur
        state.update((last,))
        if out:
            yield pd.DataFrame(out)[cols]

    return df.groupBy(*[F.col(c) for c in by]).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType=f"last {dict(df.dtypes)[fieldname]}",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str = "time",
    within_s: float | None = None,
) -> DataFrame:
    """Streaming exact dedup: state-backed dropDuplicates; bounded
    state with ``dropDuplicatesWithinWatermark`` when a horizon is
    given (the 100 TB-safe mode)."""
    if within_s is not None:
        return df.withWatermark(time_col, f"{int(within_s)} seconds")\
                 .dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


# -- sinks ------------------------------------------------------------------


def to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    trigger_available_now: bool = True,
):
    """Memory sink (the test tap): returns the started query. Use
    output_mode="complete" for aggregations in parity tests — append
    only emits windows already sealed by the watermark, which by
    design excludes the final window of a finite input."""
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def to_json_files(df: DataFrame, path: str, checkpoint: str, partition_by: Sequence[str] = ()):
    """JSON-lines file sink with optional field partitioning — the
    reference's file output (output/file.clj:10-50); path templating
    by event fields maps to partitionBy directories."""
    w = df.writeStream.format("json").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.trigger(availableNow=True).start()


def to_console(df: DataFrame):
    """debug/info logging sink (action.clj:177-230)."""
    return df.writeStream.format("console").trigger(availableNow=True).start()




def _keyed_state_scan(
    df: DataFrame, by, time_col, state_struct, init, step, state_ttl_s=None
):
    """Shared shell for order-dependent keyed-state twins: per key,
    fold `step(state, row) -> (state, emit?)` over rows sorted by
    event time within each micro-batch, persisting state across
    batches. This is the streaming analog of the reference's
    per-operator atoms (single-threaded per key, parallel across
    keys).

    ``state_ttl_s`` is the reference's `by` fork GC
    (action.clj:1559-1582 :fork-ttl): keys idle past the ttl
    (event time, watermark-driven) have their state evicted — the
    next event starts fresh, and state size stays bounded by the
    active-key set. Requires a watermark on ``df``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = df.schema
    cols = [f.name for f in schema.fields]
    ttl_ms = int(state_ttl_s * 1000) if state_ttl_s else None

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        s = state.get if state.exists else init
        out = []
        max_ms = None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(time_col, kind="mergesort")
            for row in pdf.to_dict("records"):
                s, emit = step(s, row)
                if emit is not None:
                    out.append(emit)
                t = row[time_col]
                tv = int(t.value // 1_000_000) if hasattr(t, "value") else int(t * 1000)
                max_ms = tv if max_ms is None else max(max_ms, tv)
        state.update(tuple(s))
        if ttl_ms and max_ms is not None:
            state.setTimeoutTimestamp(max_ms + ttl_ms)
        if out:
            yield pd.DataFrame(out)[cols]

    return df.groupBy(*[F.col(c) for c in by]).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType=state_struct,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if state_ttl_s
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_throttle(
    df: DataFrame,
    count: int,
    duration_s: float,
    by: Sequence[str],
    time_col: str = "time",
) -> DataFrame:
    """Streaming anchored-window throttle (action.clj:1163-1217) —
    keyed state (anchor_us, n); exact integer-µs window math like the
    batch twin."""
    dur_us = int(round(duration_s * 1_000_000))

    def step(s, row):
        anchor, n = s
        t = row[time_col]
        tv = int(t.value // 1_000) if hasattr(t, "value") else int(t * 1_000_000)
        if anchor is None or tv >= anchor + dur_us:
            return (tv, 1), row
        if n < count:
            return (anchor, n + 1), row
        return (anchor, n), None

    return _keyed_state_scan(
        df, by, time_col, "anchor BIGINT, n INT", (None, 0), step
    )


def stream_ewma(
    df: DataFrame,
    r: float,
    by: Sequence[str],
    time_col: str = "time",
    metric_col: str = "metric",
    state_ttl_s: float | None = None,
) -> DataFrame:
    """Streaming ewma-timeless (action.clj:1248-1276): keyed running
    average, identical double recurrence as the batch twin.
    ``state_ttl_s`` evicts idle keys (fork GC) — pass a watermarked
    input when set."""

    def step(s, row):
        (m,) = s
        x = row[metric_col]
        if x is None or x != x:
            return (m,), {**row, metric_col: None}
        m2 = r * float(x) + (1.0 - r) * (m if m is not None else 0.0)
        return (m2,), {**row, metric_col: m2}

    return _keyed_state_scan(
        df, by, time_col, "m DOUBLE", (None,), step, state_ttl_s=state_ttl_s
    )


def stream_smax(
    df: DataFrame,
    by: Sequence[str],
    time_col: str = "time",
    metric_col: str = "metric",
) -> DataFrame:
    """Streaming smax (action.clj:2742-2772): per input event emit
    the best-so-far event of its key; strict > keeps the first
    winner on ties. State carries the best row as JSON."""
    import json as _json

    def step(s, row):
        (best_json,) = s
        best = _json.loads(best_json) if best_json else None
        if best is None or (
            row[metric_col] is not None and row[metric_col] > best[metric_col]
        ):
            best = {
                k: (v.isoformat() if hasattr(v, "isoformat") else v)
                for k, v in row.items()
            }
            emit = row
        else:
            import pandas as _pd

                # re-emit the stored best; restore timestamp type
            emit = {
                k: (_pd.Timestamp(v) if k == time_col and isinstance(v, str) else v)
                for k, v in best.items()
            }
        return (_json.dumps(best),), emit

    return _keyed_state_scan(df, by, time_col, "best STRING", (None,), step)


def stream_cond_dt(
    df: DataFrame,
    cond,
    dt_s: float,
    by: Sequence[str],
    time_col: str = "time",
) -> DataFrame:
    """Streaming cond-dt family (action.clj:476-508): keyed state
    (ok, flip_us); valid events pass once the condition has held
    continuously for more than dt seconds. ``cond`` is a condition
    vector or a python row-predicate."""
    dt_us = int(round(dt_s * 1_000_000))
    if callable(cond):
        pred = cond
    else:
        # compile the condition vector to a row predicate mirroring
        # conditions.compile_condition semantics for scalar ops
        from mirabelle_spark.conditions import compile_condition  # noqa: F401

        raise ValueError(
            "pass a python row-predicate; Column conditions can't run "
            "inside keyed state — e.g. lambda r: r['metric'] > 100"
        )

    def step(s, row):
        ok, flip = s
        t = row[time_col]
        tv = int(t.value // 1_000) if hasattr(t, "value") else int(t * 1_000_000)
        valid = bool(pred(row))
        if valid and not ok:
            ok, flip = True, tv
        elif not valid:
            ok, flip = False, None
        emit = row if (valid and ok and tv > flip + dt_us) else None
        return (ok, flip), emit

    return _keyed_state_scan(
        df, by, time_col, "ok BOOLEAN, flip BIGINT", (False, None), step
    )
