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


