"""Scalar projections / transformations (SURVEY.md §2.4).

Every operator here is a pure ``withColumn``/``select`` expression —
JVM-side, whole-stage-codegen friendly, zero Python in the hot path.
The reference implements each as a per-event closure over an open
map (``action.clj:823-883`` and friends); we compile the same
semantics to Catalyst expressions so Tungsten vectorizes them.

Field addressing: top-level column names. Nested paths (the
reference's ``[:nested :key]`` vectors) are handled with
``F.col("a.b")`` / ``withField`` by callers; the helpers here take
Column-or-name for flexibility.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def with_fields(df: DataFrame, fields: Mapping[str, Any]) -> DataFrame:
    """Set field(s) to constant values (``with``, action.clj:823-883)."""
    return df.withColumns({k: F.lit(v) for k, v in fields.items()})


def default_fields(df: DataFrame, fields: Mapping[str, Any]) -> DataFrame:
    """Set field(s) only when currently null (action.clj:649-688)."""
    out = {}
    for k, v in fields.items():
        if k in df.columns:
            out[k] = F.coalesce(F.col(k), F.lit(v))
        else:
            out[k] = F.lit(v)
    return df.withColumns(out)


def sdissoc(df: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """Drop key(s) from the event (action.clj:1489-1526)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.drop(*keys)


def keep_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keep only the listed keys (action.clj:2196-2228)."""
    return df.select(*[k for k in keys if k in df.columns])


def rename_keys(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Rename keys (action.clj:2140-2194, clojure.set/rename-keys
    semantics): a row whose SOURCE key is absent (null) keeps the
    existing target value — per-row that is ``coalesce(src, dst)``
    when the target column already exists; the source key is removed
    either way."""
    out = df
    for old, new in mapping.items():
        if new in out.columns and old in out.columns:
            out = out.withColumn(new, F.coalesce(F.col(old), F.col(new))).drop(old)
        else:
            out = out.withColumnRenamed(old, new)
    return out


def tag(df: DataFrame, tags: str | Sequence[str], tags_col: str = "tags") -> DataFrame:
    """Add tag(s) not already present, preserving order
    (action.clj:938-969; clojure distinct-concat ≡ array_union)."""
    tags = [tags] if isinstance(tags, str) else list(tags)
    new = F.array(*[F.lit(t) for t in tags])
    existing = F.coalesce(F.col(tags_col), F.array().cast("array<string>"))
    return df.withColumn(tags_col, F.array_union(existing, new))


def untag(df: DataFrame, tags: str | Sequence[str], tags_col: str = "tags") -> DataFrame:
    """Remove tag(s) (action.clj:971-1003)."""
    tags = [tags] if isinstance(tags, str) else list(tags)
    drop = F.array(*[F.lit(t) for t in tags])
    return df.withColumn(tags_col, F.array_except(F.col(tags_col), drop))


def increment(df: DataFrame, metric_col: str = "metric") -> DataFrame:
    """metric + 1 (action.clj:139-157)."""
    return df.withColumn(metric_col, _c(metric_col) + 1)


def decrement(df: DataFrame, metric_col: str = "metric") -> DataFrame:
    """metric - 1 (action.clj:159-175)."""
    return df.withColumn(metric_col, _c(metric_col) - 1)


def scale(df: DataFrame, factor: float, metric_col: str = "metric") -> DataFrame:
    """metric × factor (action.clj:1085-1107)."""
    return df.withColumn(metric_col, _c(metric_col) * F.lit(factor))


def to_string(df: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """Stringify values at keys (action.clj:2931-2965); clojure
    ``(str nil)`` is ``""``, so null → empty string."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.withColumns(
        {k: F.coalesce(F.col(k).cast("string"), F.lit("")) for k in keys}
    )


def sformat(
    df: DataFrame, template: str, target: str, fields: Sequence[str]
) -> DataFrame:
    """printf-template a new field from other fields
    (action.clj:1929-1981; clojure ``format`` ≡ ``format_string``)."""
    return df.withColumn(target, F.format_string(template, *[F.col(f) for f in fields]))


def to_base64(df: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """Base64-encode string field(s) (action.clj:1868-1897, b64.clj:1-5)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.withColumns({k: F.base64(F.col(k).cast("binary")) for k in keys})


def from_base64(df: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """Base64-decode string field(s) (action.clj:1899-1927, b64.clj:7-10)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.withColumns({k: F.unbase64(F.col(k)).cast("string") for k in keys})


def from_json(
    df: DataFrame, key: str, schema: str, target: str | None = None
) -> DataFrame:
    """Parse a JSON-string field into structured data
    (action.clj:1753-1787).

    Divergence (documented): the reference parses schemalessly into
    an open map; Spark needs a declared ``schema`` (DDL string). Use
    ``MAP<STRING,STRING>`` for the closest schemaless behavior.
    """
    return df.withColumn(target or key, F.from_json(F.col(key), schema))


def extract(df: DataFrame, key: str) -> DataFrame:
    """Replace the event by the value under ``key``
    (action.clj:2797-2831); struct column → its fields."""
    return df.select(F.col(key + ".*"))


def iterate_on(df: DataFrame, key: str) -> DataFrame:
    """Explode a list-valued field: one event per element, other
    fields duplicated (action.clj:3011-3035)."""
    other = [c for c in df.columns if c != key]
    return df.select(*other, F.explode(F.col(key)).alias(key))


def sflatten(df: DataFrame, list_col: str) -> DataFrame:
    """Flatten a window's collected event list back to individual
    events (action.clj:915-936): explode structs → top-level cols."""
    exploded = df.select(F.explode(F.col(list_col)).alias("__e__"))
    return exploded.select("__e__.*")


def sdo(df: DataFrame, *transforms) -> list[DataFrame]:
    """Fan out to several children (action.clj:404-425): reuse one
    DataFrame lineage in N downstream plans."""
    return [t(df) for t in transforms]


def io(df: DataFrame, test_mode: bool = False) -> DataFrame:
    """Pass-through marker; children discarded in test mode
    (action.clj:1710-1722). In batch the sink layer honors the flag;
    the transform itself is identity."""
    return df


# ---------------------------------------------------------------------------
# custom-operator registry (the reference's `custom` action,
# action.clj:1852-1866 + resolution stream.clj:29-34)

_CUSTOM_ACTIONS: dict[str, Any] = {}


def register_custom(name: str, fn) -> None:
    """Register a named DataFrame→DataFrame transform, the analog of
    the reference's keyword→symbol custom-action resolution."""
    _CUSTOM_ACTIONS[name] = fn


def custom(df: DataFrame, name: str, *args, **kwargs) -> DataFrame:
    """Invoke a registered custom action by name."""
    if name not in _CUSTOM_ACTIONS:
        raise KeyError(f"unknown custom action {name!r}")
    return _CUSTOM_ACTIONS[name](df, *args, **kwargs)


def exception_stream(df: DataFrame, row_fn, error_cols: Sequence[str] = ()):
    """``exception-stream`` (action.clj:1789-1827): run a risky
    per-row transform; rows that raise become error events on a
    second stream instead of failing the job.

    The reference wraps a child action in per-event try/catch. The
    Spark analog: an Arrow-batched mapInPandas that routes each row
    to an ok or error channel; returns (ok_df, error_df) where the
    error stream carries the original row plus an ``error`` message
    column (the reference's exception→event conversion).

    ``row_fn(dict) -> dict`` must return values matching the input
    schema. This is the slow path by design — use it only around
    genuinely fallible user logic (the reference says the same).

    .. warning:: per-row Python. The try/except routing is the
       operator's *semantics* (each row must fail independently), so
       rows run through a Python loop inside the Arrow batch —
       10-100× slower than JVM expressions. Wrap the narrowest
       possible transform; never put a whole pipeline inside.
    """
    import pandas as pd

    schema = df.schema
    cols = [f.name for f in schema.fields]

    def _run(batches):
        for pdf in batches:
            oks, errs = [], []
            for rec in pdf.to_dict("records"):
                try:
                    out = row_fn(dict(rec))
                    oks.append({**rec, **out, "__error__": None})
                except Exception as e:  # noqa: BLE001
                    errs.append({**rec, "__error__": f"{type(e).__name__}: {e}"})
            yield pd.DataFrame(oks + errs, columns=[*cols, "__error__"])

    tagged_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    tagged = df.mapInPandas(_run, schema=f"{tagged_schema}, __error__ string")
    ok_df = tagged.filter(F.col("__error__").isNull()).drop("__error__")
    err_df = tagged.filter(F.col("__error__").isNotNull()).withColumnRenamed(
        "__error__", "error"
    )
    return ok_df, err_df
