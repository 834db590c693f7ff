"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (where → by → tumbling
window → sum) at sf0.001. ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the pipeline ops;
registries live in :mod:`mirabelle_spark.queries` and
:mod:`mirabelle_spark.queries_pipeline`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-user hourly sum
    of 'click' values — where → by → fixed-time-window → sum."""
    from mirabelle_spark.operators import aggregations as agg
    from mirabelle_spark.operators import filters as flt
    from mirabelle_spark.queries import events

    df = events(spark, "/root/testdata/sf0.001")
    clicks = flt.where(df, [":=", "event_type", "click"])
    return agg.agg_sum(clicks, 3600.0, by=["user_id"], time_col="ts", metric_col="value")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mirabelle_spark import queries as qmod
    from mirabelle_spark import queries_analytics as amod
    from mirabelle_spark import queries_pipeline as pmod

    out: dict[str, Callable] = {}
    out.update(qmod.QUERIES)
    out.update(pmod.QUERIES)
    out.update(amod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from mirabelle_spark import queries as qmod
    from mirabelle_spark import queries_analytics as amod
    from mirabelle_spark import queries_pipeline as pmod

    out: dict[str, str] = {}
    out.update(qmod.ORACLES)
    out.update(pmod.ORACLES)
    out.update(amod.ORACLES)
    return out
