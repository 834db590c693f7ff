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
# so ordering is coverage policy. Round-9 rotation (VERDICT r8 ask
# #3: every registered query driver-gated within rounds 8–9):
# (a) queries added or changed in round 9; (b) the 25 r6-cohort
# entries last gated in CORRECTNESS_r06 (the tail that did not fit
# r8's 50); (c) fill the remaining slots with the oldest r7-gated
# entries so the freshness window keeps rolling.
GATE_PRIORITY = [
    # (a) added / implementation changed in round 9
    "ann_ivfpq_trained_topk",
    "winnow_dedup_pairs", "bpe_top_pairs", "pca_power_iter",
    "bpe_segment_trained", "pca_project_trained", "tfidf_top_terms",
    "dup_span_fraction_docs",
    # (b) last gated r6 — the whole remaining tail
    "extract_nested", "sflatten_roundtrip",
    "agg_sum_hourly", "agg_sum_delayed_hourly", "agg_mean_hourly",
    "agg_top_event", "agg_bottom_event", "agg_rate_hourly",
    "coll_count_hourly", "coll_max_hourly", "coll_min_hourly",
    "coll_rate_hourly", "coll_quotient_daily", "coll_top3",
    "coll_bottom3", "coll_sort_ids", "dedup_exact_docs",
    "ngram_jaccard_pairs", "ann_ivf_topk", "stratified_sample_docs",
    "boilerplate_removed_docs", "top_suppliers",
    "priority_conditional_counts", "brand_part_revenue",
    "segment_top_orders",
    # (c) oldest r7-gated entries (gated CORRECTNESS_r07, area-diverse)
    "where_not", "where_regex", "under_filter",
    "expired_events", "not_expired_events", "changed_transitions",
    "above_dt_alert", "outside_dt_alert", "smax_running",
    "ddt_rate", "ewma_smoothed", "moving_time_window_count",
    "coalesce_latest", "by_sum_daily", "agg_ratio_error_click",
    "agg_percentiles_hourly", "coll_percentiles_hourly",
    "coll_increase_daily", "minhash_lsh_pairs", "simhash_pairs",
    "paragraph_dedup_docs", "semantic_dedup_survivors",
    "coll_where_inside_window", "coll_sum_hourly",
]

# Round-10 rotation note: after this round's gate every registry
# entry will have been driver-gated in rounds 7–9; lead r10 with
# whatever r10 changes, then the oldest r7/r8-gated remainder —
# starting with the seven (c) entries the r9 additions displaced
# past slot 50 (coll_increase_daily, minhash_lsh_pairs,
# simhash_pairs, paragraph_dedup_docs, semantic_dedup_survivors,
# coll_where_inside_window, coll_sum_hourly), then ann_lsh_topk,
# ann_sq8_topk, ann_ivfpq_topk,
# zscore_window, sessionize_docs, contamination_docs,
# pack_sequences, mixture_sample_docs, the curation composes, and
# the r8 head.


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
