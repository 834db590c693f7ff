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
# so ordering is coverage policy. Round-8 rotation (VERDICT r7 ask
# #2: every registered query driver-gated within the last two
# rounds): (a) the six r7-added queries that have never been
# driver-gated; (b) queries added or whose implementation changed in
# round 8; (c) the nineteen r5-cohort entries last gated in
# CORRECTNESS_r05; (d) as many of the r6 cohort (48 entries, all
# last gated in CORRECTNESS_r06) as fit — the remainder plus the
# whole r7-gated cohort sit below the fold for r9.
GATE_PRIORITY = [
    # (a) never driver-gated (added r7; judge-verified locally in r7)
    "neardup_degree_histogram", "soft_dedup_docs", "corpus_split_docs",
    "search_quality_docs", "doc_length_profile", "split_token_budget",
    # (b) added / implementation changed in round 8
    "ann_ivf_trained_topk", "ann_pq_trained_topk",
    # (c) last gated r5
    "where_basic", "over_filter", "tagged_all", "split_routing",
    "tag_untag", "fixed_time_window_ids", "fixed_event_window_ids",
    "moving_event_window_vals", "ssort_sorted", "hash_sample_docs",
    "mask_pii_docs", "text_token_count", "text_bpe_token_count",
    "text_repetition", "text_quality", "text_lang_id",
    "text_fingerprint", "text_rolling_fp", "order_priority_counts",
    # (d) r6 cohort, oldest-area-first slice (stateful/threshold ops,
    # the DSL pipeline, and the transforms family)
    "throttle", "stable_states", "dsl_pipeline", "coalesce_fill",
    "below_dt_alert", "between_dt_alert", "critical_dt_alert",
    "ddt_pos_rate", "smin_running", "project_correlate",
    "with_const", "default_missing", "scale_metric",
    "increment_metric", "decrement_metric", "sformat_label",
    "to_string_field", "base64_roundtrip", "from_json_props",
    "rename_keys_proj", "keep_keys_proj", "sdissoc_proj",
    "iterate_on_explode",
]

# Round-9 rotation note: still last-gated-r6 after this round's gate
# (the r6-cohort tail that did not fit the 50): extract_nested,
# sflatten_roundtrip,
# agg_sum_hourly, agg_sum_delayed_hourly, agg_mean_hourly,
# agg_top_event, agg_bottom_event, agg_rate_hourly,
# coll_count_hourly, coll_max_hourly, coll_min_hourly,
# coll_rate_hourly, coll_quotient_daily, coll_top3, coll_bottom3,
# coll_sort_ids, dedup_exact_docs, ngram_jaccard_pairs,
# ann_ivf_topk, stratified_sample_docs, boilerplate_removed_docs,
# top_suppliers, priority_conditional_counts, brand_part_revenue,
# segment_top_orders — lead r9's gate with these 24, plus whatever
# r9 changes; everything else is r7/r8-gated.


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
