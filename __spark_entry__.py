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
# so ordering is coverage policy. Round-7 rotation: (a) the eleven
# round-6 queries that have never been driver-gated (VERDICT r6 ask
# #1) lead; (b) queries whose implementation changed this round —
# the LSH/SimHash hot-bucket cap — plus the new video_frame_sample
# re-gate on the new code; (c) the five queries last gated in r4;
# (d) the r5 cohort, minus the thirteen simplest multi-gated,
# unchanged entries (where_basic, over/tagged/tag-untag/split,
# event-window ids, ssort, token-count, fingerprint, hash-sample,
# mask-pii), which rotate below the fold for r8.
GATE_PRIORITY = [
    # (a) never driver-gated (added r6)
    "gopher_quality_docs", "vocab_top100", "token_rarity_docs",
    "mixture_sample_docs", "paragraph_dedup_docs", "dedup_survivors_docs",
    "ann_pq_topk", "clean_corpus_docs", "sessionize_user_events",
    "zscore_events", "semantic_dedup_survivors",
    # (b) implementation changed / added in round 7
    "minhash_lsh_pairs", "simhash_pairs", "video_frame_sample",
    "linear_quality_docs", "ivf_centroid_update", "best_docs_per_lang",
    "token_chunks_docs", "ann_sq_topk", "ann_ivfpq_topk",
    # (c) last gated in r4
    "where_not", "where_regex", "under_filter", "not_expired_events",
    "outside_dt_alert",
    # (d) the r5 cohort (last gated r5)
    "expired_events", "changed_transitions", "above_dt_alert",
    "moving_time_window_count", "coalesce_latest",
    "agg_ratio_error_click", "agg_percentiles_hourly",
    "coll_increase_daily", "by_sum_daily", "smax_running", "ddt_rate",
    "ewma_smoothed", "coll_where_inside_window", "coll_sum_hourly",
    "coll_mean_hourly", "coll_percentiles_hourly", "dedup_clusters",
    "ann_bruteforce_topk", "ann_lsh_topk", "embedding_near_dups",
    "contamination_docs", "pack_docs",
    "multimodal_features", "tpch_pricing_summary", "revenue_by_nation",
]

# Round-8 rotation note: below-fold after r7 are (i) the r6 cohort
# plus order_priority_counts, text_rolling_fp and text_bpe_token_count
# (slots yielded to linear_quality_docs / ivf_centroid_update /
# best_docs_per_lang); text_lang_id / text_quality likewise yielded
# to token_chunks_docs / ann_sq_topk; text_repetition to
# ann_ivfpq_topk
# gated green in CORRECTNESS_r06 (throttle ... segment_top_orders)
# and (ii) the thirteen deferred r5-cohort entries named above —
# lead r8's gate with (ii), neardup_degree_histogram,
# soft_dedup_docs, corpus_split_docs, search_quality_docs and
# doc_length_profile and split_token_budget (added
# r7, local
# exact-compare green, never driver-gated), plus whatever r8
# changes.


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
