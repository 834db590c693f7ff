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
# so ordering is coverage policy. Round-14 rotation (VERDICT r13 ask
# #1, executed as written at its lines 41-48): (a) queries ADDED or
# CHANGED in round 14 lead; (b) the 19-query r9 tail — last
# driver-gated in round 9, the oldest cohort; (c) the head of the
# 45-entry r10 cohort, registry order, filling to exactly 50.
# After this gate no query's last-green is older than r10; the r10
# tail of 18 (gopher_quality_docs, vocab_top100, token_rarity_docs,
# mixture_sample_docs,
# clean_corpus_docs, paragraph_dedup_docs, multimodal_features,
# video_frame_sample, linear_quality_docs, ivf_centroid_update,
# best_docs_per_lang, token_chunks_docs, ann_sq_topk, ann_ivfpq_topk,
# ann_ivfpq_rerank_topk, ann_ivfpq_cosine_topk, tpch_pricing_summary,
# revenue_by_nation) leads r15 together with r15's own adds, then the
# oldest r12-gated entries in registry order.
#
# winnow_dedup_pairs_fast is rows-only BY DESIGN (no xxhash64 in
# DuckDB; overlap vs the portable path is pytest-pinned) — it must
# NEVER be listed here: inside the gate head the driver would record
# an `err` for its missing oracle. It stays below slot 50 because
# this list holds exactly 50 oracle-backed names.
GATE_PRIORITY = [
    # (a) added/changed in round 14
    "lm3_bits_docs",                 # NEW r14: trigram-LM scoring (smoothed)
    "lm3_quality_docs",              # NEW r14: trigram perplexity gate
    "curate_head_lm3_docs",          # NEW r14: curation + trigram gate compose
    "curate_head_lm_docs",           # CHANGED r14: head now joins >256-entry models
    # (b) the 19-query r9 tail (registry order; 5 rounds since last gate)
    "ddt_rate", "ewma_smoothed", "coll_percentiles_hourly",
    "dedup_exact_docs", "ngram_jaccard_pairs", "ann_ivf_topk",
    "stratified_sample_docs", "boilerplate_removed_docs",
    "ann_ivfpq_trained_topk", "winnow_dedup_pairs", "bpe_top_pairs",
    "pca_power_iter", "pca_project_trained", "tfidf_top_terms",
    "dup_span_fraction_docs", "top_suppliers",
    "priority_conditional_counts", "brand_part_revenue",
    "segment_top_orders",
    # (c) first 27 of the 45-entry r10 cohort (registry order)
    "where_basic", "over_filter", "tagged_all", "split_routing",
    "throttle", "stable_states", "with_const", "default_missing",
    "scale_metric", "coll_increase_daily", "coll_where_inside_window",
    "coll_sum_hourly", "coll_mean_hourly", "sessionize_user_events",
    "zscore_events", "minhash_lsh_pairs", "simhash_pairs",
    "dedup_clusters", "dedup_survivors_docs", "ann_bruteforce_topk",
    "ann_bruteforce_l2_topk", "ann_lsh_topk", "ann_pq_topk",
    "embedding_near_dups", "semantic_dedup_survivors",
    "contamination_docs", "pack_docs",
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
