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
# so ordering is coverage policy. Round-15 rotation (VERDICT r14 ask
# #1, executed as written): (a) queries CHANGED in round 15 lead —
# the bigram-LM pair, whose default gate gains a cost floor this
# round (both were last gated r13, so re-gating them is legal under
# the "no r14 repeats" rule); (b) the 18-query r10 tail — last
# driver-gated in round 10, the oldest cohort; (c) the first 30 of
# the 50-entry r12 cohort, registry order, filling to exactly 50.
# After this gate no query's last-green is older than r12; the r12
# tail of 20 (text_quality, text_lang_id, text_fingerprint,
# text_rolling_fp, neardup_degree_histogram, soft_dedup_docs,
# corpus_split_docs, search_quality_docs, doc_length_profile,
# split_token_budget, bpe_segment_trained, scrubbed_corpus_docs,
# curate_head_logreg_docs, logreg_quality_docs, curate_head_docs,
# dup_span_removed_docs, dup_span_removed_char_docs,
# order_priority_counts, returned_item_customers,
# large_order_customers) leads r16 together with r16's own adds,
# then the oldest r13-gated entries in registry order.
#
# winnow_dedup_pairs_fast is rows-only BY DESIGN (no xxhash64 in
# DuckDB; overlap vs the portable path is pytest-pinned) — it must
# NEVER be listed here: inside the gate head the driver would record
# an `err` for its missing oracle. It stays below slot 50 because
# this list holds exactly 50 oracle-backed names.
GATE_PRIORITY = [
    # (a) changed in round 15 (bigram gate cost floor; last gated r13)
    "lm_bits_docs", "lm_quality_docs",
    # (b) the 18-query r10 tail (registry order; 5 rounds since last gate)
    "gopher_quality_docs", "vocab_top100", "token_rarity_docs",
    "mixture_sample_docs", "clean_corpus_docs", "paragraph_dedup_docs",
    "multimodal_features", "video_frame_sample", "linear_quality_docs",
    "ivf_centroid_update", "best_docs_per_lang", "token_chunks_docs",
    "ann_sq_topk", "ann_ivfpq_topk", "ann_ivfpq_rerank_topk",
    "ann_ivfpq_cosine_topk", "tpch_pricing_summary",
    "revenue_by_nation",
    # (c) first 30 of the 50-entry r12 cohort (registry order)
    "increment_metric", "decrement_metric", "sformat_label",
    "to_string_field", "base64_roundtrip", "from_json_props",
    "rename_keys_proj", "keep_keys_proj", "sdissoc_proj", "tag_untag",
    "iterate_on_explode", "fixed_time_window_ids",
    "fixed_event_window_ids", "moving_event_window_vals",
    "ssort_sorted", "project_correlate", "smin_running",
    "ddt_pos_rate", "below_dt_alert", "between_dt_alert",
    "critical_dt_alert", "dsl_pipeline", "coalesce_fill",
    "ann_ivf_trained_topk", "ann_pq_trained_topk", "hash_sample_docs",
    "mask_pii_docs", "text_token_count", "text_bpe_token_count",
    "text_repetition",
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
