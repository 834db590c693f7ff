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
# so ordering is coverage policy. Round-11 rotation (VERDICT r10 ask
# #1): (a) the 9 queries added or whose implementation changed in
# round 11; (b) ALL 41 entries last gated in CORRECTNESS_r08 — the
# oldest cohort, registry order. 9 + 41 = 50 exactly. After this
# gate every entry's last-green is within rounds 9–11
# (freshness <= 3).
#
# winnow_dedup_pairs_fast is rows-only BY DESIGN (no xxhash64 in
# DuckDB; overlap vs the portable path is pytest-pinned) — it must
# NEVER be listed here: inside the gate head the driver would record
# an `err` for its missing oracle. It stays below slot 50 because
# this list holds exactly 50 oracle-backed names.
GATE_PRIORITY = [
    # (a) added / implementation changed in round 11
    "dup_span_removed_char_docs",  # NEW: char-grain ExactSubstr
    "curate_head_docs",            # NEW: curation head (DSL `curate`)
    "logreg_quality_docs",         # NEW: engine-trained quality model
    "curate_head_logreg_docs",     # NEW: trained-gate curation compose
    "dup_span_removed_docs",       # impl: grain refactor + pos guard
    "scrubbed_corpus_docs",        # impl: same span-removal path
    "returned_item_customers",     # impl: broadcast-hint policy fix
    "large_order_customers",       # impl: broadcast-hint policy fix
    "bpe_segment_trained",         # impl: trainer self-pair fence
    # (b) ALL 41 entries last gated r8, registry order
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
    "text_repetition", "text_quality", "text_lang_id",
    "text_fingerprint", "text_rolling_fp", "neardup_degree_histogram",
    "soft_dedup_docs", "corpus_split_docs", "search_quality_docs",
    "doc_length_profile", "split_token_budget", "order_priority_counts",
]

# Round-12 rotation note: lead r12 with (a) any r12 adds/changes,
# then (b) the TWELVE r11 queries added after this gate was frozen —
# semdedup_survivors, dsir_logweight_docs, dsir_top_docs,
# contamination_bloom_docs, curate_head_dsir_docs,
# bpe_fertility_by_lang, volume_shipping,
# vocab_cardinality_by_lang, temperature_sample_docs,
# ngram_containment_pairs, semdedup_arrow_survivors,
# corpus_datasheet (never driver-gated yet; all twelve are
# exact-oracle and check_correctness-green at r11 HEAD), then
# (c) as many of the 49-entry r9 cohort as fit (registry order:
# where_not, where_regex, under_filter, expired_events,
# not_expired_events, changed_transitions, ...), then the
# r10-cohort head (where_basic, over_filter, tagged_all,
# split_routing, ...); whatever r9 tail does not fit leads r13.
# Keep winnow_dedup_pairs_fast out of the head (see above).


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
