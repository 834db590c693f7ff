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
# so ordering is coverage policy. Round-16 rotation (VERDICT r15 ask
# #1, executed as written): (a) queries ADDED in round 16 lead — the
# image perceptual-hash pair (dHash over the real netpbm codec +
# Hamming-band near-dup resolution), the video frame-dHash near-dup,
# and the audio envelope-dHash pair (stdlib WAV codec + the same
# band machinery); (b) the 20-query r12 tail — last driver-gated in
# round 12, the oldest cohort; (c) the first 25 of the 47-entry r13
# cohort, registry order, filling to exactly 50.
# After this gate no query's last-green is older than r13; the
# remaining 22 r13-gated entries (coll_top3, coll_bottom3,
# coll_sort_ids, by_sum_daily,
# smax_running, semdedup_survivors, semdedup_arrow_survivors,
# semdedup_prod_survivors, semdedup_prod_arrow_survivors,
# ngram_containment_pairs, contamination_bloom_docs,
# dsir_logweight_docs, dsir_top_docs, temperature_sample_docs,
# bpe_fertility_by_lang, curate_head_dsir_docs,
# dup_span_removed_prefilter_docs, dup_span_removed_char_prefilter_docs,
# dup_span_removed_twophase_docs, vocab_cardinality_by_lang,
# corpus_datasheet, volume_shipping) lead r17 together with r17's own
# adds, then the oldest r14-gated entries in registry order.
#
# winnow_dedup_pairs_fast is rows-only BY DESIGN (no xxhash64 in
# DuckDB; overlap vs the portable path is pytest-pinned) — it must
# NEVER be listed here: inside the gate head the driver would record
# an `err` for its missing oracle. It stays below slot 50 because
# this list holds exactly 50 oracle-backed names.
GATE_PRIORITY = [
    # (a) added in round 16 (image/video/audio perceptual-hash near-dup)
    "image_dhash_docs", "image_near_dups", "video_near_dups",
    "audio_dhash_docs", "audio_near_dups",
    # (b) the 20-query r12 tail (registry order; 4 rounds since last gate)
    "text_quality", "text_lang_id", "text_fingerprint",
    "text_rolling_fp", "neardup_degree_histogram", "soft_dedup_docs",
    "corpus_split_docs", "search_quality_docs", "doc_length_profile",
    "split_token_budget", "bpe_segment_trained", "scrubbed_corpus_docs",
    "curate_head_logreg_docs", "logreg_quality_docs", "curate_head_docs",
    "dup_span_removed_docs", "dup_span_removed_char_docs",
    "order_priority_counts", "returned_item_customers",
    "large_order_customers",
    # (c) first 25 of the 47-entry r13 cohort (registry order)
    "where_not", "where_regex", "under_filter", "expired_events",
    "not_expired_events", "changed_transitions", "above_dt_alert",
    "outside_dt_alert", "extract_nested", "sflatten_roundtrip",
    "moving_time_window_count", "coalesce_latest", "agg_sum_hourly",
    "agg_sum_delayed_hourly", "agg_mean_hourly", "agg_top_event",
    "agg_bottom_event", "agg_rate_hourly", "agg_ratio_error_click",
    "agg_percentiles_hourly", "coll_count_hourly", "coll_max_hourly",
    "coll_min_hourly", "coll_rate_hourly", "coll_quotient_daily",
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
