"""Pruned TRIGRAM language-model perplexity scoring — the r14
upgrade of :mod:`mirabelle_spark.pipeline.lm` toward CCNet's actual
filter (Wenzek et al. 2020 gate documents with a pruned 5-gram
KenLM; the reference pipeline's quality stage names the same idea —
this is the trigram form with a penalized backoff chain).

Same trained-artifact lifecycle and the same INTEGER micro-bit
currency as the bigram module: TRAIN once — exact BIGINT n-gram
counts via relational aggregates, log2 taken once on the driver over
the bounded top-K rows — PIN per-n-gram costs as integer literals
(``round(-log2(p) * 1e9)``), INFER with no float anywhere, so the
per-document sum is exact, order-free, and bit-identical to the
DuckDB oracle (a three-level LEFT JOIN + SUM over the same VALUES
tables).

Two deliberate deltas from the bigram module (both ADVICE r13):

- **Smoothed conditionals — no zero-cost n-grams.** Every pinned
  probability is penalized-MLE ``count / (denominator + 1)``, which
  is strictly < 1, so every cost is strictly positive: a degenerate
  document spamming one deterministic n-gram can no longer score 0
  bits/token and walk through the gate (the unsmoothed bigram
  module's documented caveat).
- **Join strategy for every batch path.** The fold's literal-map
  probe is a linear scan per token triple and is already past its
  measured crossover at bigram model sizes (lm.FOLD_MAX_ENTRIES,
  PERF §79/§82); a trigram model is strictly larger, so scoring
  has no fold tier. Lookups are three BROADCAST hash joins
  (trigram → bigram backoff → unigram backoff → OOV), each O(1)
  per probe. The ONLY fold form is :func:`lm3_gate_expr`, the
  row-local gate for streaming projections where a join is
  unavailable — priced as measured-slower and documented as such.

Backoff chain for scoring token ``c`` after context ``(a, b)``::

    pinned (a,b,c)  → bits(-log2 P̃(c|a,b))
    pinned (b,c)    → backoff + bits(-log2 P̃(c|b))
    pinned (c)      → 2·backoff + bits(-log2 P̃(c))
    else            → oov = 2·backoff + bits(log2(n_tokens + 1))

Scale: training is three explode+hash-aggregate passes with
bounded top-K collects (K rows of driver state); inference explodes
narrow (id, a, b, c) rows, broadcast-probes the model (constant,
executor-resident), and re-aggregates with one map-side-combining
groupBy(id) — model side O(1), corpus side linear, one narrow
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mirabelle_spark.pipeline.lm import _toks


def _triple_structs(text_col: str) -> Column:
    """In-row (a, b, c) token-triple structs: zip of three shifted
    slices — never a per-triple re-split; empty for docs under 3
    tokens (NULL text is the empty document, the lm module's
    contract)."""
    w = _toks(F.col(text_col))
    L = F.size(w)
    n = F.greatest(L - 2, F.lit(0))
    ab = F.zip_with(
        F.slice(w, 1, n),
        F.slice(w, 2, n),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return F.zip_with(
        ab,
        F.slice(w, 3, n),
        lambda p, c: F.struct(
            p["a"].alias("a"), p["b"].alias("b"), c.alias("c")
        ),
    )


def trigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact corpus trigram counts: one in-row triple construction
    then ONE map-side-combining hash aggregate → (a, b, c, n:
    bigint). Narrow rows, partials combine map-side, output is
    vocabulary³-bounded and Zipf-tiny in practice."""
    from mirabelle_spark.scale import ensure_parallelism

    return (
        ensure_parallelism(df)
        .select(F.explode(_triple_structs(text_col)).alias("__t__"))
        .groupBy(
            F.col("__t__.a").alias("a"),
            F.col("__t__.b").alias("b"),
            F.col("__t__.c").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_trigram_lm(
    df: DataFrame,
    top_trigrams: int = 2048,
    top_bigrams: int = 1024,
    top_unigrams: int = 512,
    backoff_bits: float = 4.0,
    text_col: str = "text",
) -> dict:
    """Fit the pruned trigram LM. Deterministic and partitioning-
    invariant (exact BIGINT counts, lexicographic tie-breaks, log2
    once on the driver — the train_dsir contract). All conditionals
    are penalized MLE ``count / (denominator + 1)`` — strictly < 1,
    so every pinned cost is strictly positive (no zero-cost n-gram
    can exist; ADVICE r13).

    Returns ``{"trigrams": [(a, b, c, bits_e9)], "bigrams":
    [(a, b, bits_e9)], "unigrams": [(w, bits_e9)], "oov_e9": int,
    "n_tokens": int, "backoff_e9": int}`` where the bigram entries
    already include ONE backoff penalty and the unigram entries TWO
    (pin-time baking, the bigram module's convention — inference
    just coalesces)."""
    import math

    from mirabelle_spark.pipeline.lm import bigram_counts

    def e9(bits: float) -> int:
        return round(bits * 1_000_000_000)

    backoff_e9 = e9(backoff_bits)

    # SEP-bearing tokens are excluded from the MODEL (as in
    # train_bigram_lm, ADVICE r13): pinned composite keys then
    # carry exactly their level's SEP count, so lm3_gate_expr's
    # fold probes can never collide and its map literals can never
    # see duplicate keys; such tokens score as OOV — the right
    # price for control-character junk
    from mirabelle_spark.pipeline.lm import SEP

    tg = trigram_counts(df, text_col=text_col).filter(
        ~F.col("a").contains(SEP)
        & ~F.col("b").contains(SEP)
        & ~F.col("c").contains(SEP)
    )
    tg_den = tg.groupBy("a", "b").agg(F.sum("n").alias("nab"))
    top_tg = (
        tg.join(tg_den, ["a", "b"])
        .orderBy(F.desc("n"), "a", "b", "c")
        .limit(top_trigrams)
        .collect()
    )
    trigrams = sorted(
        (
            r["a"],
            r["b"],
            r["c"],
            e9(-math.log2(r["n"] / (r["nab"] + 1))),
        )
        for r in top_tg
    )

    bg = bigram_counts(df, text_col=text_col).filter(
        ~F.col("a").contains(SEP) & ~F.col("b").contains(SEP)
    )
    bg_den = bg.groupBy("a").agg(F.sum("c").alias("na"))
    top_bg = (
        bg.join(bg_den, "a")
        .orderBy(F.desc("c"), "a", "b")
        .limit(top_bigrams)
        .collect()
    )
    bigrams = sorted(
        (
            r["a"],
            r["b"],
            backoff_e9 + e9(-math.log2(r["c"] / (r["na"] + 1))),
        )
        for r in top_bg
    )

    uni = (
        df.select(F.explode(_toks(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(~F.col("w").contains(SEP))
    )
    n_tokens = int(uni.agg(F.sum("c").alias("n")).collect()[0]["n"] or 0)
    top_uni = uni.orderBy(F.desc("c"), "w").limit(top_unigrams).collect()
    unigrams = sorted(
        (
            r["w"],
            2 * backoff_e9 + e9(-math.log2(r["c"] / (n_tokens + 1))),
        )
        for r in top_uni
    )
    oov_e9 = 2 * backoff_e9 + e9(math.log2(n_tokens + 1))
    return {
        "trigrams": trigrams,
        "bigrams": bigrams,
        "unigrams": unigrams,
        "oov_e9": oov_e9,
        "n_tokens": n_tokens,
        "backoff_e9": backoff_e9,
    }


def lm3_gate_expr(
    model: dict,
    max_bits_per_token: float,
    min_trigrams: int = 16,
    text_col: str = "text",
) -> Column:
    """The trigram perplexity gate as a ROW-LOCAL boolean Column —
    for contexts where a join is UNAVAILABLE (the streaming curation
    head's stateless projection), mirroring
    :func:`~mirabelle_spark.pipeline.lm.lm_gate_expr`. Probes three
    constant-folded map literals with SEP-composite keys
    (collision-free: train_trigram_lm pins only SEP-free tokens, so
    every pinned key carries exactly its level's SEP count).
    Same exact integer cross-multiplication as :func:`lm3_quality`
    and the identical backoff coalesce, so the survivor set equals
    the join path's bit-for-bit (parity pytest).

    PRICE THIS CORRECTLY: each probe is a LINEAR scan of the
    literal maps (the lm module's measured fold trap, PERF
    §79/§82) — at the pinned ~3.5k-entry artifact this is the
    measured-slower strategy and exists ONLY because a streaming
    projection cannot join; batch pipelines must use
    :func:`lm3_quality`."""
    from mirabelle_spark.pipeline.lm import SEP

    tkeys = [a + SEP + b + SEP + c for a, b, c, _ in model["trigrams"]]
    tvals = [v for *_, v in model["trigrams"]]
    bkeys = [a + SEP + b for a, b, _ in model["bigrams"]]
    bvals = [v for _, _, v in model["bigrams"]]
    ukeys = [w for w, _ in model["unigrams"]]
    uvals = [v for _, v in model["unigrams"]]
    tmap = F.map_from_arrays(F.lit(tkeys), F.lit(tvals))
    bmap = F.map_from_arrays(F.lit(bkeys), F.lit(bvals))
    umap = F.map_from_arrays(F.lit(ukeys), F.lit(uvals))
    oov = F.lit(int(model["oov_e9"])).cast("long")
    triples = _triple_structs(text_col)
    costs = F.transform(
        triples,
        lambda s: F.coalesce(
            F.try_element_at(
                tmap,
                F.concat(s["a"], F.lit(SEP), s["b"], F.lit(SEP), s["c"]),
            ),
            F.try_element_at(bmap, F.concat(s["b"], F.lit(SEP), s["c"])),
            F.try_element_at(umap, s["c"]),
            oov,
        ).cast("long"),
    )
    bits = F.aggregate(
        costs, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    t_e9 = round(max_bits_per_token * 1_000_000_000)
    n = F.size(triples).cast("long")
    return (n >= F.lit(int(min_trigrams))) & (bits <= F.lit(t_e9) * n)


def lm3_bits(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
    validate: bool = False,
) -> DataFrame:
    """Per-document trigram-LM cost: ``bits_e9`` = Σ over token
    triples of the pinned integer micro-bit cost (trigram hit, else
    bigram backoff on ``(b, c)``, else unigram backoff on ``c``,
    else OOV), ``n_trigrams`` = max(len−2, 0).
    ``bits_e9 / n_trigrams / 1e9`` is bits-per-token; perplexity =
    2^bpt. Returns every input row (docs under 3 tokens — and NULL
    text — score 0/0).

    CONTRACT (the lm module's, inherited): ``(id_col, *keep_cols)``
    must be row-unique — the re-aggregate groups on that tuple, so
    duplicates silently merge. ``validate=True`` (r15) runs the lm
    module's opt-in bounded uniqueness check up front and raises
    loudly on the first offender.

    Plan: input rebalance insurance (scale.needs_rebalance, PERF
    §80) → triple explode_outer to narrow (id, a, b, c) rows
    (sub-3-token docs ride along as one null-triple row — no second
    input scan, no union) → three BROADCAST hash joins (the model is
    constant and executor-resident; probes are O(1) — the join
    strategy only, see the module docstring) → one
    map-side-combining groupBy(id)."""
    from mirabelle_spark.scale import ensure_parallelism

    if validate:
        from mirabelle_spark.pipeline.lm import _validate_unique_keys

        _validate_unique_keys(df, id_col, keep_cols, "lm3_bits")
    df = ensure_parallelism(df)
    spark = df.sparkSession
    oov = F.lit(int(model["oov_e9"])).cast("long")

    from mirabelle_spark.pipeline.lm import model_table

    tg = model_table(
        spark, model["trigrams"],
        "__ta string, __tb string, __tc string, __ct long",
    )
    bg = model_table(
        spark, model["bigrams"], "__ba string, __bb string, __cb long"
    )
    ug = model_table(spark, model["unigrams"], "__uw string, __cu long")

    triples = _triple_structs(text_col)
    # ONE pass (r16): explode_outer keeps sub-3-token docs as a
    # single null-triple row, so the zero-doc arm needs no second
    # scan of ``df`` (the old union recomputed the token triples per
    # row just to size them; _toks coalesces NULL text to the empty
    # array, so ``triples`` is never null and the null-struct row is
    # exactly the empty document). Null probe keys match no model
    # row; the aggregate counts/sums only the real rows — output
    # identical including NULL-text and short docs (pytest-pinned).
    exploded = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode_outer(triples).alias("__t__"),
    ).select(
        id_col,
        *keep_cols,
        F.col("__t__.a").alias("__a__"),
        F.col("__t__.b").alias("__b__"),
        F.col("__t__.c").alias("__c__"),
    )
    costed = (
        exploded.join(
            F.broadcast(tg),
            (F.col("__a__") == F.col("__ta"))
            & (F.col("__b__") == F.col("__tb"))
            & (F.col("__c__") == F.col("__tc")),
            "left",
        )
        .join(
            F.broadcast(bg),
            (F.col("__b__") == F.col("__ba"))
            & (F.col("__c__") == F.col("__bb")),
            "left",
        )
        .join(F.broadcast(ug), F.col("__c__") == F.col("__uw"), "left")
        .select(
            id_col,
            *keep_cols,
            F.col("__a__").isNotNull().alias("__real__"),
            F.coalesce("__ct", "__cb", "__cu", oov).alias("__cost__"),
        )
    )
    return costed.groupBy(id_col, *keep_cols).agg(
        F.sum(F.col("__real__").cast("long")).alias("n_trigrams"),
        F.sum(
            F.when(F.col("__real__"), F.col("__cost__")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("bits_e9"),
    )


def lm3_quality(
    df: DataFrame,
    model: dict,
    max_bits_per_token: float,
    min_trigrams: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
    validate: bool = False,
) -> DataFrame:
    """The trigram perplexity GATE: keep documents with at least
    ``min_trigrams`` token triples whose LM cost is at most
    ``max_bits_per_token`` — compared by EXACT integer
    cross-multiplication (``bits_e9 ≤ t·1e9 · n``; no division, no
    float, bit-stable across engines). Because every pinned cost is
    strictly positive (smoothed conditionals), no document — however
    repetitive — scores 0 bits/token: the bigram module's
    degenerate-spam caveat is closed here. Same plan as
    :func:`lm3_bits` plus one filter."""
    t_e9 = round(max_bits_per_token * 1_000_000_000)
    scored = lm3_bits(
        df, model, text_col=text_col, id_col=id_col, keep_cols=keep_cols,
        validate=validate,
    )
    return scored.filter(
        (F.col("n_trigrams") >= min_trigrams)
        & (F.col("bits_e9") <= F.lit(t_e9) * F.col("n_trigrams"))
    )
