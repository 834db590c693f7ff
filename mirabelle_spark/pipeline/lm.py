"""Pruned bigram language-model perplexity scoring — the CCNet-style
LM quality filter (Wenzek et al. 2020 "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data" filters by KenLM perplexity;
the reference pipeline's quality stage names the same idea).

Lifecycle = the engine's trained-artifact pattern
(logreg_quality_trained / dsir_logratios_trained): TRAIN once — exact
integer n-gram counts via one relational aggregate, the only
transcendental (log2) taken on the driver over the bounded top-K rows
— PIN the per-n-gram costs as INTEGER micro-bit literals
(``round(-log2(p) * 1e9)``), then INFER as a shuffle-free in-row
projection: token pairs fold against two constant-folded map
literals. Integer costs make the per-document sum exact, order-free,
and bit-identical across engines — no floating summation anywhere in
the inference path, so the DuckDB oracle (a join + SUM over the same
VALUES table) hashes byte-equal.

Model shape (classic pruned-LM backoff):

- top-K corpus bigrams carry ``-log2 P(b|a)`` (MLE over exact counts,
  denominator = bigrams starting with ``a``);
- top-U unigrams carry ``backoff_bits + -log2 P(w)`` (the penalized
  unigram backoff for unpinned bigrams);
- everything else costs ``oov_bits_e9`` (backoff + add-one floor
  ``-log2(1/(N+1))``).

Scale: scoring is a pure Catalyst projection — zero shuffles, zero
UDFs, the scan is the only I/O; the pinned maps ride the plan as two
constant literals (~K+U entries), not a join side. Training is one
explode + two hash aggregates + two bounded top-K collects (K rows of
driver state, the train_dsir contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# U+001F unit separator, the fold strategy's composite-key glue for
# "a SEP b" bigram keys. NOTE (ADVICE r13): \x1f is NOT Java-regex
# whitespace (\s is [ \t\n\x0B\f\r]), so corpus tokens CAN contain
# it — collision-freedom is guaranteed on the MODEL side instead:
# train_bigram_lm drops SEP-bearing tokens, so every pinned map key
# carries exactly one SEP; a probe key built from a SEP-bearing
# corpus token has ≥ 2 and can never falsely hit (and map_from_arrays
# can never see duplicate keys).
SEP = "\x1f"


def _toks(text: Column) -> Column:
    """The engine-wide token canon (text.tokens + non-empty filter).
    NULL text coalesces to the empty document (0 tokens → 0 pairs,
    0 bits) so both lookup strategies keep the row instead of the
    join path silently dropping it (ADVICE r13)."""
    from mirabelle_spark.pipeline.text import tokens

    return F.filter(
        tokens(F.coalesce(text, F.lit(""))), lambda t: t != F.lit("")
    )


def bigram_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Exact corpus bigram counts: one in-row pair construction
    (zip_with over two shifted slices — never a per-pair re-split)
    then ONE map-side-combining hash aggregate. Returns
    (a, b, c: bigint). At 100 TB: narrow rows, partials combine
    map-side, output is vocabulary²-bounded (and Zipf-tiny in
    practice)."""
    from mirabelle_spark.scale import ensure_parallelism

    w = _toks(F.col(text_col))
    L = F.size(w)
    pairs = F.zip_with(
        F.slice(w, 1, F.greatest(L - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(L - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        ensure_parallelism(df).select(F.explode(pairs).alias("__p__"))
        .groupBy(
            F.col("__p__.a").alias("a"), F.col("__p__.b").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_bigram_lm(
    df: DataFrame,
    top_bigrams: int = 2000,
    top_unigrams: int = 512,
    backoff_bits: float = 4.0,
    text_col: str = "text",
) -> dict:
    """Fit the pruned bigram LM. Deterministic and partitioning-
    invariant: every count is an exact BIGINT aggregate, top-K ties
    break lexicographically, and log2 happens once on the driver
    over the K collected rows (the train_dsir contract — inference
    never touches a transcendental).

    Returns ``{"bigrams": [(a, b, bits_e9)], "unigrams":
    [(w, bits_e9)], "oov_e9": int, "n_tokens": int, "backoff_e9":
    int}`` where ``bits_e9 = round(-log2(p) * 1e9)`` (integer
    micro-bits, the exact-summation currency)."""
    import math

    # SEP-bearing tokens are excluded from the MODEL (not from
    # inference tokenization): pinned map keys then carry exactly one
    # SEP each, so the fold strategy's composite probe keys can never
    # collide and map_from_arrays can never see duplicates (the \x1f
    # note at SEP; ADVICE r13). Such tokens score as OOV — the
    # correct price for control-character junk.
    bg = bigram_counts(df, text_col=text_col).filter(
        ~F.col("a").contains(SEP) & ~F.col("b").contains(SEP)
    )
    # denominator: bigrams STARTING with a — the true MLE conditional
    # denominator, an exact sum over the (already tiny) distinct-
    # bigram table, not a second pass over the corpus
    first = bg.groupBy("a").agg(F.sum("c").alias("ca"))
    top_bg = (
        bg.join(first, "a")
        .orderBy(F.desc("c"), "a", "b")
        .limit(top_bigrams)
        .collect()
    )
    toks = df.select(
        F.explode(_toks(F.col(text_col))).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")).filter(
        ~F.col("w").contains(SEP)
    )
    n_tokens = int(
        uni.agg(F.sum("c").alias("n")).collect()[0]["n"] or 0
    )
    top_uni = uni.orderBy(F.desc("c"), "w").limit(top_unigrams).collect()

    def e9(bits: float) -> int:
        return round(bits * 1_000_000_000)

    backoff_e9 = e9(backoff_bits)
    # floor pinned conditionals at 1 micro-bit (r15, VERDICT r14):
    # unsmoothed MLE prices a deterministic bigram (c == ca) at
    # exactly 0 bits, which a degenerate one-pair spam document can
    # ride through ANY bits/token threshold. One micro-bit keeps the
    # integer-exact currency, never changes a non-degenerate pin
    # (the next-cheapest real conditional is ~1e9 units), and makes
    # every pinned cost strictly positive. The enforceable-gate fix
    # is the DSL default now routing to the smoothed trigram model
    # (plans/builder._curate_lm); this floor hardens the opt-in
    # bigram path itself.
    bigrams = sorted(
        (r["a"], r["b"], max(1, e9(-math.log2(r["c"] / r["ca"]))))
        for r in top_bg
    )
    unigrams = sorted(
        (r["w"], backoff_e9 + e9(-math.log2(r["c"] / n_tokens)))
        for r in top_uni
    )
    oov_e9 = backoff_e9 + e9(math.log2(n_tokens + 1))
    return {
        "bigrams": bigrams,
        "unigrams": unigrams,
        "oov_e9": oov_e9,
        "n_tokens": n_tokens,
        "backoff_e9": backoff_e9,
    }


def _pair_structs(text_col: str) -> Column:
    """In-row (a, b) token-pair structs: zip of two shifted slices,
    never a per-pair re-split; empty for docs under 2 tokens."""
    w = _toks(F.col(text_col))
    L = F.size(w)
    return F.zip_with(
        F.slice(w, 1, F.greatest(L - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(L - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


# auto-strategy crossover: Spark's GetMapValue on a literal map is a
# LINEAR scan (ArrayBasedMapData has no hash), so the in-row fold
# costs O(model size) per token pair — measured 4× on the 962-entry
# pinned model at sf0.1 (PERF §79). Below this bound the fold's
# zero-shuffle plan still wins on total cost; above it the broadcast
# hash join's O(1) probes do.
FOLD_MAX_ENTRIES = 256


def _fold_bits(pairs: Column, model: dict) -> Column:
    """In-row bits_e9 over a pair-structs column — the fold
    strategy's cost expression. The two lookup maps are built
    OUTSIDE the lambda (a constant-folded Literal has no per-row
    materialization cost — the PERF §26 re-evaluation trap applies
    to non-literal columns only); each probe is a LINEAR scan of
    the literal map, so this expression is for small pinned
    models and for row-local contexts (streaming gates) where a
    join is not available."""
    bkeys = [a + SEP + b for a, b, _ in model["bigrams"]]
    bvals = [v for _, _, v in model["bigrams"]]
    ukeys = [w for w, _ in model["unigrams"]]
    uvals = [v for _, v in model["unigrams"]]
    bmap = F.map_from_arrays(F.lit(bkeys), F.lit(bvals))
    umap = F.map_from_arrays(F.lit(ukeys), F.lit(uvals))
    oov = F.lit(int(model["oov_e9"])).cast("long")
    costs = F.transform(
        pairs,
        lambda s: F.coalesce(
            F.try_element_at(bmap, F.concat(s["a"], F.lit(SEP), s["b"])),
            F.try_element_at(umap, s["b"]),
            oov,
        ).cast("long"),
    )
    return F.aggregate(
        costs, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def model_table(spark, rows, schema: str):
    """Tiny broadcast-side model table from pinned rows, shared by
    the bigram and trigram join scorers (r14 review: the
    placeholder-or-limit(0) idiom lived in five copies).
    ``createDataFrame([])`` cannot infer types, so an EMPTY model
    still materializes one placeholder row of the right shape and
    immediately ``limit(0)``s it away — the schema survives, the
    row never exists."""
    placeholder = tuple(
        "" if col.split()[-1] == "string" else 0
        for col in schema.split(",")
    )
    df = spark.createDataFrame(list(rows) or [placeholder], schema)
    if not rows:
        df = df.limit(0)
    return df


def lm_gate_expr(
    model: dict,
    max_bits_per_token: float,
    min_bigrams: int = 16,
    text_col: str = "text",
) -> Column:
    """The CCNet perplexity gate as a ROW-LOCAL boolean Column —
    composable into any stateless projection (the curation head's
    quality stage, a streaming filter) without a join or shuffle:
    at least ``min_bigrams`` token pairs AND LM cost ≤
    ``max_bits_per_token`` by exact integer cross-multiplication
    (``bits_e9 ≤ t·1e9 · n`` — no division, no float, bit-stable
    across engines). Uses the fold cost expression, so it is priced
    for small pinned models; batch pipelines with large models
    should filter on :func:`lm_bits` (strategy='join') instead."""
    t_e9 = round(max_bits_per_token * 1_000_000_000)
    pairs = _pair_structs(text_col)
    n = F.size(pairs).cast("long")
    return (n >= F.lit(int(min_bigrams))) & (
        _fold_bits(pairs, model) <= F.lit(t_e9) * n
    )


def _validate_unique_keys(
    df: DataFrame, id_col: str, keep_cols: tuple, fn_name: str
) -> None:
    """Loud form of the scorer id contract (r15, VERDICT r14 ask
    #7): raise if any ``(id_col, *keep_cols)`` tuple repeats,
    naming one offender. One bounded aggregate job — the groupBy
    combines map-side and ``limit(1)`` stops at the first
    duplicate — run ONLY under the opt-in ``validate=True`` (the
    silent-merge failure mode it guards is otherwise invisible:
    the join strategy would sum duplicate ids into one row)."""
    dup = (
        df.groupBy(id_col, *[F.col(c) for c in keep_cols])
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        key = {f: dup[0][f] for f in (id_col, *keep_cols)}
        raise ValueError(
            f"{fn_name}(validate=True): ({id_col}, {keep_cols}) is not "
            f"row-unique — e.g. {key} appears {dup[0]['__n__']} times; the "
            "join strategy would silently merge these rows into one summed "
            "score. Deduplicate or add a surrogate key before scoring."
        )


def lm_bits(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
    strategy: str = "auto",
    validate: bool = False,
) -> DataFrame:
    """Per-document LM cost under a trained pruned bigram model:
    ``bits_e9`` = Σ over token pairs of the pinned integer
    micro-bit cost (bigram hit, else penalized unigram backoff on
    the SECOND word, else OOV), ``n_bigrams`` = max(len-1, 0).
    ``bits_e9 / n_bigrams / 1e9`` is bits-per-token — CCNet's
    perplexity statistic in log form (perplexity = 2^bpt).
    Returns every input row (empty/1-token/NULL-text docs score
    0/0); output is identical across strategies (parity pytest).

    CONTRACT (ADVICE r13): ``(id_col, *keep_cols)`` must be
    row-unique — the join strategy re-aggregates on that tuple, so
    duplicate ids would SILENTLY merge into one summed row while
    the fold strategy keeps them separate. Every engine id column
    (``doc_id``) satisfies this; pre-aggregate or add a surrogate
    key before scoring anything that doesn't. ``validate=True``
    (r15, VERDICT r14 ask #7) makes the violation LOUD instead:
    one opt-in bounded aggregate job over the key tuple up front,
    raising ``ValueError`` naming an offending key if any tuple
    repeats — pay it on untrusted inputs; pinned pipelines whose
    id provenance is known skip it.

    ``strategy`` picks the PHYSICAL lookup plan (both behind one
    input-rebalance insurance — the pair explode/probe work is
    CPU-dense per input byte, and a one-row-group file otherwise
    runs it all on one core no matter what the split count claims,
    :func:`mirabelle_spark.scale.needs_rebalance` / PERF §80):

    - ``"fold"`` — JOIN-free: the two lookup tables ride the plan
      as constant-folded map literals (built OUTSIDE the lambda; a
      folded Literal has no per-row materialization cost, the PERF
      §26 trap) and the pair fold is one in-row aggregate — no
      exchange beyond the input rebalance. But Spark's map-literal
      access is a LINEAR scan per probe — right only for small
      pinned models.
    - ``"join"`` — the large-model path: pairs explode_outer to
      narrow rows (zero-pair docs ride along as one null-pair row —
      no second input scan, no union), two BROADCAST hash joins
      price each pair in O(1), one map-side-combining groupBy(doc)
      re-aggregates. One shuffle of narrow (id, cost) rows; the
      model broadcasts once per executor, which is exactly where a
      200k-entry production LM belongs.
    - ``"auto"`` (default) — fold iff the model carries at most
      ``FOLD_MAX_ENTRIES`` entries."""
    if strategy not in ("auto", "fold", "join"):
        raise ValueError(
            f"strategy must be 'auto', 'fold' or 'join', got {strategy!r}"
        )
    if validate:
        _validate_unique_keys(df, id_col, keep_cols, "lm_bits")
    n_entries = len(model["bigrams"]) + len(model["unigrams"])
    if strategy == "auto":
        strategy = "fold" if n_entries <= FOLD_MAX_ENTRIES else "join"
    # the pair explode + probe work is CPU-dense per input byte; a
    # one-row-group file otherwise runs it on one core no matter how
    # many split descriptors the scan shows (scale.needs_rebalance,
    # PERF §80) — rebalance the narrow (id, text) rows first
    from mirabelle_spark.scale import ensure_parallelism

    df = ensure_parallelism(df)
    oov = F.lit(int(model["oov_e9"])).cast("long")
    pairs = _pair_structs(text_col)
    n_pairs = F.size(pairs).cast("long").alias("n_bigrams")

    if strategy == "fold":
        return df.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            n_pairs,
            _fold_bits(pairs, model).alias("bits_e9"),
        )

    spark = df.sparkSession
    bg = model_table(
        spark, model["bigrams"], "__ba string, __bb string, __cb long"
    )
    ug = model_table(spark, model["unigrams"], "__uw string, __cu long")
    # ONE pass (r16, same rewrite as lm3_bits): explode_outer keeps
    # zero-pair docs as a single null-pair row instead of a second
    # scan + union (_toks coalesces NULL text to the empty array, so
    # ``pairs`` is never null); null probe keys match no model row
    # and the aggregate counts/sums only real rows.
    exploded = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode_outer(pairs).alias("__p__"),
    ).select(
        id_col, *keep_cols,
        F.col("__p__.a").alias("__a__"), F.col("__p__.b").alias("__b__"),
    )
    costed = (
        exploded.join(
            F.broadcast(bg),
            (F.col("__a__") == F.col("__ba"))
            & (F.col("__b__") == F.col("__bb")),
            "left",
        )
        .join(F.broadcast(ug), F.col("__b__") == F.col("__uw"), "left")
        .select(
            id_col, *keep_cols,
            F.col("__a__").isNotNull().alias("__real__"),
            F.coalesce("__cb", "__cu", oov).alias("__c__"),
        )
    )
    return costed.groupBy(id_col, *keep_cols).agg(
        F.sum(F.col("__real__").cast("long")).alias("n_bigrams"),
        F.sum(
            F.when(F.col("__real__"), F.col("__c__")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("bits_e9"),
    )


def lm_quality(
    df: DataFrame,
    model: dict,
    max_bits_per_token: float,
    min_bigrams: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
    validate: bool = False,
) -> DataFrame:
    """The CCNet-style perplexity GATE: keep documents whose LM cost
    is at most ``max_bits_per_token`` (perplexity ≤ 2^t) and that
    carry at least ``min_bigrams`` pairs (the statistic is noise on
    shorter docs). The threshold compare is EXACT integer
    cross-multiplication — ``bits_e9 ≤ t·1e9 · n`` — no division,
    no float, so the survivor set is bit-stable across engines.
    Same plan as :func:`lm_bits` plus one filter (keep_cols ride
    the projection — no join back).

    CAVEAT (ADVICE r13, hardened r15): the bigram conditionals are
    unsmoothed MLE; a deterministic pair (``c == ca``) is now
    FLOORED at 1 micro-bit by the trainer, so pinned costs are
    strictly positive — but a one-pair spam document still scores
    ~1e-9 bits/token and passes any practical threshold. The
    trigram artifact (:mod:`~mirabelle_spark.pipeline.lm3`, r14)
    closes this with add-one-smoothed conditionals that price such
    spam at real bits; it is the DSL ``{"perplexity": "trained"}``
    default since r15 (this bigram path is the opt-in
    ``"trained2"``). Prefer lm3 for adversarial corpora."""
    t_e9 = round(max_bits_per_token * 1_000_000_000)
    scored = lm_bits(
        df, model, text_col=text_col, id_col=id_col, keep_cols=keep_cols,
        validate=validate,
    )
    return scored.filter(
        (F.col("n_bigrams") >= min_bigrams)
        & (F.col("bits_e9") <= F.lit(t_e9) * F.col("n_bigrams"))
    )
