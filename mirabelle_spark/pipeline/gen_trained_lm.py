"""Regenerate :mod:`mirabelle_spark.pipeline.bigram_lm_trained`.

Run after any :func:`mirabelle_spark.pipeline.lm.train_bigram_lm`
change:

    python -m mirabelle_spark.pipeline.gen_trained_lm

Deterministic and partitioning-independent (every count is an exact
BIGINT aggregate, top-K ties break lexicographically, log2 happens
once on the driver over the K collected rows), so reproducible
anywhere the sf0.1 testdata exists; the pin test fails loudly if
this module and a fresh training run diverge.
"""

from __future__ import annotations

import os

HEADER = '''"""Pruned bigram LM TRAINED by
:func:`mirabelle_spark.pipeline.lm.train_bigram_lm` (the CCNet-style
perplexity filter's model: Wenzek et al. 2020 score documents with a
pruned KenLM; this is the bigram form with penalized unigram backoff)
on the sf0.1 ``documents`` corpus. Costs are INTEGER micro-bits
(``round(-log2(p) * 1e9)``) so the per-document sum is exact,
order-free, and bit-identical between the Spark fold and the DuckDB
oracle join. Same train-once lifecycle as logreg_quality_trained /
dsir_logratios_trained; ``tests/test_pipeline.py::
test_trained_bigram_lm_match_pinned`` re-runs the trainer and asserts
exact equality. Regenerate after a trainer change with:

    python -m mirabelle_spark.pipeline.gen_trained_lm
"""

'''


def regenerate(out_path: str | None = None):
    from mirabelle_spark.pipeline import lm
    from mirabelle_spark.pipeline.bigram_lm_trained import (
        TRAIN_BACKOFF_BITS, TRAIN_SF_DIR, TRAIN_TOP_BIGRAMS,
        TRAIN_TOP_UNIGRAMS,
    )
    from mirabelle_spark.queries_pipeline import docs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_lm")
    m = lm.train_bigram_lm(
        docs(spark, TRAIN_SF_DIR),
        top_bigrams=TRAIN_TOP_BIGRAMS,
        top_unigrams=TRAIN_TOP_UNIGRAMS,
        backoff_bits=TRAIN_BACKOFF_BITS,
    )
    if out_path:
        brows = ",\n    ".join(repr(x) for x in m["bigrams"])
        urows = ",\n    ".join(repr(x) for x in m["unigrams"])
        body = (
            "LM_BIGRAMS = [\n    " + brows + "\n]\n\n"
            "LM_UNIGRAMS = [\n    " + urows + "\n]\n\n"
            f"LM_OOV_E9 = {m['oov_e9']}\n"
            f"LM_N_TOKENS = {m['n_tokens']}\n"
            f"LM_BACKOFF_E9 = {m['backoff_e9']}\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_TOP_BIGRAMS = {TRAIN_TOP_BIGRAMS}\n"
            f"TRAIN_TOP_UNIGRAMS = {TRAIN_TOP_UNIGRAMS}\n"
            f"TRAIN_BACKOFF_BITS = {TRAIN_BACKOFF_BITS!r}\n\n"
            "TRAINED_LM = {\n"
            '    "bigrams": LM_BIGRAMS,\n'
            '    "unigrams": LM_UNIGRAMS,\n'
            '    "oov_e9": LM_OOV_E9,\n'
            '    "n_tokens": LM_N_TOKENS,\n'
            '    "backoff_e9": LM_BACKOFF_E9,\n'
            "}\n"
        )
        with open(out_path, "w") as f:
            f.write(HEADER + body)
    return m


if __name__ == "__main__":
    import mirabelle_spark.pipeline.bigram_lm_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
