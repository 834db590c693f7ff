"""Regenerate :mod:`mirabelle_spark.pipeline.trigram_lm_trained`.

Run after any :func:`mirabelle_spark.pipeline.lm3.train_trigram_lm`
change:

    python -m mirabelle_spark.pipeline.gen_trained_lm3

Deterministic and partitioning-independent (every count is an exact
BIGINT aggregate, top-K ties break lexicographically, log2 happens
once on the driver over the K collected rows), so reproducible
anywhere the sf0.1 testdata exists; the pin test fails loudly if
this module and a fresh training run diverge.
"""

from __future__ import annotations

import os

HEADER = '''"""Pruned TRIGRAM LM TRAINED by
:func:`mirabelle_spark.pipeline.lm3.train_trigram_lm` (the CCNet
filter one backoff level closer to Wenzek et al. 2020's pruned
KenLM than the bigram artifact) on the sf0.1 ``documents`` corpus.
Costs are INTEGER micro-bits (``round(-log2(p) * 1e9)``) with
penalized-MLE smoothing — every cost strictly positive, so no
degenerate document scores 0 bits/token (ADVICE r13). Same
train-once lifecycle as bigram_lm_trained;
``tests/test_pipeline.py::test_trained_trigram_lm_match_pinned``
re-runs the trainer and asserts exact equality. Regenerate after a
trainer change with:

    python -m mirabelle_spark.pipeline.gen_trained_lm3
"""

'''


def regenerate(out_path: str | None = None):
    from mirabelle_spark.pipeline import lm3
    from mirabelle_spark.pipeline.trigram_lm_trained import (
        TRAIN_BACKOFF_BITS, TRAIN_SF_DIR, TRAIN_TOP_BIGRAMS,
        TRAIN_TOP_TRIGRAMS, TRAIN_TOP_UNIGRAMS,
    )
    from mirabelle_spark.queries_pipeline import docs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_lm3")
    m = lm3.train_trigram_lm(
        docs(spark, TRAIN_SF_DIR),
        top_trigrams=TRAIN_TOP_TRIGRAMS,
        top_bigrams=TRAIN_TOP_BIGRAMS,
        top_unigrams=TRAIN_TOP_UNIGRAMS,
        backoff_bits=TRAIN_BACKOFF_BITS,
    )
    if out_path:
        trows = ",\n    ".join(repr(x) for x in m["trigrams"])
        brows = ",\n    ".join(repr(x) for x in m["bigrams"])
        urows = ",\n    ".join(repr(x) for x in m["unigrams"])
        body = (
            "LM3_TRIGRAMS = [\n    " + trows + "\n]\n\n"
            "LM3_BIGRAMS = [\n    " + brows + "\n]\n\n"
            "LM3_UNIGRAMS = [\n    " + urows + "\n]\n\n"
            f"LM3_OOV_E9 = {m['oov_e9']}\n"
            f"LM3_N_TOKENS = {m['n_tokens']}\n"
            f"LM3_BACKOFF_E9 = {m['backoff_e9']}\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_TOP_TRIGRAMS = {TRAIN_TOP_TRIGRAMS}\n"
            f"TRAIN_TOP_BIGRAMS = {TRAIN_TOP_BIGRAMS}\n"
            f"TRAIN_TOP_UNIGRAMS = {TRAIN_TOP_UNIGRAMS}\n"
            f"TRAIN_BACKOFF_BITS = {TRAIN_BACKOFF_BITS!r}\n\n"
            "TRAINED_LM3 = {\n"
            '    "trigrams": LM3_TRIGRAMS,\n'
            '    "bigrams": LM3_BIGRAMS,\n'
            '    "unigrams": LM3_UNIGRAMS,\n'
            '    "oov_e9": LM3_OOV_E9,\n'
            '    "n_tokens": LM3_N_TOKENS,\n'
            '    "backoff_e9": LM3_BACKOFF_E9,\n'
            "}\n"
        )
        with open(out_path, "w") as f:
            f.write(HEADER + body)
    return m


if __name__ == "__main__":
    import mirabelle_spark.pipeline.trigram_lm_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
