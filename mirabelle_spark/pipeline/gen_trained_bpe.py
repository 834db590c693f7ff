"""Regenerate :mod:`mirabelle_spark.pipeline.bpe_merges_trained`.

Run after any :func:`mirabelle_spark.pipeline.text.bpe_train` change:

    python -m mirabelle_spark.pipeline.gen_trained_bpe

Deterministic and partitioning-independent (pytest-pinned), so
reproducible anywhere the sf0.01 testdata exists; the pin test fails
loudly if this module and a fresh training run diverge.
"""

from __future__ import annotations

import os


def regenerate(out_path: str | None = None) -> list[tuple[str, str]]:
    from mirabelle_spark.pipeline import text
    from mirabelle_spark.pipeline.bpe_merges_trained import (
        TRAIN_MIN_WEIGHT, TRAIN_N_MERGES, TRAIN_SF_DIR,
    )
    from mirabelle_spark.queries_pipeline import docs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_bpe")
    merges = text.bpe_train(
        docs(spark, TRAIN_SF_DIR),
        n_merges=TRAIN_N_MERGES,
        min_weight=TRAIN_MIN_WEIGHT,
    )
    if out_path:
        import mirabelle_spark.pipeline.bpe_merges_trained as mod

        src = open(mod.__file__).read()
        head, _, _ = src.partition("BPE_MERGES = [")
        rows = ",\n    ".join(repr(m) for m in merges)
        body = (
            "BPE_MERGES = [\n    " + rows + "\n]\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_N_MERGES = {TRAIN_N_MERGES}\n"
            f"TRAIN_MIN_WEIGHT = {TRAIN_MIN_WEIGHT}\n"
        )
        with open(out_path, "w") as f:
            f.write(head + body)
    return merges


if __name__ == "__main__":
    import mirabelle_spark.pipeline.bpe_merges_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
