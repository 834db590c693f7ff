"""Regenerate :mod:`mirabelle_spark.pipeline.pq_codebooks_trained`.

Run after any :func:`mirabelle_spark.pipeline.ann.train_pq` change:

    python -m mirabelle_spark.pipeline.gen_trained_pq

Deterministic and partitioning-independent (pytest-pinned), so
reproducible anywhere the sf0.01 testdata exists; the pin test fails
loudly if this module and a fresh training run diverge.
"""

from __future__ import annotations

import os


def regenerate(out_path: str | None = None) -> list[list[list[float]]]:
    from mirabelle_spark.pipeline import ann
    from mirabelle_spark.pipeline.pq_codebooks_trained import (
        TRAIN_ITERS, TRAIN_K, TRAIN_M, TRAIN_SF_DIR,
    )
    from mirabelle_spark.queries_pipeline import embs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_pq")
    books = ann.train_pq(
        embs(spark, TRAIN_SF_DIR), m=TRAIN_M, k=TRAIN_K, iters=TRAIN_ITERS
    )
    if out_path:
        import mirabelle_spark.pipeline.pq_codebooks_trained as mod

        src = open(mod.__file__).read()
        head, _, _ = src.partition("TRAINED_PQ_CODEBOOKS = [")
        rows = ",\n    ".join(
            "[\n        "
            + ",\n        ".join(
                "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in b
            )
            + "\n    ]"
            for b in books
        )
        body = (
            "TRAINED_PQ_CODEBOOKS = [\n    " + rows + "\n]\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_M = {TRAIN_M}\nTRAIN_K = {TRAIN_K}\n"
            f"TRAIN_ITERS = {TRAIN_ITERS}\n"
        )
        with open(out_path, "w") as f:
            f.write(head + body)
    return books


if __name__ == "__main__":
    import mirabelle_spark.pipeline.pq_codebooks_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
