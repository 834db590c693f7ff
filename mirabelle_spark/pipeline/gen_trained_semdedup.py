"""Regenerate :mod:`mirabelle_spark.pipeline.semdedup_centroids_trained`.

Run after any :func:`mirabelle_spark.pipeline.ann.train_ivf` change:

    python -m mirabelle_spark.pipeline.gen_trained_semdedup

The trainer is deterministic and partitioning-independent
(pytest-pinned), so this is reproducible on any machine holding the
same sf0.1 testdata; the pin test fails loudly if the module on
disk and a fresh training run ever diverge.
"""

from __future__ import annotations

import os


def regenerate(out_path: str | None = None) -> list[list[float]]:
    from mirabelle_spark.pipeline import ann
    from mirabelle_spark.pipeline.semdedup_centroids_trained import (
        TRAIN_ITERS, TRAIN_NLIST, TRAIN_SF_DIR,
    )
    from mirabelle_spark.queries_pipeline import embs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_semdedup")
    cents = ann.train_ivf(
        embs(spark, TRAIN_SF_DIR), nlist=TRAIN_NLIST, iters=TRAIN_ITERS
    )
    if out_path:
        import mirabelle_spark.pipeline.semdedup_centroids_trained as mod

        src = open(mod.__file__).read()
        head, _, _ = src.partition("TRAINED_SEMDEDUP_CENTROIDS = [")
        rows = ",\n    ".join(
            "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in cents
        )
        body = (
            "TRAINED_SEMDEDUP_CENTROIDS = [\n    " + rows + "\n]\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_NLIST = {TRAIN_NLIST}\n"
            f"TRAIN_ITERS = {TRAIN_ITERS}\n"
        )
        with open(out_path, "w") as f:
            f.write(head + body)
    return cents


if __name__ == "__main__":
    import mirabelle_spark.pipeline.semdedup_centroids_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
