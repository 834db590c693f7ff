"""Regenerate :mod:`mirabelle_spark.pipeline.pca_component_trained`.

Run after any :func:`mirabelle_spark.pipeline.ann.train_top_component`
change:

    python -m mirabelle_spark.pipeline.gen_trained_pca

Deterministic and partitioning-independent (pytest-pinned), so
reproducible anywhere the sf0.01 testdata exists; the pin test fails
loudly if this module and a fresh training run diverge.
"""

from __future__ import annotations

import os


def regenerate(out_path: str | None = None) -> list[float]:
    from mirabelle_spark.pipeline import ann
    from mirabelle_spark.pipeline.pca_component_trained import (
        TRAIN_DIM, TRAIN_ITERS, TRAIN_SEED, TRAIN_SF_DIR,
    )
    from mirabelle_spark.queries_pipeline import embs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_pca")
    v = ann.train_top_component(
        embs(spark, TRAIN_SF_DIR),
        dim=TRAIN_DIM,
        iters=TRAIN_ITERS,
        seed=TRAIN_SEED,
    )
    if out_path:
        import mirabelle_spark.pipeline.pca_component_trained as mod

        src = open(mod.__file__).read()
        head, _, _ = src.partition("PCA_COMPONENT = [")
        rows = ",\n    ".join(repr(float(x)) for x in v)
        body = (
            "PCA_COMPONENT = [\n    " + rows + "\n]\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_DIM = {TRAIN_DIM}\nTRAIN_ITERS = {TRAIN_ITERS}\n"
            f"TRAIN_SEED = {TRAIN_SEED}\n"
        )
        with open(out_path, "w") as f:
            f.write(head + body)
    return v


if __name__ == "__main__":
    import mirabelle_spark.pipeline.pca_component_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
