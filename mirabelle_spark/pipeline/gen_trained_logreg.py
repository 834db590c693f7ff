"""Regenerate :mod:`mirabelle_spark.pipeline.logreg_quality_trained`.

Run after any :func:`mirabelle_spark.pipeline.text.train_quality_logreg`
change:

    python -m mirabelle_spark.pipeline.gen_trained_logreg

Deterministic and partitioning-independent (pytest-pinned), so
reproducible anywhere the sf0.01 testdata exists; the pin test fails
loudly if this module and a fresh training run diverge.
"""

from __future__ import annotations

import os

HEADER = '''"""Quality-classifier weights TRAINED by
:func:`mirabelle_spark.pipeline.text.train_quality_logreg` (the
engine's own relational full-batch logistic regression — decimal-
exact gradient sums, driver-held weight vector, bit-reproducible
under any repartitioning) on the sf0.01 ``documents`` corpus,
weak-labeled by the clean-corpus Gopher rule subset (the fastText-
distillation pattern). Same train-once lifecycle as
ivf_centroids_trained / bpe_merges_trained: pinned as literals so
the Spark query and the DuckDB oracle apply the bit-identical
left-associated dot product; ``tests/test_pipeline.py::
test_trained_logreg_match_pinned`` re-runs the trainer and asserts
exact equality. Regenerate after a trainer change with:

    python -m mirabelle_spark.pipeline.gen_trained_logreg
"""

'''


def regenerate(out_path: str | None = None):
    from mirabelle_spark.pipeline import text
    from mirabelle_spark.pipeline.logreg_quality_trained import (
        TRAIN_DIM, TRAIN_ITERS, TRAIN_LR, TRAIN_SF_DIR,
    )
    from mirabelle_spark.queries_pipeline import docs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_logreg")
    w, b = text.train_quality_logreg(
        docs(spark, TRAIN_SF_DIR),
        dim=TRAIN_DIM,
        iters=TRAIN_ITERS,
        lr=TRAIN_LR,
    )
    if out_path:
        rows = ",\n    ".join(repr(x) for x in w)
        body = (
            "TRAINED_LOGREG_W = [\n    " + rows + "\n]\n\n"
            f"TRAINED_LOGREG_B = {b!r}\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_DIM = {TRAIN_DIM}\n"
            f"TRAIN_ITERS = {TRAIN_ITERS}\n"
            f"TRAIN_LR = {TRAIN_LR}\n"
        )
        with open(out_path, "w") as f:
            f.write(HEADER + body)
    return w, b


if __name__ == "__main__":
    import mirabelle_spark.pipeline.logreg_quality_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
