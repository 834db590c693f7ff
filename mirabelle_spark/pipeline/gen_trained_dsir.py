"""Regenerate :mod:`mirabelle_spark.pipeline.dsir_logratios_trained`.

Run after any :func:`mirabelle_spark.pipeline.sampling.train_dsir`
change:

    python -m mirabelle_spark.pipeline.gen_trained_dsir

Deterministic and partitioning-independent (the trainer's only
floating step is ln over exact integer counts, taken once on the
driver), so reproducible anywhere the sf0.01 testdata exists; the
pin test fails loudly if this module and a fresh training run
diverge.
"""

from __future__ import annotations

import os

HEADER = '''"""DSIR bucket log-ratio weights TRAINED by
:func:`mirabelle_spark.pipeline.sampling.train_dsir` (Xie et al.
2023: importance weights from hashed-unigram counts — one exact
integer aggregate over the token stream, ln taken once on the
driver) on the sf0.01 ``documents`` corpus with the English rows as
the target domain. Same train-once lifecycle as
ivf_centroids_trained / logreg_quality_trained: pinned as literals
so the Spark query and the DuckDB oracle apply the bit-identical
left-associated dot product; ``tests/test_pipeline.py::
test_trained_dsir_match_pinned`` re-runs the trainer and asserts
exact equality. Regenerate after a trainer change with:

    python -m mirabelle_spark.pipeline.gen_trained_dsir
"""

'''


def regenerate(out_path: str | None = None):
    from pyspark.sql import functions as F

    from mirabelle_spark.pipeline import sampling
    from mirabelle_spark.pipeline.dsir_logratios_trained import (
        TRAIN_DIM, TRAIN_SF_DIR, TRAIN_TARGET_LANG,
    )
    from mirabelle_spark.queries_pipeline import docs
    from mirabelle_spark.session import get_spark

    spark = get_spark("gen_trained_dsir")
    w = sampling.train_dsir(
        docs(spark, TRAIN_SF_DIR),
        target=F.col("lang") == TRAIN_TARGET_LANG,
        dim=TRAIN_DIM,
    )
    if out_path:
        rows = ",\n    ".join(repr(x) for x in w)
        body = (
            "TRAINED_DSIR_W = [\n    " + rows + "\n]\n\n"
            f'TRAIN_SF_DIR = "{TRAIN_SF_DIR}"\n'
            f"TRAIN_DIM = {TRAIN_DIM}\n"
            f'TRAIN_TARGET_LANG = "{TRAIN_TARGET_LANG}"\n'
        )
        with open(out_path, "w") as f:
            f.write(HEADER + body)
    return w


if __name__ == "__main__":
    import mirabelle_spark.pipeline.dsir_logratios_trained as mod

    regenerate(os.path.abspath(mod.__file__))
    print(f"rewrote {mod.__file__}")
