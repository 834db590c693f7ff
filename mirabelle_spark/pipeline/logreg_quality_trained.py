"""Quality-classifier weights TRAINED by
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

TRAINED_LOGREG_W = [
    -2.4002788056706414,
    0.4132311473739733,
    -0.7232837545465207,
    5.202463738305975,
    3.6051081412109305,
    0.0,
    0.0,
    -2.974075215511475,
    -3.944916255188784,
    -0.4071011444552069,
    -3.5927058508234286,
    0.0,
    -6.970303367610576,
    2.8801514553521024,
    5.96588555110364,
    6.953786843679623,
    39.76429536020518,
    0.5277327497365438,
    -0.001357095053277118,
    0.0
]

TRAINED_LOGREG_B = -11.464787241556103

TRAIN_SF_DIR = "/root/testdata/sf0.01"
TRAIN_DIM = 16
TRAIN_ITERS = 80
TRAIN_LR = 2.0
