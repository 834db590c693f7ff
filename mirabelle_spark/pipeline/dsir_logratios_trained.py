"""DSIR bucket log-ratio weights TRAINED by
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

TRAINED_DSIR_W = [
    -0.023766998945769835,
    -0.04973631626307773,
    -0.0339078072919996,
    0.835939779791472,
    -0.03549559514244871,
    0.835939779791472,
    0.835939779791472,
    -0.051527255629229884,
    0.835939779791472,
    0.011353695338695236,
    0.02238538212546093,
    0.835939779791472,
    -0.0051434745955454275,
    -0.03786565671561126,
    -0.056100949859224425,
    0.835939779791472,
    0.835939779791472,
    -0.030333982054738584,
    -0.03334490970675352,
    -0.015919091923295436,
    0.06055450099455317,
    0.835939779791472,
    0.835939779791472,
    0.06274989155798938,
    0.0876294874406125,
    -0.010250047241370908,
    -0.026694083428302484,
    0.835939779791472,
    0.835939779791472,
    -0.007833226752297584,
    -0.06200181341448818,
    0.08118101928069255
]

TRAIN_SF_DIR = "/root/testdata/sf0.01"
TRAIN_DIM = 32
TRAIN_TARGET_LANG = "en"
