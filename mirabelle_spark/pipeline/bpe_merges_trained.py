"""BPE merges TRAINED by :func:`mirabelle_spark.pipeline.text.bpe_train`
(the engine's own relational trainer — canonical greedy Sennrich
merges, deterministic argmax, partitioning-independent) on the
sf0.01 ``documents`` corpus — 48 merges, min_weight=2. Same
train-once lifecycle as ivf_centroids_trained / pq_codebooks_trained:
pinned as literals so the Spark query and the DuckDB oracle apply
bit-identical replace chains; ``tests/test_pipeline.py::
test_trained_bpe_merges_match_pinned`` re-runs the trainer and
asserts byte equality. Regenerate after a trainer change with:

    python -m mirabelle_spark.pipeline.gen_trained_bpe
"""

BPE_MERGES = [
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('s', 't'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    ('a', 'r'),
    ('p', 'ar'),
    ('j', 'o'),
    ('jo', 'in'),
    ('a', 's'),
    ('as', 'h'),
    ('h', 'ash'),
    ('r', 'ow'),
    ('at', 'c'),
    ('atc', 'h'),
    ('b', 'atch'),
    ('a', 'n'),
    ('c', 'an'),
    ('s', 'can'),
    ('c', 'o'),
    ('c', 'u'),
    ('co', 'lu'),
    ('colu', 'm'),
    ('colum', 'n'),
    ('cu', 'st'),
    ('cust', 'o'),
    ('custo', 'mer'),
    ('f', 'i'),
    ('fi', 'l'),
    ('fil', 't'),
    ('filt', 'er'),
    ('a', 'l'),
    ('al', 'l'),
    ('m', 'all'),
    ('s', 'mall'),
    ('g', 'e'),
    ('l', 'ow'),
    ('mer', 'ge'),
    ('s', 'low'),
    ('c', 't'),
    ('ct', 'or'),
    ('d', 'er'),
    ('e', 'ctor'),
    ('or', 'der'),
    ('v', 'ector')
]

TRAIN_SF_DIR = "/root/testdata/sf0.01"
TRAIN_N_MERGES = 48
TRAIN_MIN_WEIGHT = 2
