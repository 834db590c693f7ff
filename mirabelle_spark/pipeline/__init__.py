"""Large-scale training-data pipeline operators.

Beyond reference parity (SURVEY §2): the operations a 100 TB
training-data pipeline needs, built Spark-first —

- :mod:`.dedup`      — exact, MinHash-LSH, SimHash, n-gram Jaccard
- :mod:`.ann`        — similarity search over embedding columns
- :mod:`.text`       — lang-id, quality scoring, tokens, fingerprints
- :mod:`.lm`         — trained pruned-bigram perplexity filter (CCNet)
- :mod:`.multimodal` — binary media columns: schema + Arrow plumbing

Design rule: no all-pairs joins — every near-dup / similarity path
goes through a bucketing stage (LSH bands, hyperplane buckets) so
the join is a hash-partitioned equi-join on bucket keys.
"""

from mirabelle_spark.pipeline import (  # noqa: F401
    ann, dedup, lm, multimodal, text,
)

__all__ = ["ann", "dedup", "lm", "multimodal", "text"]
