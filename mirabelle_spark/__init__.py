"""mirabelle_spark — a PySpark-native event analytics engine.

A from-scratch rebuild of the capabilities of appclacks/mirabelle
(an event stream processing engine in the Riemann lineage) on top of
Apache Spark: DataFrame/SQL for the operator library, Structured
Streaming for the push path, Catalyst/Tungsten as the optimizer and
execution engine.

Layout
------
- ``conditions``   — the condition mini-language → Catalyst ``Column``
- ``operators``    — one DataFrame transform per reference action
- ``plans``        — action-tree DSL → DataFrame pipeline builder
- ``streaming``    — Structured Streaming twins (watermark, state)
- ``pipeline``     — large-scale training-data ops (dedup, ANN, text)

Reference parity citations point into the read-only snapshot at
``/root/reference`` (mirabelle 0.14.0), e.g. ``action.clj:2387``.
"""

__version__ = "0.1.0"

from mirabelle_spark.conditions import compile_condition  # noqa: F401
