"""DSL → DataFrame pipeline builder (the query-language layer)."""

from mirabelle_spark.plans.builder import build_stream, compile_stream  # noqa: F401

__all__ = ["build_stream", "compile_stream"]
