"""Deterministic synthetic fixtures (seed-pure, no external data)."""

from xlink_spark.fixtures.generate import SyntheticCorpus, generate_corpus

__all__ = ["SyntheticCorpus", "generate_corpus"]
