"""Streaming semantics (SURVEY.md §2.9) — modules register on import."""

from python_etl_sample_spark.streaming import batch_semantics, demo  # noqa: F401
