"""Scalar-function query families (SURVEY.md §2.8) — modules register on import."""

from python_etl_sample_spark.functions import scalar  # noqa: F401
