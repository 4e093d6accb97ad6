"""Driver-facing API: entry / queries / oracle_sql (__spark_entry__ contract)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from python_etl_sample_spark.registry import REGISTRY, load_all_operators, ordered_registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2 op #23): TPC-H-Q1-style pricing summary."""
    load_all_operators()
    return REGISTRY["agg_groupby"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all_operators()
    return {name: spec.fn for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    load_all_operators()
    return {
        name: spec.oracle
        for name, spec in ordered_registry().items()
        if spec.oracle is not None
    }
