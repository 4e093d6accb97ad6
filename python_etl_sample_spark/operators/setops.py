"""Set operations — SURVEY.md §2.7 ops #42-45 (bag vs set semantics
declared explicitly per operator)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


def _rich(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_mktsegment")
    )


def _building(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_mktsegment")
    )


_RICH_SQL = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 7000"
_BUILDING_SQL = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'"


@query("set_union_all", oracle=f"{_RICH_SQL} UNION ALL {_BUILDING_SQL}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#42 bag union — overlapping rows appear twice."""
    return _rich(spark, sf_dir).unionByName(_building(spark, sf_dir))


@query("set_union_distinct", oracle=f"{_RICH_SQL} UNION {_BUILDING_SQL}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#43 set union — distinct rows only."""
    return _rich(spark, sf_dir).unionByName(_building(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#44 set intersect: nations with both indebted customers and any supplier."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#45 bag difference (exceptAll): customer nation multiset minus
    one occurrence per supplier nation."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)
