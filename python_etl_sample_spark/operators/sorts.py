"""Sorts, limits, top-k — SURVEY.md §2.6 ops #39-41.

The driver's value-hash is order-insensitive, so sortedness itself is
materialized as a row_number column (a global rank), making the *order*
part of the hashed values.

Scale: ``orderBy().limit(k)`` fuses to TakeOrderedAndProject — each
task keeps a k-heap, the driver merges k×tasks rows; no global sort.
The global row_number in #39 uses the range-partitioned exact total
order (functions/total_order.py), so no operator here is single-task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "sort_multi",
    oracle="""
    WITH t AS (
      SELECT s_suppkey, s_name, s_nationkey,
             CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS bal
      FROM supplier
    )
    SELECT s_suppkey, s_name, bal,
           ROW_NUMBER() OVER (ORDER BY bal DESC NULLS LAST, s_nationkey ASC, s_suppkey ASC) AS pos
    FROM t
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#39 multi-key sort with explicit nulls placement, materialized as
    a global position column so the hash checks the ordering.

    The position comes from the range-partitioned exact total order
    (functions/total_order.py) — one range shuffle + per-partition
    row_number + broadcast offsets — not a partitionless window, which
    would funnel every row through a single task."""
    s = table(spark, sf_dir, "supplier")
    t = s.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.when(F.col("s_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("s_acctbal"))
        .alias("bal"),
    )
    ranked = attach_global_order(
        t,
        [F.desc_nulls_last("bal"), F.asc("s_nationkey"), F.asc("s_suppkey")],
        rn="pos",
    )
    return ranked.select("s_suppkey", "s_name", "bal", "pos")


@query(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#40 global top-10 by price (TakeOrderedAndProject; unique-key
    tie-break makes the selected set deterministic)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#41 top-3 orders per market segment (window + filter — the
    shuffle-once per-group top-k pattern)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
