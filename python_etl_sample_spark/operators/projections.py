"""Projections, derived columns, filters, predicates — SURVEY.md §2.2
ops #7-11 (prov. C: the heart of the reference's ETL transform step).

Determinism: per-row double arithmetic (x*(1-y)) is IEEE-deterministic
and bit-identical across engines, so no rounding is needed here; only
aggregated floats need the decimal treatment (see functions/determinism).

Scale: every filter is a raw-column predicate, so it pushes down to the
parquet scan (PushedFilters) and skips row groups at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "project_derive",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_quantity AS BIGINT) AS qty_int,
      l_extendedprice * (1 - l_discount) AS revenue,
      l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      l_returnflag AS flag
    FROM lineitem
    """,
)
def project_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#7 derived columns: arithmetic, type-cast, rename."""
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charge"),
        F.col("l_returnflag").alias("flag"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45
      AND l_returnflag IN ('A', 'R')
      AND (l_discount <= 0.03 OR l_tax > 0.05)
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#8 conjunctive/disjunctive predicates with BETWEEN and IN."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 45)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") <= 0.03) | (F.col("l_tax") > 0.05))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "filter_null",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS maybe_price
      FROM orders
    )
    SELECT o_orderkey,
           COALESCE(maybe_price, -1.0) AS price_filled,
           (maybe_price IS NULL) AS was_null
    FROM t
    WHERE maybe_price IS NULL OR maybe_price > 100.0
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#9 null handling: isNull / coalesce / fill. The fixtures carry no
    NULLs (FIXTURES.md), so nulls are derived then handled."""
    o = table(spark, sf_dir, "orders")
    maybe = F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("double")).otherwise(
        F.col("o_totalprice")
    )
    t = o.select("o_orderkey", maybe.alias("maybe_price"))
    return t.filter(F.col("maybe_price").isNull() | (F.col("maybe_price") > 100.0)).select(
        "o_orderkey",
        F.coalesce(F.col("maybe_price"), F.lit(-1.0)).alias("price_filled"),
        F.col("maybe_price").isNull().alias("was_null"),
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%a%' AND p_type NOT LIKE '%x%'
      AND regexp_matches(p_name, '[aeiou]')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#10 pattern predicates: LIKE, NOT LIKE, regexp."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%a%")
        & ~F.col("p_type").like("%x%")
        & F.col("p_name").rlike("[aeiou]")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "case_when",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2 ELSE 0 END AS seg_code
    FROM customer
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#11 conditional expressions, searched + simple CASE."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
        .when(F.col("c_mktsegment") == "BUILDING", 2)
        .otherwise(0)
        .alias("seg_code"),
    )
