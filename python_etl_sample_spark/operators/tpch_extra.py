"""TPC-H-analog reporting queries round 4 (complementing the q_* set in
analytics.py): customer order-count distribution (Q13), promo revenue
share (Q14), and small-quantity revenue leakage (Q17).

These are the composed-operator benchmarks — outer joins that keep
zero-groups, conditional revenue ratios, and correlated per-group
thresholds — that exercise several engine features per query, the way
real report workloads do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum, dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "q_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: the distribution of customers by how many
    orders they placed — INCLUDING zero-order customers, which is the
    whole point: the left outer join keeps them and COUNT(o_orderkey)
    (not COUNT(*)) counts them as 0.

    Plan: one shuffle join on custkey, one map-side-combined count,
    then a second tiny count over ≤ max-orders-per-customer distinct
    values. Q13 is the canonical "outer join you cannot rewrite to
    inner" — the zero groups carry the business signal."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_promo_share",
    oracle=f"""
    SELECT ROUND(
             100.0 * {dsum_sql("CASE WHEN p.p_type = 'PROMO' "
                              "THEN l.l_extendedprice * (1 - l.l_discount) "
                              "ELSE 0 END")}
             / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')}, 6)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: the percentage of discounted revenue earned by
    PROMO-type parts — a conditional-numerator / total-denominator
    ratio computed in ONE pass over the join.

    Both sums go through decimal(28,6) (the revenue product is exactly
    6-decimal, see determinism.py), so the ratio divides two exact
    numbers. Plan: part is the small side → broadcast hash join, no
    shuffle of lineitem; the two conditional sums share one aggregate."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(28,6)"
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(promo.cast(dec)).cast("double")
            / F.sum(rev.cast(dec)).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@query(
    "q_small_quantity_revenue",
    oracle=f"""
    WITH thresh AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                    / COUNT(*)) AS tq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND({dsum_sql('l.l_extendedprice')} / 7.0, 6) AS avg_yearly
    FROM lineitem l JOIN thresh t ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.tq
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: revenue locked in small-quantity orders —
    lineitems whose quantity is below 20% of their part's average
    quantity, summed and annualized (/7 for the 7-year fixture span).

    The correlated per-part threshold decorrelates to a groupBy + join
    (the rewrite Catalyst applies to the subquery form — subqueries.py
    demonstrates the Catalyst path; this is the hand-decorrelated twin).
    AVG(l_quantity) is an exact-count division of an exact integer sum,
    so the 0.2·avg threshold and the < compare are bit-identical in both
    engines. Plan: two passes over lineitem (threshold, probe) joined on
    partkey — the threshold side is small (one row per part) and
    broadcastable at fixture scale; at 100 TB both sides hash-partition
    on partkey and the exchange is reused."""
    li = table(spark, sf_dir, "lineitem")
    thresh = li.groupBy("l_partkey").agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("bigint")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("tq")
    )
    return (
        li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("tq"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast(
                    "double"
                )
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@query(
    "q_national_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT r.r_name AS region,
             CAST(date_part('year', o.o_orderdate) AS INTEGER) AS year,
             l.l_extendedprice * (1 - l.l_discount) AS amount
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    ), agg AS (
      SELECT region, year, {dsum_sql('amount')} AS rev
      FROM rev GROUP BY region, year
    )
    SELECT region, year,
           ROUND(rev, 6) AS revenue,
           ROUND(rev / SUM(rev) OVER (PARTITION BY year), 6) AS mkt_share
    FROM agg
    """,
)
def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: each region's share of global discounted
    revenue per year — the five-table star join rolled up to a
    share-of-total window.

    Plan shape: lineitem (the fact) joins orders on orderkey (the one
    big shuffle), then every remaining dimension — customer, nation,
    region — broadcasts; the share window runs over the ≤35-row
    (region, year) aggregate. Revenue sums are exact decimals; the
    share is one double division of two exact sums, rounded. At 100 TB
    the orders join co-partitions (or buckets) on orderkey and nothing
    else shuffles at all."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").alias("year"),
            amount.alias("amount"),
        )
    )
    agg = rev.groupBy("region", "year").agg(dsum("amount").alias("rev"))
    w = Window.partitionBy("year")
    return agg.select(
        "region",
        "year",
        F.round(F.col("rev"), 6).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("mkt_share"),
    )
