"""Window functions — SURVEY.md §2.5 ops #33-38.

Determinism: every ORDER BY inside a window carries a unique tie-break
key (o_orderkey / event_id) — row_number/ntile/lag over a non-total
order is nondeterministic and would flap the hash. Running sums go
through decimal casts (same reason as aggregates).

Scale: a window = one shuffle on partitionBy keys + per-partition sort.
All windows here partition by a high-cardinality key (custkey/user_id),
so no single partition concentrates the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#33 row_number / rank / dense_rank per customer by price."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           lag(o_orderdate) OVER w AS prev_date,
           lead(o_orderdate) OVER w AS next_date,
           datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#34 lag/lead: gap in days between consecutive orders per customer."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        prev.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(F.col("o_orderdate"), prev).alias("gap_days"),
    )


@query(
    "win_running",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#35 running sum with explicit frame (decimal-exact)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_sliding_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
    FROM events
    """,
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#36 moving average over a 3-row sliding frame per user."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#37 range frame over a numeric ordering (value-based, so ties are
    well-defined without a tie-break key)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
    )


@query(
    "win_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ntile(4) OVER w AS quartile,
           first_value(c_custkey) OVER w2 AS richest_cust,
           last_value(c_custkey) OVER w2 AS poorest_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
           w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#38 quartiles + first/last value over the full partition frame."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w2).alias("richest_cust"),
        F.last("c_custkey").over(w2).alias("poorest_cust"),
    )


@query(
    "win_percent_cume",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cume,
           CAST(least(floor(o_totalprice / 60000) + 1, 11) AS INT) AS price_bucket
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#33b distribution window functions: percent_rank / cume_dist,
    plus histogram binning (width_bucket-style, written as arithmetic
    because DuckDB 1.0 lacks width_bucket). Ratios of small ints are
    IEEE-identical; rounded for belt-and-braces."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.least(F.floor(F.col("o_totalprice") / 60000) + 1, F.lit(11))
        .cast("int")
        .alias("price_bucket"),
    )


@query(
    "win_streak_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, COUNT(*) AS streak_len, MIN(d) AS streak_start
      FROM grp GROUP BY user_id, anchor
    ), ranked AS (
      SELECT user_id, streak_len, streak_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_len DESC, streak_start) AS rn
      FROM streaks
    )
    SELECT user_id, streak_len,
           CAST(streak_start AS TIMESTAMP) AS streak_start
    FROM ranked WHERE rn = 1
    """,
)
def win_streak_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days (earliest such run on ties). The classic trick — day minus its
    per-user row_number is constant within a consecutive island — turns
    streak detection into a plain groupBy, with no self-join and no
    iterative logic.

    Scale: the distinct (user, day) set is tiny relative to raw events
    (map-side partial distinct first), then ONE shuffle on user_id
    serves the ordering window, the island groupBy, and the longest-
    pick window alike. Nothing touches raw event rows after the first
    aggregation."""
    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("anchor", F.date_sub("d", F.row_number().over(w)))
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("d").alias("streak_start")
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "streak_len",
            # date -> midnight timestamp on both sides: pandas lands both
            # engines on datetime64, where raw DATE dtypes diverge
            F.col("streak_start").cast("timestamp_ntz").alias("streak_start"),
        )
    )
