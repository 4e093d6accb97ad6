"""Mergeable-sketch operators round 4: Apache DataSketches HLL and the
space-saving top-k sketch — the approximate-aggregation tier that keeps
100 TB interactive.

Sketches earn their place through MERGEABILITY: partial sketches built
map-side combine associatively, so network cost is sketch-size, not
data-size — the same property the decimal-sum scheme gives exact
aggregates, extended to distinct-count and heavy-hitter problems where
no exact constant-state aggregate exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "agg_approx_topk",
    oracle="""
    SELECT o_orderpriority AS item, COUNT(*) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the space-saving sketch (``approx_top_k``),
    sized so the sketch is provably EXACT: with maxItemsTracked ≥ the
    domain size (5 priorities ≪ 64 tracked), every counter is an exact
    count and the result equals the groupBy — which is exactly what the
    oracle checks. The top-k request covers the whole domain so no
    tie-at-the-cutoff can make item selection engine-dependent.

    That is the honest contract for sketch top-k at 100 TB: exact while
    the tracked set covers the hot domain, graceful (bounded-error,
    bounded-memory) once it doesn't — versus the exact groupBy whose
    state grows with the key count. The sketch merges associatively
    map-side, so the shuffle carries one ~KB sketch per partition."""
    o = table(spark, sf_dir, "orders")
    sk = o.agg(
        F.expr("approx_top_k(o_orderpriority, 10, 64)").alias("topk")
    )
    item = F.explode("topk").alias("entry")
    return (
        sk.select(item)
        .select(
            F.col("entry.item").alias("item"),
            F.col("entry.count").alias("cnt"),
        )
    )


@query(
    "sketch_hll_mergeable",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_distinct,
           1 AS est_in_5pct,
           'per_flag' AS level
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL' AS l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_distinct,
           1 AS est_in_5pct,
           'union' AS level
    FROM lineitem
    """,
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-keys per return flag via DataSketches HLL, plus the
    UNION of the per-flag sketches re-estimated as a global count —
    demonstrating the property that makes sketches the 100 TB distinct
    path: partial sketches merge associatively (hll_union_agg), so
    rollups reuse leaf sketches instead of rescanning data.

    Oracle-checked since round 5 via the agg_approx_distinct pattern:
    the raw estimate is engine-specific (DuckDB's HLL differs), so the
    hashed output carries the EXACT count plus a 1/0 flag asserting the
    sketch estimate landed within 5% of it — the oracle asserts the
    flag is 1, so a sketch-accuracy regression (including in the merged
    union sketch, whose error compounds) becomes a driver hash
    MISMATCH instead of an eyeball check. Default lgK ≈ 1-2% error;
    5% is the alarm threshold."""
    li = table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )
    in_tol = (
        F.abs(
            F.hll_sketch_estimate(F.col("sk")).cast("double")
            - F.col("exact_distinct")
        )
        / F.col("exact_distinct")
        <= 0.05
    )
    per_flag_est = per_flag.select(
        "l_returnflag",
        "exact_distinct",
        F.when(in_tol, F.lit(1)).otherwise(F.lit(0)).alias("est_in_5pct"),
        F.lit("per_flag").alias("level"),
    )
    global_exact = li.agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    union_est = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    global_row = (
        union_est.crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("ALL").alias("l_returnflag"),
            "exact_distinct",
            F.when(
                F.abs(F.col("est").cast("double") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= 0.05,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("est_in_5pct"),
            F.lit("union").alias("level"),
        )
    )
    return per_flag_est.unionAll(global_row)
