"""Correlated-subquery query shapes — EXISTS / NOT EXISTS / IN /
scalar / LATERAL / null-aware NOT IN.

These run through ``spark.sql`` over temp views on purpose: subqueries
are where declarative planning earns its keep, and Catalyst rewrites
every one of them into a join the distributed engine can actually run —
EXISTS/IN → left-semi join, NOT EXISTS → left-anti join, a correlated
scalar aggregate → an aggregate + equi join (RewriteCorrelatedScalarSubquery),
NOT IN over a nullable key → a null-aware anti join, LATERAL → a
decorrelated DomainJoin. Hand-writing those joins in the DataFrame API
(joins.py has the semi/anti primitives) would produce the same physical
plans; the SQL forms prove the engine accepts the query surface a
reference user would actually type.

Scale posture: every subquery here decorrelates to a shuffle or
broadcast hash join — there is NO per-row re-execution of the inner
query (that driver-loop shape is exactly what decorrelation exists to
avoid). The inner aggregates are map-side combined before their join;
the dimension-sided inners (nation) broadcast.

Determinism: every hashed float follows functions/determinism.py —
decimal-exact sums cast to double, derived ratios with the association
mirrored textually in both engines; qty thresholds compare exact
integer-valued doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_etl_sample_spark.functions.determinism import dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


# Q4-shaped: same text runs in both engines; Spark plans the EXISTS as a
# left-semi hash join on l_orderkey (no per-order probe).
_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@query("subquery_exists", oracle=_EXISTS_SQL)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: per-priority count of 1997Q1 orders that have at
    least one returned line, via a correlated EXISTS.

    Scale: Catalyst rewrites EXISTS → left-semi join on l_orderkey; the
    quarter filter pushes to the orders scan so the semi join's probe
    side is ~1% of orders; lineitem ships only its join key + the
    pushed-down returnflag filter. One shuffle pair, then a tiny
    aggregate."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_EXISTS_SQL)


# Q18-shaped: the IN's inner aggregate (orders whose total quantity
# exceeds 250 — ~p99 of the fixture distribution) decorrelates to a
# semi join against a map-side-combined groupBy.
_IN_HAVING_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {dsum_sql('l_quantity')} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@query("subquery_in_having", oracle=_IN_HAVING_SQL)
def subquery_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: large-quantity orders (sum qty > 250, ~top 1%)
    with their customer, via IN over a grouped HAVING subquery.

    Scale: the inner groupBy(l_orderkey) partially aggregates map-side,
    so the semi join's build side is orders-cardinality, not
    lineitem-cardinality; the outer three-way join then reuses the
    l_orderkey shuffle partitioning under AQE. The HAVING threshold uses
    the decimal-exact sum so the selected key set is engine-identical."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_IN_HAVING_SQL)


# Q17-shaped: correlated scalar AVG per part. The fixture's l_quantity
# is integer-valued (≤ ~51, ~30 lines/part), so the double AVG is an
# exact small-integer sum / exact count — one correctly-rounded IEEE
# division, bit-identical in both engines; the 0.5× threshold compare
# is then deterministic with no decimal detour needed.
_SCALAR_CORR_SQL = f"""
SELECT CAST({dsum_sql('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < 0.5 * (
    SELECT AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
"""


@query("subquery_scalar_correlated", oracle=_SCALAR_CORR_SQL)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped: revenue impact of small-quantity orders for one
    brand, via a correlated scalar AVG subquery.

    Scale: RewriteCorrelatedScalarSubquery turns the per-part AVG into
    ONE aggregate over lineitem grouped by l_partkey, joined back on
    the part key — the inner query runs once, not once per outer row.
    The brand filter broadcasts (80 parts), so the rewritten plan is a
    broadcast join over a map-side-combined aggregate."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_SCALAR_CORR_SQL)


# Q22-shaped: scalar-subquery threshold (exact decimal sum / count with
# the association mirrored textually) + NOT EXISTS → left-anti join.
# Every fixture customer keeps ordering in every window, so plain
# time-scoped inactivity selects nothing at sf0.001; "no URGENT order
# since 1997" is non-empty at every fixture scale (12 @ sf0.001,
# 147 @ sf0.01).
_NOT_EXISTS_SQL = f"""
SELECT c_nationkey, COUNT(*) AS n_custs, {dsum_sql('c_acctbal')} AS total_bal
FROM customer c
WHERE c.c_acctbal > (
  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
  FROM customer c2 WHERE c2.c_acctbal > 0
)
AND NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderpriority = '1-URGENT'
    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
)
GROUP BY c_nationkey
"""


@query("subquery_not_exists_inactive", oracle=_NOT_EXISTS_SQL)
def subquery_not_exists_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: well-funded customers (balance above the
    positive-balance average, an uncorrelated scalar subquery) with no
    urgent order since 1997 (correlated NOT EXISTS), rolled up per
    nation.

    Scale: the scalar threshold is a one-row aggregate broadcast into
    the filter; NOT EXISTS becomes a left-anti hash join on c_custkey
    against the date-filtered orders scan (filter pushed down). No
    per-customer probing anywhere."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_NOT_EXISTS_SQL)


# LATERAL: per-nation top-2 customers by balance. Comma-LATERAL syntax
# parses in both engines; ties break on c_name then c_custkey so the
# LIMIT 2 cut is deterministic.
_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c.c_name, c.c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_name, c.c_custkey
  LIMIT 2
) t
"""


@query("join_lateral_topk", oracle=_LATERAL_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers by account balance, written as a
    correlated LATERAL subquery with ORDER BY + LIMIT.

    Scale: Spark decorrelates the lateral limit into a partitioned
    rank-and-filter over ONE shuffle of customer by nationkey (the same
    physical plan topk_per_group builds by hand with row_number) — the
    25-row nation side broadcasts. The lateral form is the surface a
    SQL user writes; the engine still never executes per-nation
    scans."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


# NOT IN over a (schema-nullable) key column: Spark must preserve
# three-valued NOT IN semantics, planning a null-aware anti join.
_NOT_IN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_custs
FROM customer
WHERE c_nationkey NOT IN (
  SELECT n_nationkey FROM nation WHERE n_name LIKE 'A%'
)
GROUP BY c_mktsegment
"""


@query("subquery_not_in_null_aware", oracle=_NOT_IN_SQL)
def subquery_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers outside the A-named nations via NOT IN — the
    three-valued-logic shape (any NULL in the inner set empties the
    result) that Spark plans as a null-aware anti join.

    Scale: the inner set is a handful of nation keys — Spark broadcasts
    it (single-key NAAJ rides BroadcastHashJoin); the outer side stays
    a single scan + aggregate. Contrast with join_anti, which is the
    NULL-blind EXISTS-style anti join."""
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(_NOT_IN_SQL)
