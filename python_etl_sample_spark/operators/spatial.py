"""Spatial radius join via grid-cell bucketing — the "never all-pairs"
pattern for proximity queries (geo joins, collision detection, spatial
feature engineering) expressed as plain equi-joins.

Entities get deterministic synthetic planar coordinates derived from
their keys with the repo's masked multiplicative hashes (the fixtures
carry no geo columns; the DERIVATION is part of the queried semantics
and is mirrored textually in the oracle). Coordinates are integer
centi-units on a 10000×10000 grid, so every distance comparison is
exact int64 arithmetic — no floating point reaches the hash.

The join itself is the scale pattern: bucket space into cells the size
of the search radius, replicate the SMALL side into its 3×3 cell
neighborhood (a constant ×9 blow-up of the small side only), and
equi-join on cell id before the exact distance predicate. At 100 TB
the big side shuffles once on cell id, skew follows spatial density
(AQE splits hot cells), and nothing ever compares against more than
its nine neighboring cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: search radius in centi-units (5.0 units on the 100×100 map) — also
#: the grid cell size, so candidates always sit in the 3×3 neighborhood
_R = 500
_R2 = _R * _R

# key → coordinate in [0, 10000): two independent masked multiplicative
# hashes (Knuth's 2654435761 and the public xxhash prime 2246822519;
# masking keeps the product provably inside int64 in both engines)
_CX = "(({k} % 100000) * 2654435761) % 10000"
_CY = "(({k} % 100000) * 2246822519) % 10000"


def _with_coords(df: DataFrame, key: str) -> DataFrame:
    return df.select(
        F.col(key),
        F.expr(_CX.format(k=key)).alias("x"),
        F.expr(_CY.format(k=key)).alias("y"),
    )


@query(
    "spatial_grid_join",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey,
             {_CX.format(k="c_custkey")} AS x,
             {_CY.format(k="c_custkey")} AS y
      FROM customer
    ),
    sup AS (
      SELECT s_suppkey,
             {_CX.format(k="s_suppkey")} AS x,
             {_CY.format(k="s_suppkey")} AS y
      FROM supplier
    ),
    sup_cells AS (
      SELECT s.s_suppkey, s.x, s.y,
             s.x // {_R} + o1.dx AS cx,
             s.y // {_R} + o2.dy AS cy
      FROM sup s
      CROSS JOIN (VALUES (-1), (0), (1)) o1(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) o2(dy)
    )
    SELECT c.c_custkey,
           COUNT(s.s_suppkey) AS n_nearby,
           CAST(MIN((c.x - s.x) * (c.x - s.x)
                    + (c.y - s.y) * (c.y - s.y)) AS BIGINT) AS min_dist2
    FROM cust c
    LEFT JOIN sup_cells s
      ON s.cx = c.x // {_R} AND s.cy = c.y // {_R}
     AND (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= {_R2}
    GROUP BY c.c_custkey
    """,
)
def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: for every customer, how many suppliers sit within
    distance 5.0 on the synthetic map, and how close is the nearest —
    zero-neighbor customers kept with count 0 (LEFT join through the
    grid).

    The supplier (small) side is replicated into its nine neighboring
    cells — a constant-factor blow-up of the small side, the classic
    asymmetry choice — then the join is a cell-id equi-join with the
    exact integer distance predicate as a residual condition, so
    correctness never depends on the bucketing (cells only bound the
    candidate set; a point within radius is always within one cell).
    Per-customer aggregation reuses the join's output partitioning.
    COUNT counts the supplier key (null on no-match rows → 0), and
    min_dist2 is NULL for isolated customers in both engines."""
    cust = _with_coords(table(spark, sf_dir, "customer"), "c_custkey")
    sup = _with_coords(table(spark, sf_dir, "supplier"), "s_suppkey")
    off = F.explode(F.expr("array(-1, 0, 1)"))
    sup_cells = (
        sup.withColumn("dx", off)
        .withColumn("dy", off)
        .select(
            "s_suppkey",
            F.col("x").alias("sx"),
            F.col("y").alias("sy"),
            (F.expr(f"x div {_R}") + F.col("dx")).alias("cx"),
            (F.expr(f"y div {_R}") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    joined = cust.join(
        sup_cells,
        (F.col("cx") == F.expr(f"x div {_R}"))
        & (F.col("cy") == F.expr(f"y div {_R}"))
        & (d2 <= _R2),
        "left",
    )
    return joined.groupBy("c_custkey").agg(
        F.count("s_suppkey").alias("n_nearby"),
        F.min(d2).cast("bigint").alias("min_dist2"),
    )
