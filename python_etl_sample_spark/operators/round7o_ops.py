"""Round-7 batch 15 — the blocked rank test and class-balanced
sampling:

- ``stats_friedman``: the Friedman test (blocked nonparametric
  k-treatment comparison) of event-type revenue across calendar-day
  blocks — completes the classical rank-test suite (two-sample
  rank-sum, paired signed-rank, k-group Kruskal-Wallis, and now the
  blocked design), with the tie-general statistic reduced to ONE
  division of exact integers.
- ``sample_balanced_downsample``: exact class-balanced downsampling —
  keep the m = min-class-count hash-first rows of EACH label so a
  skewed binary target trains on a 50:50 sample, via one stacked
  total-order kernel pass (no per-class single-task window).

Determinism: within-block midranks are exact 2×rank integers;
Friedman's tie-corrected χ² is (k−1)·Σ(R2_j − b(k+1))² over
(Σ mid2² − b·k·(k+1)²) — exact integers, one division; the sampling
order is a masked multiplicative hash with key tie-break, and the
kept set is a pure function of exact per-class ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_VCENTS = "CAST(round(value * 100) AS BIGINT)"
_YPOS = "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"
_DEC38 = "decimal(38,0)"

# ---------------------------------------------------------------------------
# stats_friedman
# ---------------------------------------------------------------------------


@query(
    "stats_friedman",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             SUM({_VCENTS}) AS v
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM cells),
    types AS (SELECT DISTINCT event_type FROM cells),
    grid AS (
      SELECT d.day, t.event_type, COALESCE(c.v, 0) AS v
      FROM days d CROSS JOIN types t
      LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
    ),
    dv AS (SELECT day, v, COUNT(*) AS cl FROM grid GROUP BY day, v),
    mr AS (
      SELECT day, v,
             2 * SUM(cl) OVER (PARTITION BY day ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - cl + 1 AS mid2
      FROM dv
    ),
    ranked AS (
      SELECT g.event_type, g.day, m.mid2
      FROM grid g JOIN mr m ON m.day = g.day AND m.v = g.v
    ),
    pt AS (
      SELECT event_type, SUM(CAST(mid2 AS DECIMAL(38,0))) AS r2
      FROM ranked GROUP BY event_type
    ),
    gl AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM days) AS b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM types) AS k,
             (SELECT SUM(CAST(mid2 AS DECIMAL(38,0)) * mid2)
              FROM ranked) AS ssq2
    ),
    num AS (
      SELECT gl.b, gl.k, gl.ssq2,
             SUM((pt.r2 - gl.b * (gl.k + 1))
                 * (pt.r2 - gl.b * (gl.k + 1))) AS s2
      FROM pt CROSS JOIN gl
      GROUP BY gl.b, gl.k, gl.ssq2
    )
    SELECT b AS n_blocks, k AS n_treatments,
           CAST(k - 1 AS BIGINT) AS df,
           CASE WHEN ssq2 - b * k * (k + 1) * (k + 1) > 0
                THEN round(CAST((k - 1) * s2 AS DOUBLE)
                           / CAST(ssq2 - b * k * (k + 1) * (k + 1)
                                  AS DOUBLE), 6)
                END AS chi2
    FROM num
    """,
)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the event types differ in revenue once the
    day-to-day level is blocked out? Each calendar day is a block;
    the k event types take within-block midranks of their daily
    revenue (absent combinations rank as zero revenue — the complete
    block the test requires); the tie-general statistic
    χ² = (k−1)·Σ_j(R_j − b(k+1)/2)² / (Σr² − bk(k+1)²/4) follows a
    χ²(k−1) under the null. The BLOCKED member of the rank-test
    suite: Kruskal-Wallis pools all days into one ranking and a
    day-level shock inflates its variance; Friedman ranks within each
    day, so only the type ORDERING matters.

    Exactness: with doubled midranks (2·cum − cnt + 1, exact
    integers), both numerator and denominator scale by 4 and cancel:
    χ² = (k−1)·Σ(R2_j − b(k+1))² / (Σ mid2² − b·k·(k+1)²) is ONE
    division of exact 38-digit-decimal integers, rounded at 6 dp
    (all-tied blocks make the denominator 0 → NULL on both engines).

    Scale: one (day, type) rollup is the only data-sized shuffle; the
    grid fill, within-day midranks (windows PARTITIONED by day — k
    rows per partition), and the k-row treatment reduction all run on
    the calendar×type-bounded frame."""
    ev = table(spark, sf_dir, "events")
    # r14 probe note: persisting cells/grid/ranked measured 1.2x
    # SLOWER (1.05 → 1.26 s floor) — the branch tree is already
    # deduplicated by runtime exchange reuse, so the persists only
    # added cache-materialization job barriers. Left unpersisted.
    cells = ev.groupBy(
        F.expr("CAST(ts AS DATE)").alias("day"), "event_type"
    ).agg(F.sum(F.expr(_VCENTS)).alias("v"))
    days = cells.select("day").distinct()
    types = cells.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cells, ["day", "event_type"], "left")
        .withColumn("v", F.coalesce("v", F.lit(0)))
    )
    dv = grid.groupBy("day", "v").agg(F.count(F.lit(1)).alias("cl"))
    wd = Window.partitionBy("day").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mr = dv.select(
        "day",
        "v",
        (2 * F.sum("cl").over(wd) - F.col("cl") + 1).alias("mid2"),
    )
    ranked = grid.join(mr, ["day", "v"]).select("event_type", "mid2")
    pt = ranked.groupBy("event_type").agg(
        F.sum(F.col("mid2").cast(_DEC38)).alias("r2")
    )
    gl = (
        days.agg(F.count(F.lit(1)).cast("long").alias("b"))
        .crossJoin(types.agg(F.count(F.lit(1)).cast("long").alias("k")))
        .crossJoin(
            ranked.agg(
                F.sum(F.col("mid2").cast(_DEC38) * F.col("mid2")).alias(
                    "ssq2"
                )
            )
        )
    )
    dev = F.col("r2") - F.col("b") * (F.col("k") + 1)
    num = pt.crossJoin(F.broadcast(gl)).groupBy("b", "k", "ssq2").agg(
        F.sum(dev * dev).alias("s2")
    )
    denom = F.col("ssq2") - F.col("b") * F.col("k") * (F.col("k") + 1) * (
        F.col("k") + 1
    )
    return num.select(
        F.col("b").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.when(
            denom > 0,
            F.round(
                ((F.col("k") - 1) * F.col("s2")).cast("double")
                / denom.cast("double"),
                6,
            ),
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# sample_balanced_downsample
# ---------------------------------------------------------------------------

#: sampling-order hash — the repo's audited masked multiplicative
#: shape: (key % p) * 2654435761 stays inside int64 (operators/
#: inference.py); the final small modulus decorrelates from key order
_BAL_HASH = "((o_orderkey % 3221225473) * 2654435761) % 1000003"


@query(
    "sample_balanced_downsample",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, {_YPOS} AS label, {_BAL_HASH} AS h FROM orders
    ),
    cls AS (SELECT label, COUNT(*) AS n_l FROM base GROUP BY label),
    m_t AS (SELECT MIN(n_l) AS m FROM cls),
    r AS (
      SELECT o_orderkey, label,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY h, o_orderkey) AS rn
      FROM base
    )
    SELECT o_orderkey, CAST(label AS INT) AS label
    FROM r CROSS JOIN m_t
    WHERE rn <= m
    """,
)
def sample_balanced_downsample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact class-balanced downsampling of the urgent/high binary
    target: every class keeps its m hash-first rows, where m is the
    minority-class count — the 50:50 training sample that keeps a
    classifier from collapsing onto the majority class, with the
    masked multiplicative hash making the kept set reproducible
    across runs, engines, and partitionings (no RNG state).

    Scale shape: the per-class rank comes from ONE stacked pass of
    the range-partitioned total-order kernel over (label, hash, key)
    — classes are contiguous under that order, so per-class rank =
    global rank − class offset (the RFM stacked-metric pattern,
    marketing.py). A per-class window would funnel each class through
    one task; the kernel keeps both classes range-partitioned. Class
    counts are a 2-row broadcast.

    Determinism: the hash is the repo's int64-audited multiplicative
    mix with the key as tie-break; ranks and the m cut are exact
    integers."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.expr(_YPOS).alias("label"),
        F.expr(_BAL_HASH).alias("h"),
    )
    ranked = attach_global_order(
        base,
        [F.asc("label"), F.asc("h"), F.asc("o_orderkey")],
        rn="__grn",
    )
    cls = base.groupBy("label").agg(F.count(F.lit(1)).alias("n_l"))
    below = cls.select(
        F.col("label").alias("blabel"), F.col("n_l").alias("bn")
    )
    # exclusive prefix + global min over the 2-row class frame via
    # joins (window-free: the frame is the label domain, a constant)
    offsets = (
        cls.join(below, F.col("blabel") < F.col("label"), "left")
        .groupBy("label", "n_l")
        .agg(F.coalesce(F.sum("bn"), F.lit(0)).alias("off"))
        .crossJoin(F.broadcast(cls.agg(F.min("n_l").alias("m"))))
        .select("label", "off", "m")
    )
    return (
        ranked.join(F.broadcast(offsets), "label")
        .filter(F.col("__grn") - F.col("off") <= F.col("m"))
        .select("o_orderkey", F.col("label").cast("int").alias("label"))
    )
