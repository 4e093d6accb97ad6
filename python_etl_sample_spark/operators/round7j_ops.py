"""Round-7 batch 10 — the model-evaluation tier: exact ROC-AUC,
calibration, gains/lift deciles, and the k-group rank test.

A pipeline that trains on the corpus this engine curates needs to
SCORE models at the same scale; these are the four evaluation
primitives every ML platform reimplements:

- ``ml_roc_auc``: exact tie-corrected ROC-AUC (and Gini) via the
  rank-statistic identity AUC = (R⁺ − n₁(n₁+1)/2)/(n₁n₀) — computed
  over the score HISTOGRAM with average ranks, so the shuffle carries
  distinct score values, not rows.
- ``ml_calibration_bins``: 10-bin reliability table (mean predicted
  vs realized rate) with per-bin Brier score for a deterministic
  logistic score — the calibration audit run before any probability
  is trusted downstream.
- ``ml_gains_deciles``: the cumulative-gains / lift table over score
  deciles (NTILE via the range-partitioned total-order kernel) — the
  targeting report that answers "how much of the positive class do
  the top-k% capture".
- ``stats_kruskal_wallis``: the Kruskal-Wallis H test (tie-corrected)
  for k-group location shift — the rank-based complement to the
  parametric ANOVA F (stats_anova_f), built on the same
  histogram-average-rank kernel as the AUC.

The shared scale idea: every rank here is an AVERAGE RANK over a
value histogram — rank arithmetic runs on distinct values (domain-
bounded for integer cents), not on rows, so the only data-sized
shuffles are the initial groupBys.

Determinism: ranks and concordance sums are exact integers carried in
38-digit decimals (2× average ranks stay integral); every statistic is
one mirrored float expression of those exact sums rounded at 6 dp;
the logistic score rounds at 6 dp before binning so bin membership is
identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.total_order import (
    attach_global_order,
    ntile_from_rank,
)
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_SCENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_BCENTS = "CAST(round(c_acctbal * 100) AS BIGINT)"
_YPOS = "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"
_DEC38 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# ml_roc_auc
# ---------------------------------------------------------------------------


@query(
    "ml_roc_auc",
    oracle=f"""
    WITH base AS (
      SELECT {_SCENTS} AS score, {_YPOS} AS y FROM orders
    ),
    h AS (SELECT score, COUNT(*) AS cnt, SUM(y) AS pos
          FROM base GROUP BY score),
    r AS (
      SELECT cnt, pos,
             SUM(cnt) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM h
    ),
    agg AS (
      SELECT SUM(CAST(pos AS DECIMAL(38,0)) * (2 * cum - cnt + 1))
               AS sum2pos,
             SUM(CAST(pos AS DECIMAL(38,0))) AS n1,
             SUM(CAST(cnt AS DECIMAL(38,0))) AS n
      FROM r
    ),
    v AS (
      SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n - n1 AS BIGINT) AS n_neg,
             CASE WHEN n1 > 0 AND n - n1 > 0
                  THEN CAST(sum2pos - n1 * (n1 + 1) AS DOUBLE)
                       / CAST((2 * n1) * (n - n1) AS DOUBLE)
                  END AS araw
      FROM agg
    )
    SELECT n_pos, n_neg, round(araw, 6) AS auc,
           round(2.0 * araw - 1.0, 6) AS gini
    FROM v
    """,
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the order-value score against the
    urgent/high-priority label, via the Mann-Whitney rank identity
    AUC = (R⁺ − n₁(n₁+1)/2)/(n₁n₀) with midrank tie handling (ties at
    a score value contribute their average rank — the trapezoidal tie
    treatment sklearn's roc_auc_score applies). Gini = 2·AUC − 1
    alongside. The evaluation twin of the rank-sum test
    (stats_rank_sum_u): same statistic, read as a classifier metric.

    Scale shape: ONE data-sized groupBy collapses rows to the score
    histogram (distinct integer cents — value-domain-bounded), the
    total-order kernel ranks the HISTOGRAM (range shuffle of distinct
    values, never rows), and average ranks come from the cumulative
    count: rank arithmetic is O(distinct values) regardless of row
    count. No per-row window, no sort of the full table.

    Determinism: 2×average-rank (2·cum − cnt + 1) is an exact integer;
    the positive-rank sum accumulates in 38-digit decimals; AUC is one
    division of exact integers rounded at 6 dp (degenerate one-class
    inputs yield NULL on both engines)."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.expr(_SCENTS).alias("score"), F.expr(_YPOS).alias("y")
    )
    h = base.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    r = attach_global_order(h, [F.asc("score")], cumsums=[("cnt", "cum")])
    avg2 = 2 * F.col("cum") - F.col("cnt") + 1
    agg = r.agg(
        F.sum(F.col("pos").cast(_DEC38) * avg2).alias("sum2pos"),
        F.sum(F.col("pos").cast(_DEC38)).alias("n1"),
        F.sum(F.col("cnt").cast(_DEC38)).alias("n"),
    )
    n1, n = F.col("n1"), F.col("n")
    araw = F.when(
        (n1 > 0) & (n - n1 > 0),
        (F.col("sum2pos") - n1 * (n1 + 1)).cast("double")
        / ((2 * n1) * (n - n1)).cast("double"),
    )
    return agg.select(
        n1.cast("long").alias("n_pos"),
        (n - n1).cast("long").alias("n_neg"),
        F.round(araw, 6).alias("auc"),
        F.round(2.0 * araw - 1.0, 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# ml_calibration_bins
# ---------------------------------------------------------------------------


@query(
    "ml_calibration_bins",
    oracle=f"""
    WITH base AS (
      SELECT {_SCENTS} AS cents, {_YPOS} AS y FROM orders
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) AS ssq
      FROM base
    ),
    z AS (
      SELECT y,
             round(1.0 / (1.0 + exp(-((CAST(cents AS DOUBLE) - (s / n))
                                      / sqrt(GREATEST((ssq - s * (s / n)) / n, 0))))),
                   6) AS p
      FROM base CROSS JOIN m
    ),
    b AS (
      SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin, y, p FROM z
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(CAST(SUM(CAST(p AS DECIMAL(28,10))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_pred,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
           round(CAST(SUM(CAST(round((p - y) * (p - y), 12)
                               AS DECIMAL(28,14))) AS DOUBLE)
                 / COUNT(*), 6) AS brier
    FROM b GROUP BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) table of a deterministic logistic
    score p = σ((value − μ)/sd) against the urgent/high label, in ten
    equal-width probability bins: mean predicted probability vs
    realized positive rate per bin, plus the per-bin Brier score
    (mean (p − y)²). |avg_pred − frac_pos| per bin IS the reliability
    diagram a platform plots before trusting any model probability —
    and the per-bin Brier localizes where the score is worst.

    The score is a fixed, data-derived transform (global z-score
    through the logistic), not a trained model — the point is the
    evaluation machinery: binning, per-bin moments, and the Brier
    decomposition inputs, all exact.

    Scale: one pass for the two global moments (1-row broadcast), one
    map stage to score and bin, one 10-group aggregate with map-side
    combine. Nothing driver-side, nothing quadratic.

    Determinism: μ and sd derive from exact integer-cents sums with
    mirrored parenthesization; p rounds at 6 dp BEFORE binning (so
    bin membership is engine-identical) and sums as decimal(28,10);
    (p − y)² rounds at 12 dp into decimal sums; the three per-bin
    ratios are single divisions rounded at 6 dp."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.expr(_SCENTS).alias("cents"), F.expr(_YPOS).alias("y")
    )
    cd = F.col("cents").cast(_DEC38)
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cd).cast("double").alias("s"),
        F.sum(cd * F.col("cents")).cast("double").alias("ssq"),
    )
    mu = F.col("s") / F.col("n")
    # GREATEST-guard (ADVICE r7): near-constant series can round the
    # variance to a tiny negative; DuckDB sqrt raises where Spark NaNs
    sd = F.sqrt(
        F.greatest((F.col("ssq") - F.col("s") * mu) / F.col("n"), F.lit(0.0))
    )
    p = F.round(
        1.0
        / (
            1.0
            + F.exp(-((F.col("cents").cast("double") - mu) / sd))
        ),
        6,
    )
    z = base.crossJoin(F.broadcast(m)).select("y", p.alias("p"))
    b = z.select(
        F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int").alias("bin"),
        "y",
        "p",
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("p").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_pred"),
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias(
            "frac_pos"
        ),
        F.round(
            F.sum(
                F.round(
                    (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")), 12
                ).cast("decimal(28,14)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("brier"),
    )


# ---------------------------------------------------------------------------
# ml_gains_deciles
# ---------------------------------------------------------------------------


@query(
    "ml_gains_deciles",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, {_SCENTS} AS score, {_YPOS} AS y FROM orders
    ),
    d AS (
      SELECT y, NTILE(10) OVER (ORDER BY score DESC, o_orderkey) AS decile
      FROM base
    ),
    g AS (
      SELECT decile, COUNT(*) AS n_rows, SUM(y) AS n_pos
      FROM d GROUP BY decile
    ),
    c AS (
      SELECT decile, n_rows, n_pos,
             SUM(n_pos) OVER (ORDER BY decile
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_pos,
             SUM(n_pos) OVER () AS tot_pos,
             SUM(n_rows) OVER () AS tot_rows
      FROM g
    )
    SELECT decile, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS cum_capture,
           round((CAST(n_pos AS DOUBLE) / n_rows)
                 / (CAST(tot_pos AS DOUBLE) / tot_rows), 6) AS lift
    FROM c
    """,
)
def ml_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table: rank orders by the value score
    descending, cut into NTILE(10) deciles, and report per decile the
    positive count, the cumulative share of ALL positives captured so
    far (the gains curve), and the lift of the decile's positive rate
    over the global rate — the campaign-targeting readout ("the top
    20% of scores capture X% of responders").

    Scale: the decile assignment is the range-partitioned total-order
    kernel + arithmetic NTILE (functions/total_order.py — no
    single-task window over the data), then a 10-group aggregate. The
    cumulative step runs on the 10-row decile frame only.

    Determinism: the (score DESC, orderkey) order is total, the kernel
    NTILE matches SQL NTILE bit-for-bit, counts are exact, and the two
    ratios are single divisions of exact integers rounded at 6 dp."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", F.expr(_SCENTS).alias("score"), F.expr(_YPOS).alias("y")
    )
    ranked = attach_global_order(
        base,
        [F.desc("score"), F.asc("o_orderkey")],
        rn="__rn",
        total_count="__n",
    )
    d = ranked.select(
        "y", ntile_from_rank(F.col("__rn"), F.col("__n"), 10).alias("decile")
    )
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("y").alias("n_pos")
    )
    # bounded-window: the decile frame is exactly 10 rows (k is a
    # query constant, independent of data volume); the cumulative
    # gains curve needs the running positive total over those 10
    # ordered rows — a constant-size reduction, not a data window.
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    # bounded-window: same 10-row frame — the unpartitioned totals
    # are constants of that frame, not of the data.
    wt = Window.partitionBy()
    c = g.select(
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_pos").over(wc).alias("cum_pos"),
        F.sum("n_pos").over(wt).alias("tot_pos"),
        F.sum("n_rows").over(wt).alias("tot_rows"),
    )
    return c.select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(
            F.col("cum_pos").cast("double") / F.col("tot_pos"), 6
        ).alias("cum_capture"),
        F.round(
            (F.col("n_pos").cast("double") / F.col("n_rows"))
            / (F.col("tot_pos").cast("double") / F.col("tot_rows")),
            6,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# stats_kruskal_wallis
# ---------------------------------------------------------------------------


@query(
    "stats_kruskal_wallis",
    oracle=f"""
    WITH base AS (
      SELECT c_mktsegment AS seg, {_BCENTS} AS v FROM customer
    ),
    gs AS (SELECT seg, v, COUNT(*) AS cnt_gs FROM base GROUP BY seg, v),
    h AS (SELECT v, SUM(cnt_gs) AS cnt FROM gs GROUP BY v),
    r AS (
      SELECT v, cnt,
             SUM(cnt) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM h
    ),
    grp AS (
      SELECT gs.seg, SUM(gs.cnt_gs) AS n_i,
             SUM(CAST(gs.cnt_gs AS DECIMAL(38,0))
                 * (2 * r.cum - r.cnt + 1)) AS s2
      FROM gs JOIN r ON r.v = gs.v
      GROUP BY gs.seg
    ),
    gm AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(round((CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                                 / (4.0 * n_i), 6) AS DECIMAL(38,8)))
                  AS DOUBLE) AS sr
      FROM grp
    ),
    ties AS (
      SELECT CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt)
                  AS DOUBLE) AS tsum
      FROM h
    ),
    hv AS (
      SELECT n, k,
             ((12.0 / (n * (n + 1.0))) * sr) - (3.0 * (n + 1)) AS hraw,
             1.0 - ties.tsum
                   / CAST(CAST(n AS DECIMAL(38,0)) * n * n - n AS DOUBLE)
               AS corr
      FROM gm CROSS JOIN ties
    )
    SELECT n AS n_total, k AS n_groups, round(hraw, 6) AS h,
           CASE WHEN corr > 0 THEN round(hraw / corr, 6) END
             AS h_tie_corrected
    FROM hv
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test for a location shift of account balance
    across the five market segments: H = 12/(N(N+1)) Σ nᵢR̄ᵢ² − 3(N+1)
    over global midranks, with the tie correction H/C,
    C = 1 − Σ(t³−t)/(N³−N). The k-group rank test — the nonparametric
    complement to stats_anova_f (no normality assumption) and the
    k-group generalization of stats_rank_sum_u, closing the classical
    hypothesis-test suite.

    Scale shape: ranks are average ranks over the VALUE HISTOGRAM
    (distinct integer cents — domain-bounded), computed from one
    cumulative count via the total-order kernel; per-group rank sums
    come from the (value, group) frame joined to the histogram. The
    only row-sized shuffle is the initial (value, group) groupBy.

    Determinism: 2×midranks are exact integers in 38-digit decimals;
    per-group Σnᵢ R̄ᵢ² terms are mirrored double expressions of exact
    sums rounded at 6 dp and decimal-summed over the ≤k groups; H and
    the tie correction combine exact counts with identical
    parenthesization; degenerate all-tied data yields NULL."""
    c = table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_mktsegment").alias("seg"), F.expr(_BCENTS).alias("v")
    )
    # persist the (seg, value) and value-histogram frames (r14): gs
    # feeds the histogram and the per-group rank sums, h feeds the
    # prefix-sum kernel and the tie term — without barriers the
    # customer scan + groupBy re-evaluates once per branch
    gs = base.groupBy("seg", "v").agg(F.count(F.lit(1)).alias("cnt_gs")).persist()
    h = gs.groupBy("v").agg(F.sum("cnt_gs").alias("cnt")).persist()
    r = attach_global_order(h, [F.asc("v")], cumsums=[("cnt", "cum")])
    avg2 = 2 * F.col("cum") - F.col("cnt") + 1
    grp = (
        gs.join(r.select("v", avg2.alias("avg2")), "v")
        .groupBy("seg")
        .agg(
            F.sum("cnt_gs").alias("n_i"),
            F.sum(F.col("cnt_gs").cast(_DEC38) * F.col("avg2")).alias("s2"),
        )
    )
    s2d = F.col("s2").cast("double")
    glob = grp.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.round((s2d * s2d) / (4.0 * F.col("n_i")), 6).cast(
                "decimal(38,8)"
            )
        )
        .cast("double")
        .alias("sr"),
    )
    cd = F.col("cnt").cast(_DEC38)
    ties = h.agg(
        F.sum(cd * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("double")
        .alias("tsum")
    )
    n = F.col("n")
    hraw = ((12.0 / (n * (n + 1.0))) * F.col("sr")) - (3.0 * (n + 1))
    corr = 1.0 - F.col("tsum") / (
        n.cast(_DEC38) * n * n - n
    ).cast("double")
    hv = glob.crossJoin(F.broadcast(ties)).select(
        "n", "k", hraw.alias("hraw"), corr.alias("corr")
    )
    return hv.select(
        F.col("n").alias("n_total"),
        F.col("k").alias("n_groups"),
        F.round(F.col("hraw"), 6).alias("h"),
        F.when(
            F.col("corr") > 0, F.round(F.col("hraw") / F.col("corr"), 6)
        ).alias("h_tie_corrected"),
    )
