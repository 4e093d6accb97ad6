"""Round-6 sixth batch — statistics and structure completions:

- ``stats_spearman_corr``: rank correlation (the monotone-association
  twin of the Pearson ``stats_corr_matrix``), tie-corrected.
- ``stats_anova_f``: one-way ANOVA F — the k-group generalization of
  ``stats_ttest_welch``.
- ``stats_mutual_information``: MI + entropies over two categorical
  columns — the information-theoretic dependence measure
  ``stats_chi2_independence`` can't give (it tests, MI quantifies).
- ``graph_degree_assortativity``: degree-degree Pearson over the
  co-purchase graph — do hubs link to hubs?
- ``ts_seasonal_decompose``: moving-average trend + day-of-week
  seasonal indices (the decomposition behind ``ts_seasonal_naive_eval``).
- ``spatial_knn_grid``: exact k-nearest-within-radius via the 3×3
  grid-cell pattern (the top-k refinement of ``spatial_grid_join``).

Determinism strategy (repo-wide contract, functions/determinism.py):
every rank/count/degree is an exact integer, money sums go through
decimal casts, cross-engine float reductions over small term sets are
rounded then decimal-summed, and every derived ratio rounds at 6 dp.

Scale posture: Spearman/assortativity/ANOVA/MI reduce to one groupBy
plus a ≤25-row (or per-group) reduction — no shuffle carries more than
(group, value) pairs. The seasonal decompose windows are PARTITIONED
per priority (never a global single-task window). The kNN join
replicates only the small side ×9 on grid cells, exactly like
``spatial_grid_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum_sql
from python_etl_sample_spark.operators.graph_analytics import (
    _EDGES_SQL,
    _copurchase_edges,
)
from python_etl_sample_spark.operators.spatial import _CX, _CY, _R, _R2, _with_coords
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


def _pearson_from_int_sums(m: DataFrame, out: str) -> DataFrame:
    """Pearson r from exact integer moment sums (n, sx, sy, sxy, sxx,
    syy already columns of ``m``): the numerator/denominator products
    are formed on exact int64s, cast to double once, and the ratio is
    NULL (not NaN/error) when either variable is constant."""
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    den = F.sqrt(vx * vy)
    return m.withColumn(out, F.round(F.when(den != 0.0, num / den), 6))


def _dual_rank(df: DataFrame, part: str, col: str, out: str) -> DataFrame:
    """Doubled average tie-rank: 2·rank + |ties| − 1 = 2·avg_rank, an
    exact INTEGER even when the average rank is a half — Pearson is
    scale-invariant, so correlating doubled ranks gives Spearman's ρ
    with textbook tie correction and no floats anywhere."""
    wr = Window.partitionBy(part).orderBy(col)
    wt = Window.partitionBy(part, col)
    return df.withColumn(
        out,
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).cast("long"),
    )


@query(
    "stats_spearman_corr",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, {dsum_sql('o_totalprice')} AS spend
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT c.c_mktsegment AS seg, c.c_acctbal AS x, s.spend AS y
      FROM customer c JOIN spend s ON s.o_custkey = c.c_custkey
    ),
    r AS (
      SELECT seg,
             2 * RANK() OVER (PARTITION BY seg ORDER BY x)
               + COUNT(*) OVER (PARTITION BY seg, x) - 1 AS dx,
             2 * RANK() OVER (PARTITION BY seg ORDER BY y)
               + COUNT(*) OVER (PARTITION BY seg, y) - 1 AS dy
      FROM j
    ),
    m AS (
      SELECT seg, COUNT(*) AS n,
             SUM(dx) AS sx, SUM(dy) AS sy, SUM(dx * dy) AS sxy,
             SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy
      FROM r GROUP BY seg
    )
    SELECT seg, CAST(n AS BIGINT) AS n_cust,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 0.0),
                 6) AS spearman_rho
    FROM m
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between account balance and lifetime
    spend, per market segment — the monotone-association measure that
    is robust to the heavy right tail Pearson chokes on.

    Ranks use the textbook average-tie convention, carried as DOUBLED
    ranks (2·rank + ties − 1) so every rank is an exact integer; all
    five moment sums are exact int64 and the single double division
    happens once per segment. Degenerate (constant-variable) segments
    yield NULL, not NaN, in both engines.

    Scale: one groupBy(custkey) over orders, two partitioned rank
    windows (segments are the partitions), and a 5-row reduction —
    ranks shuffle as (segment, value) pairs only."""
    spend = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("y")
        )
    )
    j = (
        table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_acctbal").alias("x"),
        )
        .join(spend, F.col("c_custkey") == F.col("o_custkey"))
    )
    r = _dual_rank(_dual_rank(j, "seg", "x", "dx"), "seg", "y", "dy")
    m = r.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    return _pearson_from_int_sums(m, "spearman_rho").select(
        "seg",
        F.col("n").cast("long").alias("n_cust"),
        "spearman_rho",
    )


@query(
    "stats_anova_f",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority AS pri,
             COUNT(*) AS n_g,
             {dsum_sql('o_totalprice')} / COUNT(*) AS m_g,
             {dsum_sql('o_totalprice * o_totalprice')} AS ssq_g
      FROM orders GROUP BY o_orderpriority
    ),
    grand AS (
      SELECT COUNT(*) AS n, {dsum_sql('o_totalprice')} / COUNT(*) AS m
      FROM orders
    ),
    terms AS (
      SELECT g.n_g,
             CAST(ROUND(g.n_g * (g.m_g - grand.m) * (g.m_g - grand.m), 6)
                  AS DECIMAL(38,6)) AS tb,
             CAST(ROUND(g.ssq_g - g.n_g * g.m_g * g.m_g, 6)
                  AS DECIMAL(38,6)) AS tw
      FROM g CROSS JOIN grand
    ),
    red AS (
      SELECT COUNT(*) AS k, SUM(n_g) AS n,
             CAST(SUM(tb) AS DOUBLE) AS ssb,
             CAST(SUM(tw) AS DOUBLE) AS ssw
      FROM terms
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_total,
           ROUND((ssb / (k - 1)) / NULLIF(ssw / (n - k), 0.0), 6) AS f_stat,
           ROUND(ssb / NULLIF(ssb + ssw, 0.0), 6) AS eta_sq
    FROM red
    """,
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across order priorities: does mean order value
    differ between the k=5 priority groups?  F = (SSB/(k−1)) /
    (SSW/(n−k)) plus the effect size η² = SSB/(SSB+SSW) — the k-group
    generalization of ``stats_ttest_welch``.

    Group moments come from decimal-exact sums; SSB uses the centered
    form Σ n_g·(m_g − m)² (no catastrophic 1e15-scale cancellation
    against the raw second moment), and the five per-group terms are
    rounded then decimal-summed so the k-row reduction is
    order-independent in both engines.

    Scale: two aggregates over orders (per-group + grand) and a 5-row
    reduction — map-side partial aggregation does all the work."""
    dec = "decimal(28,6)"
    o = table(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))
    sx = F.sum(F.col("o_totalprice").cast(dec)).cast("double")
    sxx = F.sum(
        (F.col("o_totalprice") * F.col("o_totalprice")).cast(dec)
    ).cast("double")
    g = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        cnt.alias("n_g"), (sx / cnt).alias("m_g"), sxx.alias("ssq_g")
    )
    grand = o.agg(cnt.alias("n"), (sx / cnt).alias("m"))
    dm = F.col("m_g") - F.col("m")
    terms = g.crossJoin(F.broadcast(grand)).select(
        "n_g",
        F.round(F.col("n_g") * dm * dm, 6).cast("decimal(38,6)").alias("tb"),
        F.round(
            F.col("ssq_g") - F.col("n_g") * F.col("m_g") * F.col("m_g"), 6
        )
        .cast("decimal(38,6)")
        .alias("tw"),
    )
    red = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("tb").cast("double").alias("ssb"),
        F.sum("tw").cast("double").alias("ssw"),
    )
    ssb, ssw, k, n = F.col("ssb"), F.col("ssw"), F.col("k"), F.col("n")
    msw = ssw / (n - k)
    return red.select(
        k.cast("long").alias("k_groups"),
        n.cast("long").alias("n_total"),
        F.round(F.when(msw != 0.0, (ssb / (k - 1)) / msw), 6).alias("f_stat"),
        F.round(
            F.when((ssb + ssw) != 0.0, ssb / (ssb + ssw)), 6
        ).alias("eta_sq"),
    )


@query(
    "stats_mutual_information",
    oracle="""
    WITH joint AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             COUNT(*) AS cxy
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    mx AS (SELECT seg, SUM(cxy) AS cx FROM joint GROUP BY seg),
    my AS (SELECT pri, SUM(cxy) AS cy FROM joint GROUP BY pri),
    tot AS (SELECT SUM(cxy) AS n FROM joint),
    mi AS (
      SELECT CAST(SUM(CAST(ROUND(
               (CAST(j.cxy AS DOUBLE) / t.n)
               * ln(CAST(j.cxy AS DOUBLE) * t.n
                    / (CAST(mx.cx AS DOUBLE) * my.cy)), 12)
             AS DECIMAL(28,12))) AS DOUBLE) AS mi
      FROM joint j
      JOIN mx ON mx.seg = j.seg
      JOIN my ON my.pri = j.pri
      CROSS JOIN tot t
    ),
    hx AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(CAST(cx AS DOUBLE) / t.n) * ln(CAST(cx AS DOUBLE) / t.n),
               12) AS DECIMAL(28,12))) AS DOUBLE) AS h_seg
      FROM mx CROSS JOIN tot t
    ),
    hy AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(CAST(cy AS DOUBLE) / t.n) * ln(CAST(cy AS DOUBLE) / t.n),
               12) AS DECIMAL(28,12))) AS DOUBLE) AS h_pri
      FROM my CROSS JOIN tot t
    )
    SELECT CAST(t.n AS BIGINT) AS n_orders,
           ROUND(mi.mi, 6) AS mi_nats,
           ROUND(hx.h_seg, 6) AS h_seg,
           ROUND(hy.h_pri, 6) AS h_pri,
           ROUND(mi.mi / NULLIF(sqrt(hx.h_seg * hy.h_pri), 0.0), 6)
             AS nmi
    FROM tot t CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between customer market segment and
    order priority, with both marginal entropies and the normalized
    MI = I/√(H·H) — quantifying the dependence that
    ``stats_chi2_independence`` only tests for.

    Probabilities come from exact integer counts (every product stays
    under 2⁵³, so the doubles are exact); each of the ≤25 joint terms
    is rounded at 12 dp and decimal-summed, making the tiny reduction
    order-independent; ln on identical doubles is engine-identical
    (precedent: the Benford, PSI and survival oracles).

    Scale: one orders⋈customer join and a groupBy to a k×k cell table;
    everything after the joint counts is constant-size. Margins attach
    by BROADCAST joins, the scalar total by a broadcast 1-row cross
    join — the repo's scalar-attach idiom."""
    j = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
    )
    # r14 probe note: persisting this ≤25-row frame measured 1.5x
    # SLOWER (0.68 → 1.03 s floor) — the four consumer branches are
    # already deduplicated by runtime exchange reuse, so the persist
    # only added a cache-materialization job barrier. Left unpersisted.
    joint = j.groupBy("seg", "pri").agg(F.count(F.lit(1)).alias("cxy"))
    mx = joint.groupBy("seg").agg(F.sum("cxy").alias("cx"))
    my = joint.groupBy("pri").agg(F.sum("cxy").alias("cy"))
    tot = joint.agg(F.sum("cxy").alias("n"))

    def _dsum12(col):
        return F.sum(F.round(col, 12).cast("decimal(28,12)")).cast("double")

    nd = F.col("n").cast("double")
    mi_term = (F.col("cxy").cast("double") / nd) * F.log(
        F.col("cxy").cast("double") * nd
        / (F.col("cx").cast("double") * F.col("cy"))
    )
    mi = (
        joint.join(F.broadcast(mx), "seg")
        .join(F.broadcast(my), "pri")
        .crossJoin(F.broadcast(tot))
        .agg(_dsum12(mi_term).alias("mi"))
    )
    px = F.col("cx").cast("double") / nd
    hx = mx.crossJoin(F.broadcast(tot)).agg(_dsum12(-px * F.log(px)).alias("h_seg"))
    py = F.col("cy").cast("double") / nd
    hy = my.crossJoin(F.broadcast(tot)).agg(_dsum12(-py * F.log(py)).alias("h_pri"))
    den = F.sqrt(F.col("h_seg") * F.col("h_pri"))
    return (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("n").cast("long").alias("n_orders"),
            F.round(F.col("mi"), 6).alias("mi_nats"),
            F.round(F.col("h_seg"), 6).alias("h_seg"),
            F.round(F.col("h_pri"), 6).alias("h_pri"),
            F.round(F.when(den != 0.0, F.col("mi") / den), 6).alias("nmi"),
        )
    )


@query(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_EDGES_SQL},
    sym AS (
      SELECT u, v FROM edges
      UNION ALL
      SELECT v AS u, u AS v FROM edges
    ),
    p AS (
      SELECT du.deg AS dx, dv.deg AS dy
      FROM sym s
      JOIN deg du ON du.node = s.u
      JOIN deg dv ON dv.node = s.v
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(dx) AS sx, SUM(dy) AS sy, SUM(dx * dy) AS sxy,
             SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy
      FROM p
    )
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_endpoint_deg,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 0.0),
                 6) AS assortativity
    FROM m
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the 1995 co-purchase graph: the Pearson
    correlation of endpoint degrees over all directed edge slots
    (Newman's r) — positive means hubs prefer hubs, negative means
    hub-and-spoke structure. Complements the local view of
    ``graph_jaccard_link_prediction`` with one global mixing number.

    Degrees are exact integers from the symmetrized edge list; the five
    moment sums are exact int64 (shared ``_pearson_from_int_sums``
    kernel with ``stats_spearman_corr``), one double division at the
    end, NULL on a regular (constant-degree) graph.

    Scale: edges⋈deg twice (deg is a node-sized broadcast candidate) and
    a 1-row reduction; the edge list itself is the bounded per-order
    pair expansion shared with ``graph_triangle_count``."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    p = (
        sym.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("deg").alias("dx"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("deg").alias("dy"))),
            "v",
        )
        .select("dx", "dy")
    )
    m = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    return _pearson_from_int_sums(m, "assortativity").select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.round(F.col("sx").cast("double") / F.col("n"), 6).alias(
            "mean_endpoint_deg"
        ),
        "assortativity",
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
             SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    t AS (
      SELECT priority, day, rev,
             SUM(rev) OVER w AS tsum, COUNT(*) OVER w AS cnt
      FROM daily
      WINDOW w AS (PARTITION BY priority ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    f AS (
      SELECT priority, day % 7 AS dow, 7 * rev - tsum AS detr
      FROM t WHERE cnt = 7
    )
    SELECT priority, CAST(dow AS BIGINT) AS dow, COUNT(*) AS n_days,
           ROUND(CAST(SUM(detr) AS DOUBLE) / (7.0 * COUNT(*)), 6)
             AS seasonal_idx
    FROM f GROUP BY priority, dow
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue per
    order priority: trend = centered 7-day moving average (full windows
    only), seasonal index = mean detrended value per day-of-week slot
    (day mod 7, calendar-convention-free) — the decomposition whose
    seasonal-naive forecast ``ts_seasonal_naive_eval`` backtests.

    Decimal end-to-end: daily revenue stays decimal through the window
    sum, and the detrended value is the EXACT decimal 7·rev − Σ₇rev —
    the only double division is the final per-slot mean, rounded at
    6 dp. The moving-average windows are partitioned per priority
    (never a global single-task window, the shape tests/test_plans.py
    bans).

    Scale: one (priority, day) aggregate, one partitioned ±3-row
    window, one 35-row groupBy."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.expr("unix_timestamp(cast(o_orderdate as timestamp)) div 86400").alias(
            "day"
        ),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"))
    w7 = (
        Window.partitionBy("priority").orderBy("day").rowsBetween(-3, 3)
    )
    t = daily.select(
        "priority",
        "day",
        "rev",
        F.sum("rev").over(w7).alias("tsum"),
        F.count(F.lit(1)).over(w7).alias("cnt"),
    ).filter(F.col("cnt") == 7)
    f = t.select(
        "priority",
        (F.col("day") % 7).alias("dow"),
        (F.lit(7) * F.col("rev") - F.col("tsum")).alias("detr"),
    )
    return f.groupBy("priority", "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.sum("detr").cast("double") / (F.lit(7.0) * F.count(F.lit(1))), 6
        ).alias("seasonal_idx"),
    ).select(
        "priority", F.col("dow").cast("long").alias("dow"), "n_days", "seasonal_idx"
    )


#: neighbors kept per probe point
_KNN_K = 3


@query(
    "spatial_knn_grid",
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
    reps AS (
      SELECT s.s_suppkey, s.x, s.y,
             s.x // {_R} + o1.dx AS cx,
             s.y // {_R} + o2.dy AS cy
      FROM sup s
      CROSS JOIN (VALUES (-1), (0), (1)) o1(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) o2(dy)
    ),
    cand AS (
      SELECT c.c_custkey, r.s_suppkey,
             (c.x - r.x) * (c.x - r.x) + (c.y - r.y) * (c.y - r.y) AS d2
      FROM cust c
      JOIN reps r ON r.cx = c.x // {_R} AND r.cy = c.y // {_R}
      WHERE (c.x - r.x) * (c.x - r.x) + (c.y - r.y) * (c.y - r.y)
            <= {_R2}
    ),
    ranked AS (
      SELECT c_custkey, s_suppkey, d2,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY d2, s_suppkey) AS rn
      FROM cand
    )
    SELECT c_custkey, CAST(rn AS BIGINT) AS rn, s_suppkey,
           CAST(d2 AS BIGINT) AS d2
    FROM ranked WHERE rn <= {_KNN_K}
    """,
)
def spatial_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-nearest-neighbors within radius: for every customer, the
    {_KNN_K} nearest suppliers among those within {_R} centi-units,
    via the same grid trick as ``spatial_grid_join`` — replicate the
    SMALL side into its 3×3 cell neighborhood (cells are radius-sized,
    so the neighborhood provably contains every in-radius candidate),
    equi-join on cell id, then a per-probe top-k window. Ties break on
    supplier key; distances are exact int64 — no floats anywhere.

    Scale: the big side shuffles once on cell id, the window partitions
    by probe key (millions of small partitions, the shape window
    functions scale best at), and candidate lists are bounded by
    spatial density — never all-pairs."""
    cust = _with_coords(table(spark, sf_dir, "customer"), "c_custkey")
    sup = _with_coords(table(spark, sf_dir, "supplier"), "s_suppkey")
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    reps = (
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
    cand = (
        cust.join(
            F.broadcast(reps),
            (F.col("cx") == F.expr(f"x div {_R}"))
            & (F.col("cy") == F.expr(f"y div {_R}")),
        )
        .filter(d2 <= _R2)
        .select("c_custkey", "s_suppkey", d2.alias("d2"))
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .select(
            "c_custkey",
            F.col("rn").cast("long").alias("rn"),
            "s_suppkey",
            F.col("d2").cast("long").alias("d2"),
        )
    )
