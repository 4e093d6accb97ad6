"""Two-sample statistical inference: Welch's unequal-variance t-test
and the Mann-Whitney rank-sum test, both as one-pass (or one-sort)
distributed aggregations — the A/B-measurement tier above
events_ab_lift's point estimates and stats_chi2_independence's
categorical test.

Engine-parity ground rules (functions/determinism.py):

- Moments come from EXACT integer sums: o_totalprice has two decimals,
  so price-in-cents is an exact BIGINT and its square an exact
  DECIMAL(38,0); both engines sum these without rounding, and the
  (few) double operations that combine the exact sums are the same
  textual expression tree in both engines, rounded to 6 dp.
- Rank sums use average ranks over a unique total order; ties get
  (rank sum / count) in exact arithmetic before any double division.

Scale: both tests reduce to per-group COUNT/SUM aggregates —
map-side-combined, one exchange on the (tiny) group key. Mann-Whitney
additionally needs a global rank, computed here per-value (groupBy
value → cumulative counts over the ~60k distinct price points) rather
than a single-partition row_number, so the sort parallelizes and no
task sees more than its hash range of distinct values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: exact integer cents of a 2-dp double price
_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@query(
    "stats_ttest_welch",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             COUNT(*) AS n,
             CAST(SUM({_CENTS}) AS BIGINT) AS s1,
             CAST(SUM(CAST({_CENTS} AS DECIMAL(19,0))
                      * CAST({_CENTS} AS DECIMAL(19,0))) AS DOUBLE) AS s2
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_orderpriority
    ),
    m AS (
      SELECT grp, n,
             CAST(s1 AS DOUBLE) / 100.0 / n AS mean,
             (s2 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
               / (n - 1) / 10000.0 AS var
      FROM g
    ),
    ab AS (
      SELECT a.n AS n_urgent, b.n AS n_low,
             a.mean AS mean_urgent, b.mean AS mean_low,
             a.var / a.n + b.var / b.n AS se2,
             a.var AS va, b.var AS vb
      FROM m a, m b WHERE a.grp = '1-URGENT' AND b.grp = '5-LOW'
    )
    SELECT n_urgent, n_low,
           ROUND(mean_urgent, 6) AS mean_urgent,
           ROUND(mean_low, 6) AS mean_low,
           ROUND((mean_urgent - mean_low) / SQRT(se2), 6) AS t_stat,
           ROUND(se2 * se2 / ((va / n_urgent) * (va / n_urgent) / (n_urgent - 1)
                 + (vb / n_low) * (vb / n_low) / (n_low - 1)), 6) AS welch_df
    FROM ab
    """,
)
def stats_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does mean order value differ
    between URGENT and LOW priority orders? Returns group means, the
    t statistic, and the Welch–Satterthwaite degrees of freedom.

    One filtered scan → one 2-group aggregate (map-side combined) →
    a 2-row broadcast self-pair. The sums feeding mean/variance are
    exact integers (cents and cents², see module doc), so the handful
    of double ops after them are bit-reproducible across engines; at
    100 TB this is a single partial-agg pass over the fact table with
    two reducer rows."""
    cents = F.expr(_CENTS)
    g = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s1"),
            F.sum(
                cents.cast("decimal(19,0)") * cents.cast("decimal(19,0)")
            )
            .cast("double")
            .alias("s2"),
        )
    )
    m = g.select(
        "grp",
        "n",
        (F.col("s1").cast("double") / 100.0 / F.col("n")).alias("mean"),
        (
            (
                F.col("s2")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
            )
            / (F.col("n") - 1)
            / 10000.0
        ).alias("var"),
    )
    a = m.filter(F.col("grp") == "1-URGENT").alias("a")
    b = m.filter(F.col("grp") == "5-LOW").alias("b")
    ab = a.crossJoin(F.broadcast(b)).select(
        F.col("a.n").alias("n_urgent"),
        F.col("b.n").alias("n_low"),
        F.col("a.mean").alias("mean_urgent"),
        F.col("b.mean").alias("mean_low"),
        (F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")).alias("se2"),
        F.col("a.var").alias("va"),
        F.col("b.var").alias("vb"),
    )
    return ab.select(
        "n_urgent",
        "n_low",
        F.round("mean_urgent", 6).alias("mean_urgent"),
        F.round("mean_low", 6).alias("mean_low"),
        F.round(
            (F.col("mean_urgent") - F.col("mean_low")) / F.sqrt("se2"), 6
        ).alias("t_stat"),
        F.round(
            F.col("se2")
            * F.col("se2")
            / (
                (F.col("va") / F.col("n_urgent"))
                * (F.col("va") / F.col("n_urgent"))
                / (F.col("n_urgent") - 1)
                + (F.col("vb") / F.col("n_low"))
                * (F.col("vb") / F.col("n_low"))
                / (F.col("n_low") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


@query(
    "stats_rank_sum_u",
    oracle=f"""
    WITH pool AS (
      SELECT o_orderpriority AS grp, {_CENTS} AS cents
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    by_val AS (
      SELECT cents, grp, COUNT(*) AS c FROM pool GROUP BY cents, grp
    ),
    val AS (
      SELECT cents, SUM(c) AS cnt FROM by_val GROUP BY cents
    ),
    ranked AS (
      SELECT cents,
             SUM(cnt) OVER (ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cnt AS below,
             cnt
      FROM val
    ),
    credit AS (
      -- average rank of a tied block = below + (cnt + 1)/2, exact in halves
      SELECT b.grp, b.c, r.below * 2 + r.cnt + 1 AS two_avg_rank
      FROM by_val b JOIN ranked r ON r.cents = b.cents
    ),
    agg AS (
      SELECT grp, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * two_avg_rank) AS BIGINT) AS two_rank_sum
      FROM credit GROUP BY grp
    )
    SELECT a.n AS n_urgent, b.n AS n_low,
           CAST((a.two_rank_sum - 2 * a.n * (a.n + 1) // 2) AS BIGINT)
             AS u2_urgent,
           ROUND((CAST(a.two_rank_sum AS DOUBLE) / 2
                  - a.n * (a.n + 1) / 2.0
                  - CAST(a.n AS DOUBLE) * b.n / 2.0)
                 / SQRT(CAST(a.n AS DOUBLE) * b.n * (a.n + b.n + 1) / 12.0), 6)
             AS z_approx
    FROM agg a, agg b WHERE a.grp = '1-URGENT' AND b.grp = '5-LOW'
    """,
)
def stats_rank_sum_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test on order value, URGENT vs LOW —
    the non-parametric sibling of stats_ttest_welch, robust to the
    heavy right tail of order totals.

    Ranks are computed value-wise, not row-wise: group by the ~n
    distinct cent values, cumulative-sum their counts for the
    "ranks below" prefix, and credit each tied block its average rank.
    Everything up to the final z is integer arithmetic in doubled
    units (2×avg-rank is always an integer), so rank bookkeeping is
    exact in both engines. The normal approximation omits the tie
    correction in σ_U (same formula both sides, so parity holds;
    documented accuracy trade).

    Scale: the prefix sum runs over distinct VALUES (bounded by price
    granularity), not rows, and uses the range-partitioned total-order
    kernel (functions/total_order.py) — parallel even if the value
    domain widens — while the raw scan aggregates map-side."""
    cents = F.expr(_CENTS)
    pool = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(F.col("o_orderpriority").alias("grp"), cents.alias("cents"))
    )
    # persist the value-wise counts: they feed BOTH the distinct-value
    # prefix-sum branch and the credit join, and the final a×b cross
    # references the whole cascade twice — without a barrier the orders
    # scan + groupBy re-evaluates 3× (r14 plan audit: 20 exchanges)
    by_val = (
        pool.groupBy("cents", "grp").agg(F.count(F.lit(1)).alias("c")).persist()
    )
    val = by_val.groupBy("cents").agg(F.sum("c").alias("cnt"))
    ranked = attach_global_order(
        val, [F.asc("cents")], cumsums=[("cnt", "__cum")]
    ).select(
        "cents",
        (F.col("__cum") - F.col("cnt")).alias("below"),
        "cnt",
    )
    credit = by_val.join(ranked, "cents").select(
        "grp",
        "c",
        (F.col("below") * 2 + F.col("cnt") + 1).alias("two_avg_rank"),
    )
    agg = credit.groupBy("grp").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("two_avg_rank")).alias("two_rank_sum"),
    ).persist()
    a = agg.filter(F.col("grp") == "1-URGENT").alias("a")
    b = agg.filter(F.col("grp") == "5-LOW").alias("b")
    na, nb = F.col("a.n"), F.col("b.n")
    return a.crossJoin(F.broadcast(b)).select(
        na.alias("n_urgent"),
        nb.alias("n_low"),
        F.expr(
            "CAST(a.two_rank_sum - 2 * a.n * (a.n + 1) div 2 AS BIGINT)"
        ).alias("u2_urgent"),
        F.round(
            (
                F.col("a.two_rank_sum").cast("double") / 2
                - na * (na + 1) / 2.0
                - na.cast("double") * nb / 2.0
            )
            / F.sqrt(na.cast("double") * nb * (na + nb + 1) / 12.0),
            6,
        ).alias("z_approx"),
    )


#: exact-decimal casts for the OLS design matrix: quantity is integer,
#: discount has 2 dp, extendedprice 2 dp — all products below are exact
#: in DECIMAL(38,6), the moment-sum scheme agg_regression_ols proved out
_Q = "CAST(l_quantity AS DECIMAL(18,2))"
_D = "CAST(l_discount AS DECIMAL(18,2))"
_Y = "CAST(l_extendedprice AS DECIMAL(18,2))"


@query(
    "stats_ols_multivariate",
    oracle=f"""
    WITH m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM({_Q}) AS DOUBLE) AS sq,
             CAST(SUM({_D}) AS DOUBLE) AS sd,
             CAST(SUM({_Y}) AS DOUBLE) AS sy,
             CAST(SUM({_Q} * {_Q}) AS DOUBLE) AS sqq,
             CAST(SUM({_Q} * {_D}) AS DOUBLE) AS sqd,
             CAST(SUM({_D} * {_D}) AS DOUBLE) AS sdd,
             CAST(SUM({_Q} * {_Y}) AS DOUBLE) AS sqy,
             CAST(SUM({_D} * {_Y}) AS DOUBLE) AS sdy,
             CAST(SUM({_Y} * {_Y}) AS DOUBLE) AS syy
      FROM lineitem
    ),
    c AS (
      SELECT n, sy,
             sqq - sq * sq / n AS a11,
             sqd - sq * sd / n AS a12,
             sdd - sd * sd / n AS a22,
             sqy - sq * sy / n AS b1,
             sdy - sd * sy / n AS b2,
             syy - sy * sy / n AS syy_c,
             sq / n AS mq, sd / n AS md, sy / n AS my
      FROM m
    ),
    sol AS (
      SELECT n, my, mq, md, syy_c, b1, b2, a11, a12, a22,
             (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) AS beta_qty,
             (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) AS beta_disc
      FROM c
    )
    SELECT n,
           ROUND(beta_qty, 6) AS beta_qty,
           ROUND(beta_disc, 6) AS beta_disc,
           ROUND(my - beta_qty * mq - beta_disc * md, 6) AS intercept,
           ROUND((beta_qty * b1 + beta_disc * b2) / syy_c, 6) AS r2
    FROM sol
    """,
)
def stats_ols_multivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS by normal equations: extendedprice ~ quantity +
    discount, solved in closed form (2×2 Cramer) from ONE pass of
    exact-decimal moment sums — multivariate regression as a
    map-side-combined aggregate, no iterative solver, no driver-side
    matrix.

    Every Σx, Σx², Σxy is exact (2-dp decimals, products exact in
    decimal(38,4-6)); the centered normal equations and the 2×2 solve
    are a handful of double ops mirrored textually in the oracle,
    rounded 6 dp. R² comes from the same moments. This is the k-feature
    pattern at any scale: k(k+3)/2 moment sums in one partial-agg pass,
    then an O(k³) closed-form solve on ONE reducer row — at 100 TB the
    data pass is the whole cost and it is a single aggregate."""
    li = table(spark, sf_dir, "lineitem")
    q, d, y = F.expr(_Q), F.expr(_D), F.expr(_Y)
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(d * d).cast("double").alias("sdd"),
        F.sum(q * y).cast("double").alias("sqy"),
        F.sum(d * y).cast("double").alias("sdy"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    c = m.select(
        "n",
        "sy",
        (F.col("sqq") - F.col("sq") * F.col("sq") / F.col("n")).alias("a11"),
        (F.col("sqd") - F.col("sq") * F.col("sd") / F.col("n")).alias("a12"),
        (F.col("sdd") - F.col("sd") * F.col("sd") / F.col("n")).alias("a22"),
        (F.col("sqy") - F.col("sq") * F.col("sy") / F.col("n")).alias("b1"),
        (F.col("sdy") - F.col("sd") * F.col("sy") / F.col("n")).alias("b2"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("syy_c"),
        (F.col("sq") / F.col("n")).alias("mq"),
        (F.col("sd") / F.col("n")).alias("md"),
        (F.col("sy") / F.col("n")).alias("my"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    sol = c.select(
        "n",
        "my",
        "mq",
        "md",
        "syy_c",
        "b1",
        "b2",
        ((F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det).alias(
            "beta_qty"
        ),
        ((F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / det).alias(
            "beta_disc"
        ),
    )
    return sol.select(
        "n",
        F.round("beta_qty", 6).alias("beta_qty"),
        F.round("beta_disc", 6).alias("beta_disc"),
        F.round(
            F.col("my")
            - F.col("beta_qty") * F.col("mq")
            - F.col("beta_disc") * F.col("md"),
            6,
        ).alias("intercept"),
        F.round(
            (F.col("beta_qty") * F.col("b1") + F.col("beta_disc") * F.col("b2"))
            / F.col("syy_c"),
            6,
        ).alias("r2"),
    )


@query(
    "stats_gini_lorenz",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey, CAST(SUM({_CENTS}) AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rn,
             SUM(rev) OVER (ORDER BY rev, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev
      FROM cust
    ),
    tot AS (
      SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS total,
             CAST(SUM(CAST(rn AS BIGINT) * rev) AS BIGINT) AS weighted
      FROM ranked
    ),
    deciles AS (
      SELECT ((rn - 1) * 10) // (SELECT n FROM tot) + 1 AS decile,
             MAX(cum_rev) AS cum_rev_end
      FROM ranked GROUP BY 1
    )
    SELECT d.decile,
           ROUND(CAST(d.cum_rev_end AS DOUBLE) / t.total, 6)
             AS cum_revenue_share,
           ROUND((2.0 * t.weighted) / (CAST(t.n AS DOUBLE) * t.total)
                 - (t.n + 1.0) / t.n, 6) AS gini
    FROM deciles d CROSS JOIN tot t
    """,
)
def stats_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Lorenz curve at customer deciles plus
    the Gini coefficient — "what share of revenue do the bottom k/10 of
    customers generate", the inequality statistic behind every
    power-user analysis.

    Gini via the exact rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    revenue-ascending ranks (unique tie-break on custkey): every input
    is an exact integer (cents, ranks, their products summed as
    BIGINT — max ~n·rank·rev ≈ 1e17 at sf0.1, inside int64), so the
    two final divisions are the only float ops, mirrored textually.
    Shape: one partial-agg pass over orders, then the range-partitioned
    exact total order (functions/total_order.py) over the per-customer
    frame — the frame grows with |customers|, so a partitionless window
    would be the single-task trap; rank and the cum-revenue prefix both
    come from the distributed kernel (integer sums stay exact under the
    partition-offset decomposition). Decile bucketing is integer
    arithmetic on the row number — no NTILE needed, edges exact."""
    cents = F.expr(_CENTS)
    cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev"))
    )
    ranked = attach_global_order(
        cust,
        [F.asc("rev"), F.asc("o_custkey")],
        rn="rn",
        cumsums=[("rev", "cum_rev")],
    ).select("rev", "rn", "cum_rev")
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("total"),
        F.sum(F.col("rn").cast("bigint") * F.col("rev")).alias("weighted"),
    )
    deciles = (
        ranked.crossJoin(F.broadcast(tot.select("n")))
        .groupBy(
            F.expr("((rn - 1) * 10) div n + 1").alias("decile")
        )
        .agg(F.max("cum_rev").alias("cum_rev_end"))
    )
    return deciles.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.round(F.col("cum_rev_end").cast("double") / F.col("total"), 6).alias(
            "cum_revenue_share"
        ),
        F.round(
            (2.0 * F.col("weighted")) / (F.col("n").cast("double") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@query(
    "stats_benford_first_digit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST({_CENTS} AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE {_CENTS} > 0
    ),
    obs AS (
      SELECT d, COUNT(*) AS c FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs)
    SELECT d AS first_digit, c AS n_observed,
           ROUND(CAST(c AS DOUBLE) / t.n, 6) AS observed_freq,
           ROUND(ln(1.0 + 1.0 / d) / ln(10.0), 6) AS benford_freq,
           ROUND(CAST(c AS DOUBLE) / t.n
                 - ln(1.0 + 1.0 / d) / ln(10.0), 6) AS deviation
    FROM obs CROSS JOIN tot t
    """,
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order amounts — the
    forensic data-quality check that flags fabricated or truncated
    monetary data: natural multi-scale amounts follow
    P(d) = log10(1 + 1/d); a synthetic uniform distribution (like these
    fixtures') deviates visibly, which is exactly what the deviation
    column surfaces.

    First digit via string head of the exact integer cents (no float
    log tricks on the extraction path); expected frequencies via
    ln ratios mirrored textually. One partial-agg pass, nine reducer
    rows."""
    cents = F.expr(_CENTS)
    digits = (
        table(spark, sf_dir, "orders")
        .filter(cents > 0)
        .select(
            F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("d")
        )
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    tot = obs.agg(F.sum("c").alias("n"))
    benford = F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        F.col("c").alias("n_observed"),
        F.round(F.col("c").cast("double") / F.col("n"), 6).alias("observed_freq"),
        F.round(benford, 6).alias("benford_freq"),
        F.round(F.col("c").cast("double") / F.col("n") - benford, 6).alias(
            "deviation"
        ),
    )


#: Poisson(1) CDF thresholds scaled to the integer hash modulus — the
#: weight w for resample b is the count of thresholds BELOW the hash
#: draw, giving P(w=k) = e^-1/k! exactly as integer comparisons
_BOOT_MOD = 1000003
_BOOT_T = (367879, 735758, 919698, 981011, 996340)  # floor(CDF_k * MOD)
_BOOT_B = 32
#: key-entropy modulus for the weight hash: a prime near 2^31.6 chosen
#: so (p-1) * 2654435761 stays inside int64 in BOTH engines (Spark
#: wraps silently on overflow, DuckDB raises — the product must not
#: overflow on either side). 3221225472 * 2654435761 ≈ 8.55e18 < 2^63;
#: any prime up to ~3.474e9 would also fit, this one is the familiar
#: NTT prime 3 * 2^30 + 1.
#: Keys collide on the weight VECTOR only when they share a residue
#: mod ~3.2e9 — negligible correlation even at 10^10 orders, vs the
#: old % 100000 which repeated vectors every 100k keys.
_BOOT_KEYMOD = 3221225473


@query(
    "stats_bootstrap_poisson_ci",
    oracle=f"""
    WITH draws AS (
      SELECT b.b,
             {_CENTS} AS cents,
             ((o_orderkey % {_BOOT_KEYMOD}) * 2654435761
              + b.b * 2246822519) % {_BOOT_MOD} AS u
      FROM orders
      CROSS JOIN (SELECT UNNEST(range(0, {_BOOT_B})) AS b) b
    ),
    weighted AS (
      SELECT b,
             CASE WHEN u < {_BOOT_T[0]} THEN 0
                  WHEN u < {_BOOT_T[1]} THEN 1
                  WHEN u < {_BOOT_T[2]} THEN 2
                  WHEN u < {_BOOT_T[3]} THEN 3
                  WHEN u < {_BOOT_T[4]} THEN 4
                  ELSE 5 END AS w,
             cents
      FROM draws
    ),
    means AS (
      SELECT b,
             CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100.0 AS mean_b
      FROM weighted GROUP BY b HAVING SUM(w) > 0
    ),
    pt AS (
      SELECT CAST(SUM({_CENTS}) AS DOUBLE) / COUNT(*) / 100.0 AS point_mean
      FROM orders
    )
    SELECT (SELECT COUNT(*) FROM means) AS n_resamples,
           ROUND((SELECT point_mean FROM pt), 6) AS point_mean,
           ROUND((SELECT quantile_cont(mean_b, 0.025) FROM means), 6) AS ci_lo,
           ROUND((SELECT quantile_cont(mean_b, 0.975) FROM means), 6) AS ci_hi,
           ROUND((SELECT stddev_samp(mean_b) FROM means), 6) AS boot_se
    """,
)
def stats_bootstrap_poisson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for mean order value via the
    POISSON BOOTSTRAP — the distributed-systems formulation: instead of
    resampling rows (impossible without a global index), every row
    draws an independent Poisson(1) weight per resample, so the whole
    bootstrap is one map-side expansion + a (resample)-keyed aggregate.
    This is how bootstrap CIs are actually computed on clusters.

    Fully deterministic: the Poisson draw is integer hash arithmetic
    (multiplicative hash of the key reduced mod _BOOT_KEYMOD ≈ 2^31.6
    — full key entropy below ~3.2e9 orders, and only residue-colliding
    keys beyond that share a weight vector — compared against
    pre-scaled CDF thresholds, P(w=k) = e^-1/k! to 6 digits), weights
    and weighted sums are exact integers, and the only float ops are
    the final per-resample division and the CI quantiles over
    {_BOOT_B} means (shared interpolation definition). At 100 TB the
    ×{_BOOT_B} expansion is map-side (no shuffle of raw rows per
    resample — the aggregate combines partials per b), reducer state is
    {_BOOT_B} rows."""
    cents = F.expr(_CENTS)
    b_col = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    draws = table(spark, sf_dir, "orders").select(
        cents.alias("cents"), F.col("o_orderkey"), b_col
    )
    u = (
        (F.col("o_orderkey") % _BOOT_KEYMOD) * 2654435761
        + F.col("b") * 2246822519
    ) % _BOOT_MOD
    w = (
        F.when(u < _BOOT_T[0], 0)
        .when(u < _BOOT_T[1], 1)
        .when(u < _BOOT_T[2], 2)
        .when(u < _BOOT_T[3], 3)
        .when(u < _BOOT_T[4], 4)
        .otherwise(5)
    )
    means = (
        draws.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            (F.col("swc").cast("double") / F.col("sw") / 100.0).alias("mean_b")
        )
    )
    pt = table(spark, sf_dir, "orders").agg(
        (F.sum(cents).cast("double") / F.count(F.lit(1)) / 100.0).alias(
            "point_mean"
        )
    )
    summary = means.agg(
        F.count(F.lit(1)).alias("n_resamples"),
        F.round(F.expr("percentile(mean_b, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(mean_b, 0.975)"), 6).alias("ci_hi"),
        F.round(F.stddev_samp("mean_b"), 6).alias("boot_se"),
    )
    return summary.crossJoin(F.broadcast(pt)).select(
        "n_resamples",
        F.round("point_mean", 6).alias("point_mean"),
        "ci_lo",
        "ci_hi",
        "boot_se",
    )
