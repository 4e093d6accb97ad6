"""Customer-lifecycle survival analysis: the Kaplan-Meier estimator
over customer order-history lifetimes — time-to-churn with
right-censoring, the curve a retention team actually reads, computed
as two aggregate passes and one ordered window.

Engine parity: lifetimes and risk-set counts are exact integers; the
survival curve is exp(Σ ln(1 - d/n)) accumulated in the WINDOW'S
order (sequential by definition, so both engines add the same terms in
the same order), rounded to 6 dp — the tf-idf precedent for ln/exp
parity. A zero factor (everyone at risk churns at t) would be
ln(0) — an ERROR in DuckDB, NULL in Spark — so it is excluded from
the log-sum and the curve is forced to 0 from that point by a
cumulative zero-flag, identically in both engines.

Scale: per-customer lifetimes are one partial-agg pass over orders;
the KM frame has one row per DISTINCT duration (bounded by the
observation window in days — ~800 here — not by customers), so the
ordered window is tiny by construction. At 100 TB nothing after the
first groupBy sees more than |distinct durations| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "customer_survival_km",
    oracle="""
    WITH ref AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
    cust AS (
      SELECT o_custkey,
             date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
               AS duration_days,
             CASE WHEN MAX(o_orderdate)
                       < (SELECT max_d FROM ref) - INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS churned
      FROM orders GROUP BY o_custkey
    ),
    per_t AS (
      SELECT duration_days,
             CAST(SUM(churned) AS BIGINT) AS n_churned,
             CAST(COUNT(*) - SUM(churned) AS BIGINT) AS n_censored,
             COUNT(*) AS n_leaving
      FROM cust GROUP BY duration_days
    ),
    risk AS (
      SELECT duration_days, n_churned, n_censored,
             (SELECT COUNT(*) FROM cust)
               - COALESCE(SUM(n_leaving) OVER (ORDER BY duration_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM per_t
    ),
    curve AS (
      SELECT duration_days, n_churned, n_censored,
             CAST(n_at_risk AS BIGINT) AS n_at_risk,
             SUM(CASE WHEN n_churned = n_at_risk THEN 1 ELSE 0 END)
               OVER w AS cum_zero,
             SUM(CASE WHEN n_churned = 0 OR n_churned = n_at_risk THEN 0.0
                      ELSE ln(1.0 - CAST(n_churned AS DOUBLE) / n_at_risk)
                 END) OVER w AS log_surv
      FROM risk
      WINDOW w AS (ORDER BY duration_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT duration_days, n_at_risk, n_churned, n_censored,
           ROUND(CASE WHEN cum_zero > 0 THEN 0.0 ELSE exp(log_surv) END, 6)
             AS survival
    FROM curve
    """,
)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer order-history lifetimes:
    a customer's duration is days between their first and last order;
    customers still ordering within 90 days of the corpus end are
    right-CENSORED (they leave the risk set without counting as churn —
    the distinction that makes KM correct where a naive
    churn-rate-by-age is biased).

    S(t) = Π_{t_i ≤ t} (1 - d_i / n_i) with d = churners at t_i and
    n = customers still at risk; the product is an ordered log-sum (see
    module doc for the zero-factor guard). Output: one row per distinct
    lifetime (~800 at any scale — bounded by the calendar, not the
    customer count) with the risk set, events, censors, and survival
    probability."""
    o = table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("max_d"))
    cust = (
        o.groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("first_d"), F.max("o_orderdate").alias("last_d"))
        .crossJoin(F.broadcast(ref))
        .select(
            F.datediff(F.col("last_d"), F.col("first_d")).alias("duration_days"),
            F.when(
                F.col("last_d") < F.expr("max_d - INTERVAL 90 DAY"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("churned"),
        )
    )
    per_t = cust.groupBy("duration_days").agg(
        F.sum("churned").alias("n_churned"),
        (F.count(F.lit(1)) - F.sum("churned")).alias("n_censored"),
        F.count(F.lit(1)).alias("n_leaving"),
    )
    total = cust.agg(F.count(F.lit(1)).alias("n_total"))
    # bounded-window: the KM life table runs over DISTINCT durations —
    # date-domain-bounded (≤ corpus span in days, ~2.4k rows even at
    # 100 TB) — and the survival product chains floats left-to-right,
    # which a partition-offset decomposition would re-associate
    w_prev = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = per_t.crossJoin(F.broadcast(total)).select(
        "duration_days",
        "n_churned",
        "n_censored",
        (
            F.col("n_total")
            - F.coalesce(F.sum("n_leaving").over(w_prev), F.lit(0))
        ).alias("n_at_risk"),
    )
    # bounded-window: same date-domain-bounded distinct-duration frame
    w = Window.orderBy("duration_days").rowsBetween(Window.unboundedPreceding, 0)
    zero = F.when(F.col("n_churned") == F.col("n_at_risk"), F.lit(1)).otherwise(
        F.lit(0)
    )
    log_term = (
        F.when(
            (F.col("n_churned") == 0)
            | (F.col("n_churned") == F.col("n_at_risk")),
            F.lit(0.0),
        ).otherwise(
            F.log(1.0 - F.col("n_churned").cast("double") / F.col("n_at_risk"))
        )
    )
    curve = risk.select(
        "duration_days",
        "n_churned",
        "n_censored",
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.sum(zero).over(w).alias("cum_zero"),
        F.sum(log_term).over(w).alias("log_surv"),
    )
    return curve.select(
        "duration_days",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.round(
            F.when(F.col("cum_zero") > 0, F.lit(0.0)).otherwise(
                F.exp("log_surv")
            ),
            6,
        ).alias("survival"),
    )
