"""Round-6 fifth batch: CUSUM change-point detection (the sequential
drift alarm PSI/KS can't give — they compare eras, CUSUM finds WHEN)
and top event trigram paths (the product-analytics path query beyond
the 2-step transition matrix).

CUSUM's recursion S_t = max(0, S_{t-1} + x_t − μ − k) is not a plain
prefix sum, but it closes over one: S_t = P_t − min(0, min_{j≤t} P_j)
where P is the running sum of the adjusted series — two per-group
windows instead of a sequential loop, the identity that makes CUSUM
distributable (and SQL-expressible for the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: CUSUM alarm threshold: h = _H_SIGMAS · σ(daily revenue), drift
#: allowance k = 0 (detect any sustained shift above the period mean)
_H_SIGMAS = 2.0


@query(
    "stats_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
             {dsum_sql('o_totalprice')} AS rev
      FROM orders GROUP BY 1, 2
    ),
    params AS (
      SELECT priority,
             COUNT(*) AS n_days,
             {dsum_sql('rev')} / COUNT(*) AS mu,
             sqrt({dsum_sql('(rev / 100000.0) * (rev / 100000.0)')}
                    / COUNT(*)
                  - ({dsum_sql('rev')} / COUNT(*) / 100000.0)
                    * ({dsum_sql('rev')} / COUNT(*) / 100000.0))
               * 100000.0 AS sigma
      FROM daily GROUP BY priority
    ),
    pref AS (
      SELECT d.priority, d.day, p.n_days, p.sigma,
             CAST(SUM(CAST(d.rev - p.mu AS DECIMAL(28,6))) OVER w
                  AS DOUBLE) AS pt
      FROM daily d JOIN params p ON p.priority = d.priority
      WINDOW w AS (PARTITION BY d.priority ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    pref2 AS (
      SELECT priority, day, n_days, sigma, pt,
             LEAST(CAST(0 AS DOUBLE),
                   MIN(pt) OVER (PARTITION BY priority ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)) AS run_min
      FROM pref
    ),
    scored AS (
      SELECT priority, day, n_days,
             pt - run_min AS s_t,
             {_H_SIGMAS!r} * sigma AS h
      FROM pref2
    )
    SELECT priority,
           MAX(n_days) AS n_days,
           ROUND(MAX(s_t), 6) AS max_cusum,
           CAST(MIN(CASE WHEN s_t > h THEN day END) AS BIGINT)
             AS first_alarm_day
    FROM scored GROUP BY priority
    """,
)
def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection on daily revenue per
    order priority: S_t = max(0, S_{{t-1}} + (x_t − μ)), alarm when S_t
    exceeds h = 2σ — the sequential monitor that localizes
    WHEN a sustained upward shift began, where PSI/KS only say THAT two
    eras differ.

    The recursion is rewritten as S_t = P_t − min(0, running-min of P)
    — two stacked windows per priority (running sum, then running min
    OF that sum), both PARTITIONED (never global). The running sum adds
    doubles strictly left-to-right in day order in both engines, so
    every P_t is bit-identical; μ and σ come from decimal-exact moment
    sums. Alarm day is an exact integer; max CUSUM rounds at 6 dp.
    Scale: one (priority, day) aggregate of orders, then windows over
    the bounded daily frame."""
    o = table(spark, sf_dir, "orders")
    dec = "decimal(28,6)"
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.expr("unix_timestamp(cast(o_orderdate as timestamp)) div 86400").alias(
            "day"
        ),
    ).agg(F.sum(F.col("o_totalprice").cast(dec)).cast("double").alias("rev"))
    # r14 scale hardening (sf1): the raw second moment Σrev² is ~2.4e19
    # at sf1 — past every decimal→double cast's engine-identity bound,
    # and a 1-ulp σ drift moves the alarm threshold discontinuously.
    # Scaling rev down by 10⁵ first keeps Σ(rev/10⁵)²·10⁶ < 2⁵³ (good
    # to ~sf5), and every op in the σ expression is then an identical
    # IEEE op in both engines. The prefix sum likewise routes through
    # decimal: DuckDB's windowed double SUM is segment-tree-ordered
    # (not left-to-right like Spark's), and at |pt| ~ 1e9 the tree-vs-
    # sequential ulp noise crosses the 6-dp output grid; an exact
    # decimal window sum is order-free in both engines.
    srev = F.sum(F.col("rev").cast(dec)).cast("double")
    rs = F.col("rev") / F.lit(100000.0)
    srs2 = F.sum((rs * rs).cast(dec)).cast("double")
    cnt = F.count(F.lit(1))
    mu = srev / cnt
    params = daily.groupBy("priority").agg(
        cnt.alias("n_days"),
        mu.alias("mu"),
        (
            F.sqrt(
                srs2 / cnt - (mu / F.lit(100000.0)) * (mu / F.lit(100000.0))
            )
            * F.lit(100000.0)
        ).alias("sigma"),
    )
    wrun = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = daily.join(F.broadcast(params), "priority")
    pref = joined.select(
        "priority",
        "day",
        "n_days",
        "sigma",
        F.sum((F.col("rev") - F.col("mu")).cast(dec))
        .over(wrun)
        .cast("double")
        .alias("pt"),
    )
    pref = pref.withColumn(
        "run_min",
        F.least(F.lit(0.0), F.min("pt").over(wrun)),
    )
    scored = pref.select(
        "priority",
        "day",
        "n_days",
        (F.col("pt") - F.col("run_min")).alias("s_t"),
        (F.lit(_H_SIGMAS) * F.col("sigma")).alias("h"),
    )
    return scored.groupBy("priority").agg(
        F.max("n_days").alias("n_days"),
        F.round(F.max("s_t"), 6).alias("max_cusum"),
        F.min(F.when(F.col("s_t") > F.col("h"), F.col("day")))
        .cast("bigint")
        .alias("first_alarm_day"),
    )


#: top paths reported (deterministic tie-break on the path string)
_PATHS_K = 20


@query(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path,
             COUNT(*) AS n
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n FROM paths
    ORDER BY n DESC, path
    LIMIT {_PATHS_K}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 three-step event paths across all user journeys —
    the Sankey/flow query product analytics runs beyond the pairwise
    transition matrix (events_transition_matrix): trigrams expose the
    detour patterns pairs can't (view>error>view vs view>view>error).

    Trigrams come from two LEADs over the per-user (ts, event_id)
    window — strictly partitioned by user, the same total order the
    sessionize family pins — then one count shuffle on the path string
    and a top-k with the (n DESC, path ASC) deterministic tie-break.
    Scale: path cardinality is |event_types|³ (bounded, here ≤125), so
    the count pre-aggregates map-side and the top-k is a TakeOrdered
    over a tiny frame."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    return paths.orderBy(F.desc("n"), F.asc("path")).limit(_PATHS_K)
