"""Ordered-event analytics round 4: Markov transitions, cumulative
distinct users, forward as-of join with tolerance, and OHLC resampling.

All four run on the events stream table and share one discipline: any
"order of arrival" semantics is pinned to the total order
``(ts, event_id)`` — the same tie-break law the streaming family uses
(streaming/batch_semantics.py) — so results are identical across
engines, partitionings, and reruns.

Scale: every operator here is one shuffle on a bounded key
(user_id / event_type / hour). Per-user windows assume a user's history
fits an executor — the standard sessionization contract; a 100 TB run
partitions by user and sorts within partitions, which is exactly the
plan Spark produces for these window specs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum, dsum_sql
from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "events_transition_matrix",
    oracle="""
    WITH nxt AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM nxt WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY event_type), 6) AS p
    FROM pairs
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered pair of adjacent events per user, the transition count and
    conditional probability P(next | current).

    The adjacency comes from LEAD over the (ts, event_id) total order;
    the probability normalizes within the source state over the tiny
    5×5 pair table, not the raw events. Scale: one shuffle by user for
    the lag, one map-side-combined count — the classic two-stage
    sessionization shape."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(wt), 6).alias("p"),
    )


@query(
    "events_cum_distinct_users",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
    ), per_day AS (
      SELECT day, COUNT(*) AS new_users FROM first_day GROUP BY day
    )
    SELECT CAST(day AS TIMESTAMP) AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM per_day
    """,
)
def events_cum_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth curve — via the
    first-touch rewrite: a user contributes to the cumulative count
    exactly on their first-ever day, so running COUNT(DISTINCT) over an
    expanding frame (quadratic state, unbounded memory) collapses to
    min-per-user + running SUM over the tiny per-day frame.

    Scale: the expensive step is one groupBy(user_id) min — map-side
    combined, one shuffle; the window runs over ≤30 rows. This rewrite
    is THE way to compute cumulative-distinct at 100 TB."""
    ev = table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    per_day = first_day.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    return attach_global_order(
        per_day, [F.asc("day")], cumsums=[("new_users", "cum_users")]
    ).select(
        # date -> midnight timestamp on both sides (see win_streak note)
        F.col("day").cast("timestamp_ntz").alias("day"),
        "new_users",
        "cum_users",
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT err.event_id, err.user_id,
           MIN(p.ts) AS next_purchase_ts,
           CAST(date_diff('second', err.ts, MIN(p.ts)) AS BIGINT) AS gap_s
    FROM events err
    JOIN events p
      ON p.user_id = err.user_id
     AND p.event_type = 'purchase'
     AND (p.ts > err.ts OR (p.ts = err.ts AND p.event_id > err.event_id))
     AND p.ts <= err.ts + INTERVAL 1 HOUR
    WHERE err.event_type = 'error'
    GROUP BY err.event_id, err.user_id, err.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each error event matched to
    the SAME user's next purchase within 1 hour — the
    direction='forward' twin of join_asof (joins.py), used for
    "did the incident convert anyway" analyses.

    The Spark plan is NOT the oracle's O(n·m) self-join: one window
    over (user_id, ts, event_id) computes the next-purchase timestamp
    for every row in a single pass (min of a conditional over the
    strictly-following frame), then the tolerance filter keeps matches.
    Same answer, linear work — the scale-right as-of formulation."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.withColumn(
        "next_purchase_ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    return (
        nxt.filter(
            (F.col("event_type") == "error")
            & F.col("next_purchase_ts").isNotNull()
            & (F.col("next_purchase_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select(
            "event_id",
            "user_id",
            "next_purchase_ts",
            (
                F.unix_timestamp("next_purchase_ts") - F.unix_timestamp("ts")
            ).alias("gap_s"),
        )
    )


@query(
    "ts_ohlc_bars",
    oracle=f"""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id, value
      FROM events
    ), r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS volume
    FROM r GROUP BY event_type, hour
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC resampling per event type: open/high/low/close of
    ``value`` plus count and exact volume — the time-series downsample
    every monitoring and market pipeline runs.

    Open/close are arg-extrema over the (ts, event_id) total order via
    ``min_by``/``max_by`` on a struct key — ONE map-side-combined
    aggregate carrying constant state per bar, no sort, no window. The
    oracle needs two ROW_NUMBER windows for the same semantics because
    DuckDB's arg_min can't take a composite ordering; the Spark shape
    is the one that survives 100 TB."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        "value",
    )
    return b.groupBy("event_type", "hour").agg(
        F.expr("min_by(value, struct(ts, event_id))").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.expr("max_by(value, struct(ts, event_id))").alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("volume"),
    )


@query(
    "events_error_rate_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             COUNT(*) AS n_events,
             COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
      FROM events GROUP BY date_trunc('hour', ts)
    ), ma AS (
      SELECT hour, n_events, n_errors,
             CAST(SUM(n_errors) OVER (ORDER BY hour
                  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS err_prev3,
             CAST(SUM(n_events) OVER (ORDER BY hour
                  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS ev_prev3
      FROM hourly
    )
    SELECT hour, n_events, n_errors,
           ROUND(n_errors * 1.0 / n_events, 6) AS err_rate
    FROM ma
    WHERE ev_prev3 IS NOT NULL AND err_prev3 IS NOT NULL
      AND n_errors * ev_prev3 * 2 > err_prev3 * n_events * 3
    """,
)
def events_error_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed anomaly screen: hours whose error rate exceeds 1.5× the
    trailing-3-hour baseline — the alerting query behind every
    error-budget dashboard.

    The comparison `rate > 1.5 · baseline` is cross-multiplied into
    pure integer arithmetic (n_errors·ev_prev3·2 > err_prev3·n_events·3)
    so the anomaly SET is decided without a single float; the reported
    rate is one rounded division for display. Scale: events collapse to
    ~720 hourly rows before any window runs — the window cost is
    negligible and the heavy stage is one map-side-combined count."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )
    # bounded-window: sliding frame over the per-HOUR aggregate — the
    # frame is calendar-bounded (≤24·days rows regardless of data
    # volume) and a cross-partition sliding frame is not prefix-sum
    # decomposable, so the single-task window is the correct plan here
    w = Window.orderBy("hour").rowsBetween(-3, -1)
    ma = hourly.select(
        "hour",
        "n_events",
        "n_errors",
        F.sum("n_errors").over(w).alias("err_prev3"),
        F.sum("n_events").over(w).alias("ev_prev3"),
    )
    return (
        ma.filter(
            F.col("ev_prev3").isNotNull()
            & F.col("err_prev3").isNotNull()
            & (
                F.col("n_errors") * F.col("ev_prev3") * 2
                > F.col("err_prev3") * F.col("n_events") * 3
            )
        )
        .select(
            "hour",
            "n_events",
            "n_errors",
            F.round(F.col("n_errors") * 1.0 / F.col("n_events"), 6).alias(
                "err_rate"
            ),
        )
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, event_type,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE), 6)
             AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per event, the trailing-1-hour event
    count and value sum within its type — the rolling-window metric
    behind rate limits and moving KPIs, where the frame is defined by
    TIME, not row count (win_range_frame's numeric twin, #37).

    The order key is whole microseconds (unix_micros/epoch_us) on both
    engines — DuckDB's bare epoch() returns fractional seconds while
    Spark's unix_timestamp truncates, so second-precision keys would
    place sub-second peers differently. RANGE frames include ALL peers
    of the current key, so tie handling is engine-identical by
    definition, and the frame sum goes through decimal, making peer
    ORDER irrelevant too. Scale: one shuffle on event_type; Spark
    maintains the sliding frame incrementally per partition."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3600000000, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double"), 6
        ).alias("sum_1h"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH err AS (
      SELECT event_id, user_id, ts, event_id AS eid FROM events
      WHERE event_type = 'error'
    ), cand AS (
      SELECT e.event_id, e.user_id,
             p.ts AS p_ts, p.event_id AS p_eid,
             ABS(date_diff('microseconds', e.ts, p.ts)) AS adist
      FROM err e
      JOIN events p
        ON p.user_id = e.user_id AND p.event_type = 'purchase'
       AND p.ts BETWEEN e.ts - INTERVAL 30 MINUTE
                    AND e.ts + INTERVAL 30 MINUTE
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                   ORDER BY adist, p_ts, p_eid) AS rn
      FROM cand
    )
    SELECT event_id, user_id, p_ts AS nearest_purchase_ts,
           CAST(adist AS BIGINT) AS abs_gap_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each error matched to the SAME
    user's temporally CLOSEST purchase within ±30 minutes — completing
    the as-of trio (backward join_asof, forward join_asof_forward).
    Ties at equal distance break toward the earlier purchase, then
    event_id — spelled out in both engines, never left to the planner.

    Plan: a banded self-join on (user_id, ±30min) — an equi-join on
    user with a range predicate, NOT a cartesian — then one window
    picks the per-error minimum-distance candidate. At 100 TB the band
    join keys on (user_id, ts-bucket) so each side joins only adjacent
    time buckets; the same shape join_interval_overlap pins."""
    ev = table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_eid"),
    )
    cand = err.join(
        pur,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")),
    ).withColumn(
        "adist",
        F.abs(F.unix_micros(F.col("p_ts").cast("timestamp"))
              - F.unix_micros(F.col("ts").cast("timestamp"))),
    )
    w = Window.partitionBy("event_id").orderBy("adist", "p_ts", "p_eid")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("p_ts").alias("nearest_purchase_ts"),
            F.col("adist").alias("abs_gap_us"),
        )
    )


@query(
    "events_windowed_funnel",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_view_ts
      FROM events
    )
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           COUNT(*) FILTER (
             WHERE event_type = 'purchase'
               AND last_view_ts IS NOT NULL
               AND last_view_ts >= ts - INTERVAL 1 HOUR
           ) AS n_converted
    FROM seq GROUP BY user_id
    """,
)
def events_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel conversion: a purchase "converts" only if
    the same user VIEWED within the preceding hour — the
    attribution-window semantics real funnels use (events_funnel is the
    unbounded-order variant). One ordered window per user tracks the
    most recent prior view (CASE-null max over an
    exclude-current-row frame, ties broken by event_id), so conversion
    is a row-local predicate afterwards — no purchases×views self-join.

    Scale: single shuffle on user_id; the window state is one
    timestamp per user. The self-join formulation this replaces is
    quadratic per user in bursty traffic; the running-max is O(n) and
    incremental — the same shape Structured Streaming runs with a
    30-line state handler (stream_stateful_counts)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    seq = ev.select("user_id", "event_type", "ts", last_view.alias("last_view_ts"))
    is_view = (F.col("event_type") == "view").cast("long")
    is_purchase = (F.col("event_type") == "purchase").cast("long")
    converted = (
        (F.col("event_type") == "purchase")
        & F.col("last_view_ts").isNotNull()
        & (F.col("last_view_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    ).cast("long")
    return seq.groupBy("user_id").agg(
        F.sum(is_view).alias("n_views"),
        F.sum(is_purchase).alias("n_purchases"),
        F.sum(converted).alias("n_converted"),
    )
