"""Streaming semantics over the events table, batch-graded —
SURVEY.md §2.9 ops #52-57.

Each operator here is the deterministic batch equivalent of a
Structured Streaming computation (the driver's oracle is batch DuckDB);
``streaming/demo.py`` proves the same logic runs under ``readStream``
with watermarks/session windows. F.window() produces identical buckets
in batch and streaming — that is the point of the dual path.

Scale: tumbling/sliding windows are plain groupBys (map-side partial
agg); sessionization is one shuffle on user_id + ordered scan — the
same shape Spark's streaming state store uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum, dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "stream_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS wend,
           event_type, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#52 1-hour tumbling windows per event type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' AS wstart,
           time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' + INTERVAL 1 HOUR AS wend,
           COUNT(*) AS n_events
    FROM events, range(4) t(i)
    GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#53 1-hour windows sliding every 15 min (each event lands in
    exactly 4 windows; the oracle materializes the same 4 shifts)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
        )
    )


@query(
    "stream_session",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM tagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#54 session windows with a 30-min gap (lag + cumulative-sum
    sessionization; gap of exactly 30 min does NOT split — strict >,
    pinned identically in both engines)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the running sum carries the module's event_id tie-break too:
    # duplicate (user_id, ts) rows would otherwise get engine-dependent
    # session_id assignment in each engine independently
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(w)
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 30 MINUTES")), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = tagged.withColumn("session_id", F.sum("is_new").over(wrun))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "stream_watermark_late",
    oracle="""
    WITH c AS (SELECT max(ts) - INTERVAL '7 days' AS cutoff FROM events)
    SELECT event_type, COUNT(*) AS n_kept
    FROM events, c
    WHERE ts >= c.cutoff
    GROUP BY event_type
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#55 watermark semantics, batch emulation: drop events older than
    max(ts) − 7 days (the deterministic analogue of
    ``withWatermark('ts', ...)`` late-data dropping)."""
    ev = table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff"))
    return (
        ev.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@query(
    "stream_dedup_keyed",
    oracle="""
    SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
    FROM (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#56 keyed dedup keeping the earliest event — deterministic
    row_number form (plain dropDuplicates is nondeterministic under
    ties; the streaming demo uses dropDuplicatesWithinWatermark)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )


@query(
    "stream_stateful_counts",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS events_so_far,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS value_so_far
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#57 running per-user state (cumulative count + value) — the batch
    analogue of an update-mode stateful aggregation."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("events_so_far"),
        F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double").alias("value_so_far"),
    )
