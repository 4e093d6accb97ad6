"""SparkSession construction with the configs this engine requires.

Required configs (FIXTURES.md "Load configs"):
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — events.parquet stores
  ``ts`` as timestamp[ns]; Spark 4.x refuses it by default
  (PARQUET_TYPE_ILLEGAL). The conf is runtime-settable, so the loader
  also sets it on sessions we did not build (the driver builds its own).
- UTC session timezone — keeps TimestampType ↔ timestamp_ntz ↔ DuckDB
  naive TIMESTAMP value-aligned.

Scale posture: AQE on (skew-join split, partition coalescing),
shuffle.partitions sized for local runs but overridable; on a real
cluster this would be set ≈ 2-3× total cores or left to AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: r14 join posture (guide §3.1 / §9): allow the planner to pick a
#: shuffled hash join when its size conditions hold instead of always
#: preferring sort-merge, and let AQE rewrite a sort-merge to a
#: shuffled-hash at runtime when every post-shuffle partition's build
#: side is under the threshold (default 0 = off upstream; 64 MiB =
#: one AQE advisory partition). Physical-only — join results are
#: strategy-invariant — and measured on the SMJ-bearing tier
#: (interleaved A/B, OPTIMIZATION_r14.md batch 9): 0.86–0.97x on the
#: heavy graph/sim/dedup queries, no confirmed regression. The
#: threshold is the memory-safety knob at scale (a build side above it
#: keeps sort-merge's graceful spill); override via env for clusters
#: with tighter executor memory.
_SHJ_LOCAL_MAP_THRESHOLD = os.environ.get(
    "SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD", str(64 * 1024 * 1024)
)

#: The static-planner half of the same posture, env-overridable for the
#: same reason (ADVICE r14): shuffled-hash builds lack sort-merge's
#: graceful spill when static size estimates are badly wrong, so a
#: memory-tight cluster can restore sort-merge without editing source
#: (SPARK_GRAFT_PREFER_SORT_MERGE_JOIN=true).
_PREFER_SORT_MERGE_JOIN = os.environ.get(
    "SPARK_GRAFT_PREFER_SORT_MERGE_JOIN", "false"
)


def get_spark(app_name: str = "python-etl-sample-spark") -> SparkSession:
    """Build (or get) a SparkSession configured for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.join.preferSortMergeJoin", _PREFER_SORT_MERGE_JOIN)
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            _SHJ_LOCAL_MAP_THRESHOLD,
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    return builder.getOrCreate()


def ensure_session_configs(spark: SparkSession) -> None:
    """Apply runtime-settable configs to an externally-built session.

    The driver's harness constructs its own SparkSession; all of these
    configs are dynamic (verified empirically), so the loader calls this
    before every read. Shuffle partitions are right-sized for local-mode
    fixture scale (the 200 default wastes task-launch overhead at sf≤0.1;
    AQE coalescing makes the number forgiving either way).
    """
    # Memoized by probing a marker conf ON THE SESSION itself — never by
    # id(spark): CPython reuses ids after GC, so a session created after
    # an old one is collected could silently skip config application.
    try:
        if spark.conf.get(_MARKER_CONF, None) == "true":
            return
    except Exception:
        pass
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", _PREFER_SORT_MERGE_JOIN)
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        _SHJ_LOCAL_MAP_THRESHOLD,
    )
    spark.conf.set(_MARKER_CONF, "true")


_MARKER_CONF = "spark.python_etl_sample_spark.sessionConfigured"
