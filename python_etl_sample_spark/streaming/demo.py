"""Structured Streaming demo path — SURVEY.md §7 M4.

Proves the batch-graded semantics in ``batch_semantics`` run unchanged
under ``readStream``: the events parquet is replayed as a file source
with ``Trigger.AvailableNow``, aggregated with real watermarks /
session windows, and landed in a memory sink. Every demo here is
HASH-CHECKED (round 6): a bounded replay's drained complete/update
snapshot is a pure function of the input — independent of batching —
so the DuckDB oracle recomputes it as a batch rollup (and the
rate-source demo's from a bare range()); the batch-parity pytest
cross-checks remain as the faster local tier.

At 100 TB this is the production path: the same code with a Kafka/files
source, checkpointed state store, and watermark-bounded state.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.scratch import scratch_path, stage_once
from python_etl_sample_spark.session import ensure_session_configs


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet replayed as a streaming source (ts normalized to
    a watermarkable timestamp exactly as the batch loader does)."""
    ensure_session_configs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source requires a directory; stage the events file
    # into scratch once (at 100 TB this would be the landing directory
    # new files arrive into)
    def _stage(p: str) -> None:
        import os

        os.makedirs(p, exist_ok=True)
        shutil.copyfile(f"{sf_dir}/events.parquet", f"{p}/events.parquet")

    src_dir = stage_once("stream_src", sf_dir, _stage)
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    # watermarks require TIMESTAMP (not NTZ); with the UTC session tz the
    # wall-clock values are identical to the batch loader's timestamp_ntz.
    # Branch on the LOADED ts type exactly as the batch loader does
    # (sources/tables.py): bigint = nanos fixture vintage, else native.
    from pyspark.sql.types import LongType

    if isinstance(raw_schema["ts"].dataType, LongType):
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


#: default state-store partition pin for the demos (see _run_to_memory);
#: a module constant so tools/probes/probe_stream_overhead_r14.py can
#: sweep it in one session without editing source
_DEMO_SHUFFLE_PARTITIONS = 8

#: r14 PER-DEMO pins (optimization round 1). The r14-build sweep found
#: no uniform winner — applyInPandasWithState parallelizes its per-key
#: Python work across state partitions (p=1 measured 3.6x SLOWER for
#: the stateful demo), while the pure window/dedup/join demos carry a
#: handful of state rows and every extra partition is per-micro-batch
#: task overhead. The full-family sweep (/tmp probe, table recorded in
#: OPTIMIZATION_r14.md) picked per-demo knees; partition count is
#: PHYSICAL config only — every drained snapshot is partition-invariant
#: by the demos' determinism design, and the keep-vs-revert decision
#: was re-measured with an interleaved old-vs-new A/B. At 100 TB these
#: pins scale with state volume (≈ cluster cores for data-sized state);
#: locally the state is tiny so the knee sits at 1-8.
_DEMO_PARTS: dict[str, int] = {
    "tumbling": 1,
    "sliding": 1,
    "session": 4,
    "watermark_late": 1,
    "dedup": 1,
    "static_join": 1,
    "stream_join": 1,
    "stateful": 8,
    "foreachbatch_merge": 1,
    "rate_source": 1,
}


def _demo_parts(key: str) -> int:
    return _DEMO_PARTS.get(key, _DEMO_SHUFFLE_PARTITIONS)


def _run_to_memory(result: DataFrame, mode: str, parts: int | None = None) -> DataFrame:
    """Drain an AvailableNow stream into a memory sink; return the table."""
    name = f"demo_{uuid.uuid4().hex[:12]}"
    spark = result.sparkSession
    # demo state is a handful of (window/key) rows, so 32 state-store
    # partitions per micro-batch is pure task overhead (same measured
    # ~40% saving as the rate demo). The count is fixed at query start
    # from the session conf; pin it low for the start and restore.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(parts if parts is not None else _DEMO_SHUFFLE_PARTITIONS),
    )
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    q.awaitTermination()
    return spark.table(name)


def _tumbling_agg(ev: DataFrame) -> DataFrame:
    """The watermarked 1-hour tumbling count — ONE definition shared by
    the file-replay demo, the rate-source demo, and (shape-wise) the
    graded batch twin, so "the query is source-agnostic" is a fact
    about the code, not a claim."""
    return (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
        )
    )


def demo_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#52 under readStream: watermarked 1-hour tumbling counts."""
    return _run_to_memory(
        _tumbling_agg(_events_stream(spark, sf_dir)),
        "complete",
        parts=_demo_parts("tumbling"),
    )


def demo_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#54 under readStream: native session_window with a 30-min gap."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete", parts=_demo_parts("session"))


def demo_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#56 under readStream: dropDuplicatesWithinWatermark on the key.

    SINGLE-BATCH PRECONDITION (r13 ADVICE): the emitted key SET is a
    pure function of the input only because ``_events_stream`` replays
    ONE staged file with no maxFilesPerTrigger, i.e. one micro-batch —
    a multi-batch replay could re-emit a key whose state the 10-minute
    watermark already evicted between batches. Pinned below by
    asserting the staged source really is a single file, so a future
    trigger/staging change fails loudly instead of going
    nondeterministic."""
    ev = _events_stream(spark, sf_dir)
    src_dir = scratch_path("stream_src", sf_dir)
    staged = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
    assert len(staged) == 1, (
        f"dedup demo requires a single-file (single micro-batch) "
        f"replay; staged: {staged}"
    )
    dedup = ev.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    return _run_to_memory(
        dedup.select("user_id", "event_type"),
        "append",
        parts=_demo_parts("dedup"),
    )


def demo_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#57 under readStream with a CUSTOM stateful operator:
    ``applyInPandasWithState`` keeps (n_events, value_sum) per user in
    the state store and emits each user's totals when the replay drains.

    This is the arbitrary-state API a production pipeline uses when the
    built-in aggregations can't express the per-key logic (counters
    here, but the same shape carries sessionizers, CDC mergers, model
    feature accumulators). State is bounded by #users; at 100 TB the
    watermark evicts idle keys. Equality with the batch answer
    (``stream_stateful_counts`` collapsed to final per-user totals) is
    asserted in tests."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _events_stream(spark, sf_dir)

    def update_user(key, pdfs, state: GroupState):
        # accumulate EXACT integer cents (value is a 2-dp money-like
        # double): int state makes the emitted total independent of
        # pandas' float summation order, so the demo is hash-checkable
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "events_total": [n],
                "value_total": [round(cents / 100.0, 6)],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update_user,
        outputStructType="user_id bigint, events_total bigint, value_total double",
        stateStructType="n bigint, cents bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, "update", parts=_demo_parts("stateful"))


@query(
    "stream_demo_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS wend,
           event_type, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2, 3
    """,
)
def stream_demo_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#52-demo, HASH-CHECKED: the watermarked streaming tumbling
    aggregation, complete mode over the bounded AvailableNow replay —
    the drained snapshot equals the batch tumbling counts (complete
    mode retains every window; the watermark only gates eviction in
    update/append), so the DuckDB oracle is the plain batch rollup. A
    lost micro-batch or a watermark mis-eviction breaks the hash."""
    return demo_tumbling(spark, sf_dir)


@query(
    "stream_demo_static_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS value_total
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def stream_demo_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join under a REAL readStream — the
    micro-batch pattern that attaches slowly-changing dimensions to a
    stream without any stream-stream state: each micro-batch of events
    broadcast-joins the static customer table, then a complete-mode
    aggregation rolls the enriched stream up per segment.

    Unlike the other stream demos this one IS oracle-checked: the
    AvailableNow replay drains the whole fixture, so the complete-mode
    aggregate must equal the batch left-join aggregate exactly — counts
    are order-free and the value sum is decimal-accumulated. This is
    the strongest streaming evidence in the suite: a DuckDB hash match
    THROUGH the streaming engine. Scale: the dimension broadcasts to
    every executor once per micro-batch; state is |segments| rows."""
    from python_etl_sample_spark.functions.determinism import dsum
    from python_etl_sample_spark.sources import table as load_table

    ev = _events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_key"), "c_mktsegment"
    )
    joined = ev.join(
        F.broadcast(cust), ev.user_id == F.col("user_key"), "left"
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("value_total"),
    )
    return _run_to_memory(agg, "complete", parts=_demo_parts("static_join"))


@query(
    "stream_demo_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def stream_demo_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#54-demo, HASH-CHECKED: native ``session_window`` with a
    30-minute gap under a real readStream, complete mode over the
    bounded fixture replay — which makes the drained state a pure
    function of the input that a batch gaps-and-islands pass
    reproduces. The oracle mirrors Spark's EXACT merge rule,
    empirically pinned on a two-event fixture AND discriminated by the
    one exact-1800 s gap in the sf0.1 events: a session window is
    [first event, last event + gap] INCLUSIVE of the end boundary — an
    event exactly gap seconds after the previous one still MERGES
    (``> 1800`` starts a new session, same rule as the batch
    sessionize twin). Session windows are the one window
    type whose extent is DATA-dependent; the state store merges windows
    as late rows arrive, exactly what the islands pass does in one
    shot."""
    return demo_session(spark, sf_dir)


#: rate-source demo shape: 3 deterministic micro-batches × 3500 rows
#: (10.5k events; per-micro-batch runtime overhead measured ~1 s each —
#: trigger scheduling + a foreachBatch py4j round trip — so the batch
#: count, not the row count, is the demo's cost driver; 3 batches is
#: the minimum that still shows state surviving TWO batch boundaries).
_RATE_BATCHES = 3
_RATE_ROWS_PER_BATCH = 3500
_RATE_EPOCH_MS = 1735689600000  # 2025-01-01T00:00:00Z


def synth_events(df: DataFrame) -> DataFrame:
    """Deterministic events synthesized from a monotonically-increasing
    ``value`` column — works identically on the rate-micro-batch stream
    and on a batch ``spark.range``, which is what the parity test
    exploits. Event time derives from ``value`` (one event per 2 s from
    a fixed epoch), NEVER from the generator's wall-clock timestamp."""
    kinds = F.array(
        F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("refund")
    )
    return df.select(
        F.timestamp_millis(
            F.lit(_RATE_EPOCH_MS) + F.col("value") * 2000
        ).alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.element_at(kinds, (F.col("value") % 4 + 1).cast("int")).alias(
            "event_type"
        ),
    )


def rate_source_batch_twin(spark: SparkSession) -> DataFrame:
    """The batch answer the rate-source demo must reproduce: the same
    synth + the same tumbling agg over the same value range."""
    rows = _RATE_BATCHES * _RATE_ROWS_PER_BATCH
    ev = synth_events(spark.range(rows).select(F.col("id").alias("value")))
    return ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        F.col("w.start").alias("wstart"),
        F.col("w.end").alias("wend"),
        "event_type",
        "n_events",
    )


def demo_rate_source(spark: SparkSession) -> DataFrame:
    """The tumbling demo against a ``rate-micro-batch`` source — no
    files at all. Proves the windowed aggregation is source-agnostic:
    ``_tumbling_agg`` is the same function object the file-replay demo
    runs. The rate-micro-batch source emits exactly ``rowsPerBatch``
    rows per trigger with a deterministic ``value`` sequence, so the
    complete-mode aggregate captured at batch ``_RATE_BATCHES - 1`` is
    exactly the aggregate of the first ``_RATE_BATCHES × rowsPerBatch``
    synthesized events — reproducible run-to-run (the stability test
    reruns it) and equal to the batch twin (the parity test).

    The foreachBatch sink snapshots that batch and signals the driver,
    which stops the (otherwise unbounded) stream — the bounded-capture
    idiom for demoing an unbounded source. At 100 TB swap the source
    line for Kafka; nothing downstream changes."""
    ensure_session_configs(spark)
    import threading

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", _RATE_ROWS_PER_BATCH)
        .option("numPartitions", 4)
        .option("startTimestamp", _RATE_EPOCH_MS)
        .option("advanceMillisPerBatch", 60000)
        .load()
    )
    agg = _tumbling_agg(synth_events(stream))

    done = threading.Event()
    snap: dict[str, list] = {}

    def capture(bdf: DataFrame, batch_id: int) -> None:
        if batch_id >= _RATE_BATCHES - 1 and not done.is_set():
            snap["rows"] = bdf.collect()
            done.set()
        else:
            # Spark 4 validates that foreachBatch processed EVERY
            # partition (state-store commit tracking) — a no-op batch
            # fails the query, so drain uncaptured batches with a count
            bdf.count()

    # the stateful agg keys on (window, event_type) — a handful of
    # state rows — so 32 state-store partitions per micro-batch is pure
    # task overhead (measured ~40% of the demo's wall time). The state
    # partition count is fixed at query start from the session conf;
    # pin it low for this query and restore right after start.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_demo_parts("rate_source")))
    try:
        q = (
            agg.writeStream.foreachBatch(capture)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    try:
        if not done.wait(timeout=180):
            exc = q.exception()
            raise RuntimeError(f"rate-source demo never reached batch "
                               f"{_RATE_BATCHES - 1}: {exc}")
    finally:
        q.stop()
        q.awaitTermination()
    return spark.createDataFrame(snap["rows"], schema=agg.schema)


@query(
    "stream_demo_rate_source",
    oracle=f"""
    WITH v AS (
      SELECT UNNEST(range(0, {_RATE_BATCHES * _RATE_ROWS_PER_BATCH}))
        AS value
    ),
    ev AS (
      SELECT epoch_ms({_RATE_EPOCH_MS} + value * 2000) AS ts,
             (['click','view','purchase','refund'])
               [CAST(value % 4 + 1 AS INT)] AS event_type
      FROM v
    )
    SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS wend,
           event_type, COUNT(*) AS n_events
    FROM ev GROUP BY 1, 2, 3
    """,
)
def stream_demo_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#52-demo on a message-bus-shaped source — HASH-CHECKED, because
    the rate-micro-batch source is fully deterministic: batch k emits
    values [k·rowsPerBatch, (k+1)·rowsPerBatch), event time derives
    from the value (never the generator's wall clock), and the
    complete-mode snapshot at the final captured batch is therefore a
    pure function of the first {_RATE_BATCHES}·{_RATE_ROWS_PER_BATCH}
    values — which the DuckDB oracle recomputes from a range() without
    any streaming machinery. A dropped batch, double-processed batch,
    or watermark mis-eviction under complete mode breaks the hash.
    (Complete mode retains all windows — the watermark only bounds
    state eviction in update/append modes.) ``sf_dir`` is unused — the
    source is synthesized, which is the point."""
    del sf_dir
    return demo_rate_source(spark)


@query(
    "stream_demo_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_micros
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_demo_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join under two real ``readStream`` sources —
    the last Structured Streaming flagship the demo family was missing:
    clicks and purchases arrive as two independent streams, and each
    purchase within one hour after a click by the same user emits a
    (click, purchase, gap) row.

    Both sides carry a 1-hour watermark and the join condition carries
    the time bound, which is exactly what lets the state store evict a
    buffered click once the purchase-side watermark passes its
    ``ts + 1h`` horizon — the mechanism that makes stream-stream joins
    bounded-state at 100 TB (without the bound, both sides buffer
    forever). Inner joins emit on match arrival, so the AvailableNow
    replay drains to precisely the batch join answer — making this
    demo ORACLE-CHECKED through the streaming engine, like
    stream_demo_static_join: a DuckDB hash match that the join state
    machine, watermark tracking, and micro-batch scheduler all sat
    inside of. The gap is exact integer microseconds (the fixtures'
    native resolution)."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_micros"),
    )
    return _run_to_memory(joined, "append", parts=_demo_parts("stream_join"))


@query(
    "stream_demo_stateful",
    oracle="""
    SELECT user_id,
           COUNT(*) AS events_total,
           round(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 6) AS value_total
    FROM events GROUP BY user_id
    """,
)
def stream_demo_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#57-demo, HASH-CHECKED: the applyInPandasWithState custom
    stateful operator under a real readStream. The per-user state
    accumulates EXACT integer cents (value is 2-dp), so the drained
    update-mode output — one final-totals row per user over the
    bounded replay — is a pure function of the input with zero float
    association sensitivity, and the DuckDB oracle is the plain
    per-user rollup in the same cents arithmetic. A state-loss,
    double-count, or emit-per-wrong-key bug breaks the hash."""
    return demo_stateful_running(spark, sf_dir)


__all__ = [
    "demo_tumbling",
    "demo_session",
    "demo_dedup_watermark",
    "demo_stateful_running",
]


@query(
    "stream_demo_foreachbatch_merge",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           ts AS last_ts,
           event_type AS last_event_type
    FROM ranked WHERE rn = 1
    """,
)
def stream_demo_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental MERGE under a real multi-batch stream —
    HASH-CHECKED (the only streaming demo that can be, because the
    final merged state over a bounded replay is a pure function of the
    input, independent of how the stream was batched): the events
    fixture is staged as FOUR parquet files, replayed one file per
    micro-batch (maxFilesPerTrigger=1 + AvailableNow), and every batch
    upserts a per-user state table — total event count plus the argmax
    (ts, event_id) last event — via the read-merge-write-new-version
    pattern a lakehouse MERGE performs. The oracle recomputes the same
    per-user rollup from the raw table, so a lost batch, double-applied
    batch, or merge-order sensitivity breaks the hash.

    Merge algebra: (count, argmax-struct) is a commutative monoid —
    sum the counts, take the struct max ordered by (ts, event_id,
    event_type) — so the result is batch-order independent, which is
    exactly the idempotence/reordering contract production foreachBatch
    sinks must satisfy. State versions are immutable (v{batch_id}
    directories): the write-new-then-read-latest cycle, not an
    in-place overwrite that would corrupt on mid-batch failure.

    At 100 TB: same code with the state table as a real MERGE target
    (Delta/Iceberg); per-batch work is one map-side-combined groupBy of
    the BATCH (not history) joined against state — O(delta + state),
    never a rescan of the stream's past."""
    ensure_session_configs(spark)
    import os

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    from pyspark.sql.types import LongType

    def _stage(p: str) -> None:
        os.makedirs(p, exist_ok=True)
        spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
            4
        ).write.mode("overwrite").parquet(p)

    src = stage_once("stream_src_fb4", sf_dir, _stage)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    if isinstance(raw_schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    from python_etl_sample_spark.scratch import scratch_path

    state_base = scratch_path(f"fb_state_{uuid.uuid4().hex[:12]}", sf_dir)
    latest: list[str] = []

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.struct("ts", "event_id", "event_type")).alias("m"),
        )
        if latest:
            prev = spark.read.parquet(latest[-1])
            partial = prev.unionByName(partial).groupBy("user_id").agg(
                F.sum("n_events").alias("n_events"),
                F.max("m").alias("m"),
            )
        path = f"{state_base}/v{batch_id}"
        partial.write.mode("overwrite").parquet(path)
        latest.append(path)

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_demo_parts("foreachbatch_merge")))
    try:
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{state_base}/_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        # micro-batches plan asynchronously after start(); keep the
        # pinned partition count until every batch has planned
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    assert latest, "stream produced no batches"
    return spark.read.parquet(latest[-1]).select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("m.ts").alias("last_ts"),
        F.col("m.event_type").alias("last_event_type"),
    )


@query(
    "stream_demo_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts)
             - i * INTERVAL '15 minutes' AS wstart,
           time_bucket(INTERVAL '15 minutes', ts)
             - i * INTERVAL '15 minutes' + INTERVAL 1 HOUR AS wend,
           event_type, COUNT(*) AS n_events
    FROM events, range(4) t(i)
    GROUP BY 1, 2, 3
    """,
)
def stream_demo_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#53-demo, HASH-CHECKED: 1-hour windows sliding every 15 minutes
    under a real readStream (watermarked, complete mode over the
    bounded replay — complete retains every window, so the drained
    snapshot is the pure 4-shift expansion of the input that the
    DuckDB oracle recomputes exactly like the graded batch twin
    ``stream_sliding``, here additionally keyed per event type). The
    overlap factor is the state-cost knob this demo documents: each
    event updates slide/step = 4 window states, so at 100 TB the same
    query holds 4× the tumbling demo's state rows and the watermark is
    what bounds them in update/append deployments."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete", parts=_demo_parts("sliding"))


#: the "late" slice of the watermark demo: every event on this day is
#: withheld from the first micro-batch and replayed AFTER the rest of
#: the fixture, so it arrives ~25 days behind the stream's watermark
_LATE_DAY = "2024-01-05"


def _late_replay_src(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as THREE parquet files with pinned modification
    times: file 0 = every event except _LATE_DAY's (the on-time
    stream), file 1 = an EMPTY heartbeat file, file 2 = _LATE_DAY's
    events (the late stragglers). With maxFilesPerTrigger=1 the file
    source replays them as three deterministic micro-batches in mtime
    order. The heartbeat batch matters: the micro-batch engine's
    late-row filter uses the watermark as of TWO batches behind the
    data that established it (empirically pinned on this build — a
    late row arriving in the batch immediately after the
    max-advancing batch is still ADMITTED, `numRowsDroppedByWatermark
    = 0`; one batch later it is dropped), so the empty batch is what
    lets file 0's watermark become filter-active before the late rows
    arrive — exactly the role a quiet heartbeat micro-batch plays in a
    production stream."""
    import glob as _glob
    import os

    from python_etl_sample_spark.sources import table as load_table

    def _stage(p: str) -> None:
        os.makedirs(p, exist_ok=True)
        ev = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        slices = (
            ("ontime", ev.filter(F.to_date("ts") != F.lit(_LATE_DAY))),
            ("heartbeat", ev.filter(F.lit(False))),
            ("late", ev.filter(F.to_date("ts") == F.lit(_LATE_DAY))),
        )
        for i, (tag, frame) in enumerate(slices):
            tmp = f"{p}/_tmp_{tag}"
            frame.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = _glob.glob(f"{tmp}/part-*.parquet")[0]
            dst = f"{p}/{i}_{tag}.parquet"
            shutil.move(part, dst)
            shutil.rmtree(tmp)
            os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    return stage_once("stream_src_late3", sf_dir, _stage)


@query(
    "stream_demo_watermark_late",
    oracle=f"""
    WITH ontime AS (
      SELECT * FROM events WHERE CAST(ts AS DATE) <> DATE '{_LATE_DAY}'
    ),
    wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM ontime)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS wend,
           event_type, COUNT(*) AS n_events
    FROM ontime
    GROUP BY 1, 2, 3
    HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
             <= (SELECT w FROM wm)
    """,
)
def stream_demo_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#55-demo, HASH-CHECKED: REAL watermark late-data dropping under
    readStream — the one streaming behavior the single-file demos
    cannot exhibit, because a watermark only advances between
    micro-batches. The fixture is replayed as three deterministic
    batches (maxFilesPerTrigger=1, mtime-ordered): batch 0 is every
    event except the late day's (_LATE_DAY = 2024-01-05), batch 1 is an
    empty heartbeat that activates batch 0's watermark (see
    _late_replay_src), and batch 2 replays the late day's events ~25
    days behind the watermark batch 0
    established (max on-time ts − 10 min). The append-mode tumbling
    aggregation
    therefore (a) DROPS every late row — its windows closed long ago —
    and (b) emits exactly the on-time windows whose end the final
    watermark passed. Both effects are pure functions of the input
    split, so the DuckDB oracle recomputes them relationally: on-time
    rollup, HAVING window-end ≤ max(on-time ts) − 10 min. A watermark
    that fails to drop the stragglers, or emits unclosed windows,
    breaks the hash.

    At 100 TB this is the core correctness/state trade of any
    event-time pipeline: the 10-minute delay bounds BOTH the state the
    store retains and the lateness the results tolerate."""
    ensure_session_configs(spark)
    src = _late_replay_src(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
        )
    )
    return _run_to_memory(agg, "append", parts=_demo_parts("watermark_late"))


@query(
    "stream_demo_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_demo_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#56-demo, HASH-CHECKED: ``dropDuplicatesWithinWatermark`` on
    (user_id, event_type) under a real readStream, completing the
    §2.9 set — every graded streaming shape now has a hash-checked
    readStream twin. Which PHYSICAL row survives per key depends on
    partition processing order (that is why the graded batch twin
    ``stream_dedup_keyed`` uses the deterministic row_number form),
    but the demo projects the KEY SET, which is a pure function of the
    input — exactly the distinct keys — so the drained append-mode
    output hash-matches a relational DISTINCT through the streaming
    dedup state store. A dropped key, double-emitted key, or
    watermark mis-eviction breaks the hash.

    At 100 TB: dedup state is one row per key within the watermark
    horizon; the 10-minute delay is what bounds it (vs the unbounded
    plain dropDuplicates), which is the production reason the
    WithinWatermark variant exists.

    Purity precondition: key-set determinism additionally requires the
    replay to be a SINGLE micro-batch (multi-batch replays could
    re-emit a key after watermark eviction); ``demo_dedup_watermark``
    asserts the staged source is one file — see its docstring."""
    return demo_dedup_watermark(spark, sf_dir)
