"""Structured Streaming demo equivalence checks (SURVEY.md §2.9): the
readStream path must produce the same answers as the graded batch path
over a bounded replay."""

from __future__ import annotations

from python_etl_sample_spark.registry import REGISTRY, load_all_operators
from python_etl_sample_spark.streaming import demo

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streaming_tumbling_equals_batch(spark):
    stream_out = demo.demo_tumbling(spark, SF_DIR)
    batch_out = REGISTRY["stream_tumbling"].fn(spark, SF_DIR)
    cols = ["wstart", "wend", "event_type", "n_events"]
    assert _sorted_rows(stream_out, cols) == _sorted_rows(batch_out, cols)


def test_streaming_session_equals_batch(spark):
    """Native session_window vs lag/cumsum sessionization: same session
    count and same per-user event totals (session_window's end is
    start+gap-padded, so compare counts, not end timestamps)."""
    stream_out = demo.demo_session(spark, SF_DIR)
    batch_out = REGISTRY["stream_session"].fn(spark, SF_DIR)
    s = _sorted_rows(stream_out, ["user_id", "session_start", "n_events"])
    b = _sorted_rows(batch_out, ["user_id", "session_start", "n_events"])
    assert s == b


def test_streaming_dedup_matches_batch_keys(spark):
    stream_out = demo.demo_dedup_watermark(spark, SF_DIR)
    batch_out = REGISTRY["stream_dedup_keyed"].fn(spark, SF_DIR)
    assert _sorted_rows(stream_out, ["user_id", "event_type"]) == _sorted_rows(
        batch_out, ["user_id", "event_type"]
    )
