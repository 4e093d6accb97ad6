"""Streaming-demo overhead probe (VERDICT r13 item 5).

The 10 stream_demo_* queries cost ~14 s of the driver bench, almost
all micro-batch machinery (their sf1 ratios are ~1x). This probe
measures, in ONE session with interleaved variants (the repo's
measurement discipline):

  1. the irreducible floor: a minimal 1-batch AvailableNow rate stream
     through a memory sink — pure trigger + query-lifecycle cost;
  2. three representative demos under the current state-store
     partition pin (8) vs lower pins (4, 2, 1) — state rows per demo
     are tiny, so partitions are pure per-batch task overhead.

Hash checks are untouched: partition count is physical config; the
drained snapshot is partition-invariant (that is the point of the
demos' determinism design).

Usage: python tools/probes/probe_stream_overhead_r14.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

DEMOS = ("stream_demo_tumbling", "stream_demo_dedup", "stream_demo_stateful")
PARTS = (8, 4, 2, 1)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from python_etl_sample_spark.registry import REGISTRY, load_all_operators
    from python_etl_sample_spark.session import get_spark
    from python_etl_sample_spark.streaming import demo as demo_mod

    load_all_operators()
    spark = get_spark("stream-overhead-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    # sentinel: quiet-session check
    t0 = time.time()
    REGISTRY["scan_projected"].fn(spark, sf).collect()
    print(f"sentinel scan_projected: {time.time() - t0:.3f}s "
          f"(quiet < ~0.2; contended > 0.3 — distrust)")

    # 1. irreducible floor: minimal one-batch rate stream
    def rate_floor() -> float:
        t = time.time()
        df = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 10)
            .option("numPartitions", 1)
            .load()
        )
        q = (
            df.writeStream.format("memory")
            .queryName(f"floor_{int(t * 1e6) % 10**9}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.time() - t

    floors = [rate_floor() for _ in range(reps)]
    print(f"irreducible 1-batch floor: min {min(floors):.3f}s "
          f"(all: {[round(f, 3) for f in floors]})")

    # warm all paths once
    for name in DEMOS:
        REGISTRY[name].fn(spark, sf).collect()

    # 2. interleaved partition-pin variants
    _SHIPPED_PINS = dict(demo_mod._DEMO_PARTS)
    results: dict[tuple[str, int], float] = {}
    for _ in range(reps):
        for parts in PARTS:
            # r14 per-demo pins (_DEMO_PARTS) take precedence over the
            # module default, so a sweep must override BOTH
            demo_mod._DEMO_SHUFFLE_PARTITIONS = parts
            for k in demo_mod._DEMO_PARTS:
                demo_mod._DEMO_PARTS[k] = parts
            for name in DEMOS:
                t = time.time()
                REGISTRY[name].fn(spark, sf).collect()
                dt = time.time() - t
                key = (name, parts)
                results[key] = min(results.get(key, 1e9), dt)
    demo_mod._DEMO_SHUFFLE_PARTITIONS = 8
    demo_mod._DEMO_PARTS.clear()
    demo_mod._DEMO_PARTS.update(_SHIPPED_PINS)

    print(f"\n{'demo':36s}" + "".join(f" p={p:<6d}" for p in PARTS))
    for name in DEMOS:
        row = "".join(f" {results[(name, p)]:.3f}  " for p in PARTS)
        print(f"{name:36s}{row}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
