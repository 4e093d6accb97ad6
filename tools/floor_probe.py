"""Quiet-session floor probe for individual queries.

Bench singles at sf0.1 swing ±50% with ambient load (BENCH_NOTES
rounds 8-9), so adjudicating a suspected regression from one bench
number is noise-chasing. This probe measures a handful of queries the
way floors are defined — repeated warm runs, take the MIN — in one
dedicated session with the same warm-up bench.py uses.

Usage:
    python tools/floor_probe.py name1,name2 [sf_dir] [reps]

Defaults: sf_dir=/root/testdata/sf0.1, reps=4. Prints one line per
query: name, per-rep seconds, min. Never run concurrently with
bench.py or another Spark job on this box.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from python_etl_sample_spark.api import queries
    from python_etl_sample_spark.session import get_spark

    spark = get_spark("floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    qs["agg_groupby"](spark, sf_dir).collect()  # JVM + footer warm-up
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if df.isStreaming:
                print(f"{name}: streaming frame, skipped")
                break
            df.count()
            ts.append(time.perf_counter() - t0)
        if ts:
            runs = " ".join(f"{t:.2f}" for t in ts)
            print(f"{name}: [{runs}] min {min(ts):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
