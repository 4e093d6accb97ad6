"""sf0.1 -> sf1 scaling probe (VERDICT r12 item 6).

Runs the named queries at sf0.1 and at the synthesized sf1
(tools/gen_sf1.py) in ONE session and prints the wall-time ratio. A
plan whose cost is ~linear in the corpus should land near 10x minus
fixed overhead (JVM scheduling, micro-batch triggers), i.e. typically
UNDER 10; super-linear ratios flag a pair-space or state blow-up.

Usage: python tools/probes/scale_probe_r13.py name1,name2 [reps01 reps1]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sf1")


def main() -> int:
    names = sys.argv[1].split(",")
    reps01 = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    reps1 = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from python_etl_sample_spark.api import queries
    from python_etl_sample_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    qs["agg_groupby"](spark, SF01).collect()
    qs["agg_groupby"](spark, SF1).collect()

    for name in names:
        mins = {}
        for sf_dir, reps, tag in ((SF01, reps01, "sf0.1"), (SF1, reps1, "sf1")):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                ts.append(time.perf_counter() - t0)
            mins[tag] = min(ts)
        r = mins["sf1"] / mins["sf0.1"]
        print(
            f"{name}: sf0.1 {mins['sf0.1']:.3f}  sf1 {mins['sf1']:.3f}  "
            f"ratio {r:.2f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
