"""Regenerate ``DRIVER_ORDER`` for the next driver round.

The driver's ``CORRECTNESS_r{N}.json`` records at most 50 entries per
round, taken in ``queries()`` order.  To maximize evidence coverage the
rotation puts the least-evidenced queries first:

1. never driver-recorded (no row in any committed ``CORRECTNESS_r*.json``),
   in registry order — new code is the least-evidenced code;
2. everything else by (number of driver rows ascending, round of most
   recent row ascending, name) so re-recording slots go to the stalest
   evidence first.

Prints a ready-to-paste Python tuple body.  Run from anywhere:

    python tools/gen_driver_order.py
"""
from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from python_etl_sample_spark.registry import canonical_names

    rows: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for name in json.load(open(path)):
            rows.setdefault(name, []).append(rnd)

    names = list(canonical_names())
    never = [n for n in names if n not in rows]
    seen = [n for n in names if n in rows]
    seen.sort(key=lambda n: (len(rows[n]), max(rows[n]), n))

    print(f"# never driver-recorded ({len(never)}) — next round's first slots")
    for n in never:
        print(f'    "{n}",')
    last_key = None
    for n in seen:
        key = (len(rows[n]), max(rows[n]))
        if key != last_key:
            print(f"    # --- {key[0]} driver row(s), last in r{key[1]} ---")
            last_key = key
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
