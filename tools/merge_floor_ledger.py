"""Merge bench/probe runs into the floor ledger (BENCH_local.json).

Floor policy (round 11, unchanged): per-query MIN across this round's
runs; queries whose IMPLEMENTATION changed this round take FRESH minima
only (their prior floors describe retired code); unchanged queries keep
min(prior ledger, new runs); new queries take this round's minima.

Queries present in the prior ledger but absent from EVERY run file are
CARRIED FORWARD at their prior floors (r12 ADVICE: merging a partial
bench run must not silently erase recorded floors).  Pass --allow-drop
to intentionally retire names (e.g. a query was deleted from the
registry); without it, carried-forward names are listed but kept.

Usage:
    python tools/merge_floor_ledger.py run1.json [run2.json ...] \
        --fresh name1,name2 --round 12 [--write] [--allow-drop]

Without --write, prints the would-be ledger summary + biggest moves.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "BENCH_local.json")


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        text = fh.read()
    for candidate in (text, *reversed(text.strip().splitlines())):
        try:
            obj = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
            return {k: float(v) for k, v in obj["queries"].items()}
    raise SystemExit(f"{path}: no parseable bench JSON with a 'queries' map")


def _registry_names() -> set[str]:
    """Canonical query names from the live registry (lazy: importing
    the package pulls in pyspark, so only pay that when carry-forward
    validation actually runs)."""
    import sys

    sys.path.insert(0, REPO)
    from python_etl_sample_spark.registry import (
        canonical_names,
        load_all_operators,
    )

    load_all_operators()
    return set(canonical_names())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--fresh", default="", help="comma-separated changed-code names")
    ap.add_argument("--round", dest="rnd", required=True)
    ap.add_argument("--write", action="store_true")
    ap.add_argument(
        "--allow-drop",
        action="store_true",
        help="retire prior-ledger queries absent from every run file "
        "(default: carry their prior floors forward unchanged)",
    )
    args = ap.parse_args()

    fresh = {n for n in args.fresh.split(",") if n}
    prior = load_queries(LEDGER)
    runs = [load_queries(p) for p in args.runs]

    names = set().union(*runs)
    unknown_fresh = fresh - names
    if unknown_fresh:
        raise SystemExit(f"--fresh names not in runs: {sorted(unknown_fresh)}")

    merged: dict[str, float] = {}
    for n in sorted(names):
        new_min = min(r[n] for r in runs if n in r)
        if n in fresh or n not in prior:
            merged[n] = round(new_min, 4)
        else:
            merged[n] = round(min(prior[n], new_min), 4)

    absent = sorted(set(prior) - names)
    if absent and not args.allow_drop:
        # r12 ADVICE: a partial bench run must not erase recorded
        # floors — carry them forward verbatim.  r13 ADVICE: but a
        # carried name that no longer exists in the registry is a
        # deleted query whose floor would inflate the ledger total
        # forever — fail loudly and make the retirement explicit.
        ghosts = sorted(set(absent) - set(_registry_names()))
        if ghosts:
            raise SystemExit(
                f"carried-forward names no longer in the registry: "
                f"{ghosts} — re-run with --allow-drop to retire them"
            )
        for n in absent:
            merged[n] = prior[n]
        carried, dropped = absent, []
    else:
        carried, dropped = [], absent
    total = round(sum(merged.values()), 4)
    moves = sorted(
        ((n, prior[n], merged[n]) for n in merged if n in prior and prior[n] > 0),
        key=lambda t: -(t[2] / t[1]),
    )
    print(f"ledger: {total} s / {len(merged)} queries "
          f"(mean {total / len(merged):.4f} s/q); fresh={len(fresh)}, "
          f"new={len(names - set(prior))}, carried_forward={carried}, "
          f"dropped_from_prior={dropped}")
    print("top-8 upward moves (old -> merged):")
    for n, o, m in moves[:8]:
        print(f"  {n}: {o:.3f} -> {m:.3f} ({m / o:.2f}x)")

    if args.write:
        out = {
            "metric": "total_query_wall_seconds_floor",
            "value": total,
            "unit": "sec",
            "n_queries": len(merged),
            "sf": 0.1,
            "methodology": (
                f"per-query MIN over round-{args.rnd} sessions "
                f"({len(args.runs)} bench.py runs + quiet-session floor "
                "probes); queries whose implementation changed in "
                f"r{args.rnd} take fresh r{args.rnd} minima (stale floors "
                "dropped); unchanged queries keep min(prior ledger, new "
                "runs). Sentinels (scan_projected) recorded per run in "
                "the raw run JSONs."
            ),
            "fresh_this_round": sorted(fresh),
            "carried_forward": carried,
            "queries": merged,
        }
        with open(LEDGER, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", LEDGER)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
