"""Round-over-round bench regression report.

Usage: python tools/bench_diff.py NEW.json [OLD.json] [--table]

Compares per-query wall times between two bench snapshots (the driver's
BENCH_r{N}.json, or the in-repo BENCH_local.json, whose `parsed`/raw
layouts are both accepted) and flags queries slower than
REGRESSION_RATIO×. Exits non-zero if any flagged query regressed by more
than the ratio AND by more than ABS_FLOOR seconds (sub-100ms timings are
dominated by task-launch noise at fixture scale).

``--table`` additionally prints a markdown table of EVERY shared query
(old, new, ratio) — the committed round-over-round record (VERDICT r4
item 6: ratios must not depend on the driver artifact's truncated
tail). Pipe it into BENCH_DIFF_r{N}.md.
"""

from __future__ import annotations

import json
import sys

REGRESSION_RATIO = 1.5
ABS_FLOOR = 0.25  # seconds — ignore ratio blips below this absolute delta


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        text = fh.read()
    # accept: plain bench JSON; driver artifact with "parsed"; or a
    # multi-line file whose last parseable line wins
    for candidate in (text, *reversed(text.strip().splitlines())):
        try:
            obj = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            if isinstance(obj.get("queries"), dict):
                return {k: float(v) for k, v in obj["queries"].items()}
            parsed = obj.get("parsed")
            if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
                return {k: float(v) for k, v in parsed["queries"].items()}
    raise SystemExit(f"{path}: no parseable bench JSON with a 'queries' map")


def main(argv: list[str]) -> int:
    argv = list(argv)
    table = "--table" in argv
    if table:
        argv.remove("--table")
    if len(argv) < 2:
        print(__doc__)
        return 2
    new_path = argv[1]
    old_path = argv[2] if len(argv) > 2 else "/root/repo/BENCH_local.json"
    new, old = load_queries(new_path), load_queries(old_path)

    if table:
        # header caveat (VERDICT r9 item 6): driver tails are one run
        # each — per-query ratios here swing ±50% with ambient load and
        # must not be read as regressions on their own
        print(
            "> Driver bench tails are SINGLE-RUN timings; per-query "
            "ratios are noise-dominated below ~1 s. Adjudicate "
            "regressions with the multi-run floors in BENCH_local.json "
            "(tools/floor_probe.py), not this table."
        )
        print()
        shared = sorted(k for k in new if k in old and old[k] > 0)
        geo = 1.0
        print("| query | old s | new s | ratio |")
        print("|---|---|---|---|")
        for name in shared:
            r = new[name] / old[name]
            geo *= r
            print(f"| {name} | {old[name]:.3f} | {new[name]:.3f} | {r:.2f}x |")
        geo **= 1 / max(1, len(shared))
        print(
            f"\nShared queries: {len(shared)}; total "
            f"{sum(old[k] for k in shared):.1f}s -> "
            f"{sum(new[k] for k in shared):.1f}s; geometric-mean "
            f"per-query ratio {geo:.3f}x."
        )
        for name in sorted(set(new) - set(old)):
            print(f"- new (no baseline): {name} {new[name]:.3f}s")
        print()

    regressions, improvements = [], []
    for name in sorted(new):
        if name not in old:
            continue
        delta = new[name] - old[name]
        ratio = new[name] / old[name] if old[name] > 0 else float("inf")
        if ratio >= REGRESSION_RATIO and delta >= ABS_FLOOR:
            regressions.append((ratio, delta, name))
        elif ratio <= 1 / REGRESSION_RATIO and -delta >= ABS_FLOOR:
            improvements.append((ratio, delta, name))

    t_new, t_old = sum(new.values()), sum(v for k, v in old.items() if k in new)
    print(f"total (shared queries): {t_old:.1f}s -> {t_new:.1f}s")
    for ratio, delta, name in sorted(improvements):
        print(f"  faster  {name}: {old[name]:.2f}s -> {new[name]:.2f}s ({ratio:.2f}x)")
    for ratio, delta, name in sorted(regressions, reverse=True):
        print(f"  SLOWER  {name}: {old[name]:.2f}s -> {new[name]:.2f}s ({ratio:.2f}x)")
    added = sorted(set(new) - set(old))
    if added:
        print(f"  new queries (no baseline): {', '.join(added)}")
    if not regressions:
        print("no regressions >= 1.5x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
