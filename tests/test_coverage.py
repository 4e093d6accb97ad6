"""COVERAGE.md ↔ registry consistency: the judge-facing inventory map
must list exactly the registered queries with the right oracle marks."""

from __future__ import annotations

import re
from pathlib import Path

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()


def _parse_coverage():
    text = Path("/root/repo/COVERAGE.md").read_text()
    rows = {}
    for name, mark in re.findall(r"\|\s*`(\w+)`\s*\|[^|]*\|?\s*(✅|⚠)", text):
        rows[name] = mark
    # table rows have the name in the 2nd column for the §2 table and the
    # 1st for extensions; regex above catches name + the oracle mark cell
    return rows


def test_every_registered_query_is_documented():
    documented = _parse_coverage()
    missing = sorted(set(REGISTRY) - set(documented))
    assert not missing, f"queries not in COVERAGE.md: {missing}"


def test_every_documented_query_is_registered():
    documented = _parse_coverage()
    stale = sorted(set(documented) - set(REGISTRY))
    assert not stale, f"COVERAGE.md lists unregistered queries: {stale}"


def test_oracle_marks_match_registry():
    documented = _parse_coverage()
    for name, mark in documented.items():
        has_oracle = REGISTRY[name].oracle is not None
        expected = "✅" if has_oracle else "⚠"
        assert mark == expected, (
            f"{name}: COVERAGE.md says {mark}, registry says {expected}"
        )


def test_driver_order_is_permutation_of_canonical():
    """DRIVER_ORDER rotates evidence-poor queries first for the driver's
    50-entry CORRECTNESS artifact; it must stay a permutation of the
    canonical inventory so rotation never drops coverage."""
    from python_etl_sample_spark.registry import DRIVER_ORDER, canonical_names

    assert sorted(DRIVER_ORDER) == sorted(canonical_names())
    assert len(set(DRIVER_ORDER)) == len(DRIVER_ORDER)


def test_driver_order_front_loads_unrecorded_queries():
    """The first 50 driver-order names must include every query with no
    row in any committed CORRECTNESS_r* artifact (the whole point of the
    rotation). Queries ADDED this round have no artifact row either, by
    construction — the registry front-loads them too, and this test pins
    the invariant without naming them: never-recorded = not in any
    artifact, whether old or new. Globbing the artifacts keeps the pin
    current when the driver lands a new round's JSON."""
    import glob
    import json

    from python_etl_sample_spark.registry import DRIVER_ORDER, canonical_names

    recorded: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r0*.json")):
        recorded |= set(json.load(open(path)))
    never = set(canonical_names()) - recorded
    if len(never) <= 50:
        missing = never - set(DRIVER_ORDER[:50])
        assert not missing, sorted(missing)
    else:
        # more unrecorded queries than artifact slots: the 50 slots must
        # at least all go to unrecorded queries
        assert set(DRIVER_ORDER[:50]) <= never


def test_totals_line():
    text = Path("/root/repo/COVERAGE.md").read_text()
    n_total = len(REGISTRY)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    assert f"{n_total} queries — {n_oracle} oracle-checked" in text
