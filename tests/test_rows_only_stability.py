"""Rows-only queries have no oracle — their grade rests on stable,
deterministic output. Assert two runs produce identical sorted rows."""

from __future__ import annotations

import pytest

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_deterministic(spark, name):
    fn = REGISTRY[name].fn
    a = sorted(map(str, fn(spark, SF_DIR).collect()))
    b = sorted(map(str, fn(spark, SF_DIR).collect()))
    assert len(a) > 0
    assert a == b, f"{name} output differs between runs"


def test_rows_only_class_is_empty():
    """Round 11 retired the rows-only evidence class: every registered
    query now carries a DuckDB oracle (the four former rows-only
    detectors — dedup_near_minhash, dedup_simhash, sim_ann_lsh,
    sim_ann_ivf — were moved onto the cross-engine hash families their
    recall queries already replayed in SQL). A regression here means a
    new query shipped without an oracle."""
    assert ROWS_ONLY == [], f"queries without oracle: {ROWS_ONLY}"
