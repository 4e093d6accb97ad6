"""Round-13 hardening tests.

VERDICT r12 item 3: the HITS degree guard documents "set
_HITS_RENORM_EVERY = 1" as the remediation for a hot-node graph, but
until round 13 the guard bound was hard-wired to the cadence-2 value,
so following the remediation would have tripped the guard anyway.
These tests pin both halves on a synthetic hot-node (star) graph whose
max degree exceeds the cadence-2 bound:

- shipped cadence 2 → the guard trips loudly (no silent NULLs);
- remediation cadence 1 → the guard admits the graph (bound widens to
  ~10¹⁴) and the run completes with non-NULL, mass-conserving scores.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from python_etl_sample_spark.operators import round10b_ops as mod
from python_etl_sample_spark.operators.round10b_ops import (
    _HITS_RENORM_EVERY,
    _HITS_SCALE,
    _hits_maxdeg_bound,
    graph_hits_scores,
)

#: star fan-out: one customer shipping to this many suppliers —
#: just past the shipped cadence-2 bound (~4.6e4), far under the
#: cadence-1 bound (1e14)
_FAN = _hits_maxdeg_bound(2) + 100


@pytest.fixture(scope="module")
def hot_node_sf_dir(tmp_path_factory):
    """Minimal lineitem/orders fixture dir: customer 1 → suppliers
    1.._FAN via a single 1995-shipped order per supplier."""
    d = tmp_path_factory.mktemp("hits_hot_node")
    # 1995-06-01 00:00:00 (naive) in ms since epoch — inside the
    # query's 1995 ship-date window
    ship = pa.array([801964800000] * _FAN, pa.timestamp("ms"))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1] * _FAN, pa.int64()),
                "l_suppkey": pa.array(range(1, _FAN + 1), pa.int64()),
                "l_shipdate": ship,
            }
        ),
        str(d / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([1], pa.int64()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


def test_maxdeg_bound_formula():
    """The audited anchors: cadence 2 → ~4.6e4 (the shipped value),
    cadence 1 → the round-10 ~1e14 headroom."""
    assert _hits_maxdeg_bound(2) == 46_415
    assert _hits_maxdeg_bound(1) == 10**14
    assert _FAN > _hits_maxdeg_bound(2)
    assert _FAN < _hits_maxdeg_bound(1)


def test_hits_guard_trips_on_hot_node_graph(spark, hot_node_sf_dir):
    """Shipped cadence: a graph with maxdeg past the audited bound
    fails loudly with the remediation message."""
    assert _HITS_RENORM_EVERY == 2  # the shipped cadence this pins
    with pytest.raises(Exception, match="_HITS_RENORM_EVERY"):
        graph_hits_scores(spark, hot_node_sf_dir).collect()


def test_hits_fallback_cadence_admits_hot_node_graph(
    spark, hot_node_sf_dir, monkeypatch
):
    """The documented remediation actually works: under cadence 1 the
    guard widens to ~1e14, the hot-node run completes, every score is
    non-NULL, and each role's mass is SCALE minus < 1 unit per node
    (the renorm flooring invariant)."""
    monkeypatch.setattr(mod, "_HITS_RENORM_EVERY", 1)
    rows = graph_hits_scores(spark, hot_node_sf_dir).collect()
    assert len(rows) == _FAN + 1  # one hub + _FAN authorities
    assert all(r.score_scaled is not None for r in rows)
    hub_mass = sum(r.score_scaled for r in rows if r.role == "hub")
    auth_mass = sum(r.score_scaled for r in rows if r.role == "authority")
    n_hubs, n_auths = 1, _FAN
    assert _HITS_SCALE - n_hubs <= hub_mass <= _HITS_SCALE
    assert _HITS_SCALE - n_auths <= auth_mass <= _HITS_SCALE
    # star symmetry: the single hub holds all hub mass; authorities
    # split theirs evenly
    auth_scores = {
        r.score_scaled for r in rows if r.role == "authority"
    }
    assert len(auth_scores) == 1
