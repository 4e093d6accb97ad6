"""Round-7 batch-3 invariants (operators/round7c_ops.py): Markov P⁴
against a pure-Python matrix power on a hand-built chain plus row-
stochasticity at fixture scale, the LDP estimator's exact closed-form
identities, and harmonic centrality against hand-computed distances on
a path graph."""

from __future__ import annotations

import datetime as dt
from decimal import ROUND_HALF_UP, Decimal

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_D = dt.datetime

_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp_ntz"
)


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


# ---------------------------------------------------------------------------
# events_markov_kstep
# ---------------------------------------------------------------------------


def _matpow4(p1: dict[tuple[str, str], float]) -> dict[tuple[str, str], float]:
    """P⁴ with the engine's rounding contract: 12-dp per product term,
    exact sum over the intermediate state."""
    states = sorted({a for a, _ in p1} | {b for _, b in p1})
    pk = dict(p1)
    for _ in range(3):
        nxt: dict[tuple[str, str], float] = {}
        for (a, m), px in pk.items():
            for b in states:
                py = p1.get((m, b))
                if py is None:
                    continue
                nxt[(a, b)] = nxt.get((a, b), 0.0) + round(px * py, 12)
        pk = nxt
    return pk


def test_markov_kstep_matches_python_matrix_power(spark, tmp_path):
    """Two users with fixed event sequences → a known 3-state chain;
    P⁴ must equal the pure-Python matrix power under the identical
    rounding contract."""
    # user 1: a b a b a   → a->b ×2, b->a ×2
    # user 2: a a c a     → a->a, a->c, c->a
    seqs = {1: ["a", "b", "a", "b", "a"], 2: ["a", "a", "c", "a"]}
    rows, eid = [], 0
    for uid, seq in seqs.items():
        for i, et in enumerate(seq):
            eid += 1
            rows.append((eid, _D(1996, 1, 1, 0, i), uid, et, 1.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    got = {
        (r["event_type"], r["next_type"]): r["p4"]
        for r in REGISTRY["events_markov_kstep"].fn(spark, str(tmp_path)).collect()
    }
    p1 = {
        ("a", "b"): 2 / 4,
        ("a", "a"): 1 / 4,
        ("a", "c"): 1 / 4,
        ("b", "a"): 2 / 2,
        ("c", "a"): 1 / 1,
    }
    # both engines round HALF_UP (Python's round() is HALF_EVEN and
    # differs on exact ties like 0.1953125 — the chain's power-of-two
    # fractions hit them)
    r6 = lambda v: float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    want = {k: r6(v) for k, v in _matpow4(p1).items()}
    assert got == want


def test_markov_kstep_rows_are_stochastic_at_fixture_scale(spark):
    """Every state's outgoing P⁴ row sums to 1 (all fixture states have
    outgoing transitions, and matrix powers preserve stochasticity)."""
    rows = REGISTRY["events_markov_kstep"].fn(spark, SF_DIR).collect()
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r["event_type"]] = by_src.get(r["event_type"], 0.0) + r["p4"]
    assert len(by_src) == 5
    for src, s in by_src.items():
        assert abs(s - 1.0) < 1e-4, (src, s)


# ---------------------------------------------------------------------------
# anon_ldp_frequency
# ---------------------------------------------------------------------------


def test_ldp_estimator_identities(spark):
    """The closed form est = (7·obs − N)/2 and its corollary
    Σ est = Σ true = Σ obs = N (the estimator is exactly unbiased in
    aggregate because the alphabet partitions every report)."""
    rows = REGISTRY["anon_ldp_frequency"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    n = sum(r["true_n"] for r in rows)
    assert sum(r["observed_n"] for r in rows) == n
    for r in rows:
        assert r["estimated_n"] == round((7 * r["observed_n"] - n) / 2.0, 2)
    assert abs(sum(r["estimated_n"] for r in rows) - n) < 1e-9


def test_ldp_mechanism_shrinks_toward_uniform(spark):
    """Randomized response biases OBSERVED counts toward N/d: every
    category's observed count sits strictly between its true count and
    the uniform share unless true == uniform (contraction by p−q=2/7)."""
    rows = REGISTRY["anon_ldp_frequency"].fn(spark, SF_DIR).collect()
    n = sum(r["true_n"] for r in rows)
    uniform = n / 5.0
    for r in rows:
        lo, hi = sorted((r["true_n"], uniform))
        # expected obs = q·N + (p−q)·true = uniform + (2/7)(true−uniform);
        # the hash-noise is small at fixture scale — allow slack of
        # sqrt(N) around the contracted value
        expected = uniform + (2.0 / 7.0) * (r["true_n"] - uniform)
        assert abs(r["observed_n"] - expected) < 3.0 * (n ** 0.5), (
            r["event_type"],
            r["observed_n"],
            expected,
        )


# ---------------------------------------------------------------------------
# graph_harmonic_centrality
# ---------------------------------------------------------------------------


def test_harmonic_centrality_on_path_graph(spark, tmp_path):
    """Orders {1,2},{2,3},{3,4} make the path 1-2-3-4; with ≤10 nodes
    every node is a landmark and H₃ is hand-computable."""
    rows, lid = [], 0
    for ok, (pa, pb) in enumerate([(1, 2), (2, 3), (3, 4)], start=1):
        for pk in (pa, pb):
            lid += 1
            rows.append(
                (ok, pk, 1, lid, 1.0, 100.0, 0.0, 0.0, "N", "O",
                 _D(1995, 6, 1))
            )
    _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    got = {
        r["seed"]: (r["reached_1"], r["reached_2"], r["reached_3"], r["harmonic3"])
        for r in REGISTRY["graph_harmonic_centrality"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    h = round(1 + 1 / 2.0 + 1 / 3.0, 6)  # end nodes: dists 1,2,3
    assert got == {
        1: (1, 1, 1, h),
        4: (1, 1, 1, h),
        2: (2, 1, 0, round(2 + 1 / 2.0, 6)),
        3: (2, 1, 0, round(2 + 1 / 2.0, 6)),
    }


def test_harmonic_centrality_fixture_sanity(spark):
    """At fixture scale: exactly 10 landmark rows, harmonic3 consistent
    with its reached_k decomposition, and reached counts positive for
    hub seeds."""
    rows = REGISTRY["graph_harmonic_centrality"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        want = round(
            r["reached_1"] + r["reached_2"] / 2.0 + r["reached_3"] / 3.0, 6
        )
        assert r["harmonic3"] == want
        assert r["reached_1"] > 0
