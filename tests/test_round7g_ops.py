"""Round-7 batch-7 invariants (operators/round7g_ops.py): funnel
latency against hand-timed sequences, containment's asymmetric
detection on an embedded document (where Jaccard stays low), and
modularity's textbook values on a two-clique graph plus its defining
identities at fixture scale."""

from __future__ import annotations

import datetime as dt

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_D = dt.datetime

_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
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
# events_funnel_latency
# ---------------------------------------------------------------------------


def test_funnel_latency_hand_timed_sequences(spark, tmp_path):
    """Three converting users with gaps of exactly 10/20/30 minutes
    (signup→view) and 5/5/50 (view→purchase): means and exact rank
    percentiles are hand-computable."""
    rows, eid = [], 0
    specs = [  # (uid, s2v minutes, v2p minutes)
        (1, 10, 5),
        (2, 20, 5),
        (3, 30, 50),
    ]
    for uid, g1, g2 in specs:
        t0 = _D(2024, 1, 10, 8, 0, 0)
        for et, t in (
            ("signup", t0),
            ("view", t0 + dt.timedelta(minutes=g1)),
            ("purchase", t0 + dt.timedelta(minutes=g1 + g2)),
        ):
            eid += 1
            rows.append((eid, t, uid, et, 1.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    got = {
        r["stage"]: r
        for r in REGISTRY["events_funnel_latency"].fn(spark, str(tmp_path)).collect()
    }
    s2v = got["signup_to_view"]
    assert s2v["n_users"] == 3
    assert s2v["mean_minutes"] == 20.0
    assert s2v["p50_minutes"] == 20.0  # rank ceil(1.5) = 2 -> 20
    assert s2v["p90_minutes"] == 30.0  # rank ceil(2.7) = 3 -> 30
    v2p = got["view_to_purchase"]
    assert v2p["n_users"] == 3
    assert v2p["mean_minutes"] == 20.0
    assert v2p["p50_minutes"] == 5.0
    assert v2p["p90_minutes"] == 50.0


def test_funnel_latency_fixture_shape(spark):
    """Both stages emit; percentiles are consistent (p50 ≤ p90) and
    positive; converters never exceed the viewer count."""
    got = {
        r["stage"]: r
        for r in REGISTRY["events_funnel_latency"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == {"signup_to_view", "view_to_purchase"}
    for r in got.values():
        assert r["n_users"] > 0
        assert 0 <= r["p50_minutes"] <= r["p90_minutes"]
    assert got["view_to_purchase"]["n_users"] <= got["signup_to_view"]["n_users"]


# ---------------------------------------------------------------------------
# text_containment_dedup
# ---------------------------------------------------------------------------


def test_containment_detects_embedded_document(spark, tmp_path):
    """Doc 1 is fully embedded in doc 2 (10× longer): containment
    C(1→2) = 1.0 fires while symmetric Jaccard stays ≈ 0.1 — the case
    this operator exists for. The reverse direction must NOT fire."""
    inner = " ".join(f"core{i}" for i in range(12))
    outer = inner + " " + " ".join(f"pad{i}" for i in range(100))
    rows = [
        (1, inner, "en", "web", len(inner)),
        (2, outer, "en", "web", len(outer)),
        (3, "totally unrelated words only here", "en", "web", 33),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = {
        (r["contained_doc"], r["container_doc"]): r
        for r in REGISTRY["text_containment_dedup"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)]["containment"] == 1.0
    assert got[(1, 2)]["n_contained"] == 10  # 12 tokens -> 10 shingles
    assert (2, 1) not in got
    assert all(3 not in k for k in got)


def test_containment_is_superset_of_symmetric_jaccard_pairs(spark):
    """Any pair with symmetric Jaccard ≥ 0.8 has max-direction
    containment ≥ 0.8 ≥ ... and in this corpus all such pairs clear the
    0.9 containment bar in at least one direction (near-identical docs
    contain each other)."""
    jac = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    cont = {
        (r["contained_doc"], r["container_doc"])
        for r in REGISTRY["text_containment_dedup"].fn(spark, SF_DIR).collect()
    }
    assert cont
    for r in jac:
        a, b = r["doc_a"], r["doc_b"]
        assert (a, b) in cont or (b, a) in cont, (a, b)


# ---------------------------------------------------------------------------
# graph_community_modularity
# ---------------------------------------------------------------------------


def test_modularity_on_two_cliques(spark, tmp_path):
    """Two disjoint triangles: LPA resolves each as one community; with
    m = 6, each community has m_c = 3, d_c = 6 → Q_c = 3/6 − (6/12)² =
    0.25, total Q = 0.5 — the textbook two-clique value."""
    rows, lid = [], 0
    # order 1 = parts {1,2,3} (triangle), order 2 = parts {4,5,6}
    for ok, parts in ((1, (1, 2, 3)), (2, (4, 5, 6))):
        for pk in parts:
            lid += 1
            rows.append(
                (ok, pk, 1, lid, 1.0, 100.0, 0.0, 0.0, "N", "O", _D(1995, 6, 1))
            )
    _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    got = REGISTRY["graph_community_modularity"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 2
    for r in got:
        assert r["n_members"] == 3
        assert r["n_internal_edges"] == 3
        assert r["degree_sum"] == 6
        assert r["q_term"] == 0.25
    assert sum(r["q_term"] for r in got) == 0.5


def test_modularity_identities_at_fixture_scale(spark):
    """Defining identities: Σ n_members = |nodes|, Σ degree_sum = 2m,
    Σ n_internal_edges ≤ m, and Q = Σ q_term ∈ (−1, 1]. Communities
    must equal the LPA query's communities exactly."""
    rows = REGISTRY["graph_community_modularity"].fn(spark, SF_DIR).collect()
    lpa = {
        r["community"]: r["n_members"]
        for r in REGISTRY["graph_label_propagation"].fn(spark, SF_DIR).collect()
    }
    assert {r["community"]: r["n_members"] for r in rows} == lpa
    two_m = sum(r["degree_sum"] for r in rows)
    assert two_m % 2 == 0
    m = two_m // 2
    assert sum(r["n_internal_edges"] for r in rows) <= m
    q = sum(r["q_term"] for r in rows)
    assert -1.0 < q <= 1.0
