"""Round-7 batch-6 invariants (operators/round7f_ops.py): ESD's
masked-outlier recovery on an engineered series, incremental dedup's
flag/attribution contract, the DP mechanism's exact noise bounds and
coin arithmetic, and the theta intersection against a brute-force
Python sketch."""

from __future__ import annotations

import datetime as dt
import hashlib

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_D = dt.datetime

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


# ---------------------------------------------------------------------------
# ts_anomaly_esd
# ---------------------------------------------------------------------------


def test_esd_finds_masked_outliers_in_order(spark, tmp_path):
    """Flat series at 100 with spikes 10000, 5000, 2000: ESD must peel
    them in magnitude order across its three rounds — the second and
    third are exactly the outliers a one-shot z-test can under-score
    after the first inflates σ."""
    revs = [100.0] * 30
    revs[5], revs[12], revs[20] = 10000.0, 5000.0, 2000.0
    base = _D(1996, 1, 1)
    orders = [
        (i + 1, 1, "O", revs[i], base + dt.timedelta(days=i), "3-MEDIUM")
        for i in range(30)
    ]
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    rows = sorted(
        REGISTRY["ts_anomaly_esd"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["round_no"],
    )
    assert [r["revenue"] for r in rows] == [10000.0, 5000.0, 2000.0]
    assert [r["day"].day for r in rows] == [6, 13, 21]
    assert all(r["z"] > 0 for r in rows)


def test_esd_fixture_rounds_are_distinct_days(spark):
    rows = REGISTRY["ts_anomaly_esd"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    assert len({r["day"] for r in rows}) == 3
    assert sorted(r["round_no"] for r in rows) == [1, 2, 3]


# ---------------------------------------------------------------------------
# dedup_incremental_batch
# ---------------------------------------------------------------------------


def test_incremental_batch_flags_and_attribution(spark, tmp_path):
    """Batch = doc_id % 5 == 0. doc 5 duplicates corpus docs 3 AND 7 →
    is_dup with dup_of = 3 (the MIN); doc 10 is novel → kept."""
    rows = [
        (3, "same text here", "en", "web", 14),
        (7, "same text here", "en", "web", 14),
        (4, "other corpus doc", "en", "web", 16),
        (5, "Same Text Here  ", "en", "web", 16),  # dup after lower+trim
        (10, "completely new content", "en", "web", 22),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_incremental_batch"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {5, 10}
    assert got[5]["is_dup"] == 1 and got[5]["dup_of"] == 3
    assert got[10]["is_dup"] == 0 and got[10]["dup_of"] is None


def test_incremental_batch_fixture_consistency(spark):
    """Every batch doc appears exactly once; dup_of is never a batch
    doc and always carries the dup flag."""
    rows = REGISTRY["dedup_incremental_batch"].fn(spark, SF_DIR).collect()
    assert rows and all(r["doc_id"] % 5 == 0 for r in rows)
    assert len({r["doc_id"] for r in rows}) == len(rows)
    for r in rows:
        if r["is_dup"]:
            assert r["dup_of"] is not None and r["dup_of"] % 5 != 0
        else:
            assert r["dup_of"] is None


# ---------------------------------------------------------------------------
# anon_dp_geometric_histogram
# ---------------------------------------------------------------------------


def test_dp_histogram_noise_matches_python_coin(spark):
    """Recompute each category's coin and inverse-CDF draw in pure
    Python; noise must match exactly and stay within the truncation
    bound |k| ≤ 3, with released = max(true + k, 0)."""
    M = 1000003

    def draw(event_type: str) -> int:
        u = int(hashlib.sha256(event_type.encode()).hexdigest()[:12], 16) % M
        for c, k in ((28, 0), (37, 1), (46, -1), (49, 2), (52, -2), (53, 3)):
            if 54 * u < c * M:
                return k
        return -3

    rows = REGISTRY["anon_dp_geometric_histogram"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["noise_k"]) <= 3
        assert r["noise_k"] == draw(r["event_type"])
        assert r["released_n"] == max(r["true_n"] + r["noise_k"], 0)


def test_dp_histogram_clamps_at_zero(spark, tmp_path):
    """A category with true count smaller than a negative draw must
    release 0, not a negative count."""
    # find an event-type string whose draw is negative
    M = 1000003

    def draw(s: str) -> int:
        u = int(hashlib.sha256(s.encode()).hexdigest()[:12], 16) % M
        for c, k in ((28, 0), (37, 1), (46, -1), (49, 2), (52, -2), (53, 3)):
            if 54 * u < c * M:
                return k
        return -3

    neg = next(s for s in (f"type{i}" for i in range(1000)) if draw(s) < 0)
    rows = [(1, _D(2024, 1, 10), 1, neg, 1.0, "{}")]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    got = REGISTRY["anon_dp_geometric_histogram"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    assert got[0]["true_n"] == 1
    assert got[0]["noise_k"] < 0
    assert got[0]["released_n"] == 0


# ---------------------------------------------------------------------------
# sketch_theta_intersection
# ---------------------------------------------------------------------------


def test_theta_intersection_matches_python_sketch(spark):
    """Brute-force the KMV-theta estimator in Python from the raw
    fixture (same sha256-prefix hashes, k = 64) and compare every
    pair's theta estimate and sample count exactly."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    by_type: dict[str, set[int]] = {}
    for et, uid in rows:
        by_type.setdefault(et, set()).add(uid)
    h = lambda uid: int(
        hashlib.sha256(str(uid).encode()).hexdigest()[:12], 16
    )
    hashes = {et: sorted({h(u) for u in users}) for et, users in by_type.items()}
    K, SPACE = 64, float(1 << 48)

    got = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["sketch_theta_intersection"].fn(spark, SF_DIR).collect()
    }
    types = sorted(by_type)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            # unsaturated sketches (< k hashes) keep theta = full space
            th_a = hashes[a][K - 1] if len(hashes[a]) >= K else int(SPACE)
            th_b = hashes[b][K - 1] if len(hashes[b]) >= K else int(SPACE)
            theta = min(th_a, th_b)
            inter = {x for x in hashes[a] if x < theta} & set(hashes[b])
            r = got[(a, b)]
            assert r["n_sample"] == len(inter)
            assert r["theta_est"] == round(len(inter) * SPACE / theta, 6)
            assert r["n_exact"] == len(by_type[a] & by_type[b])
            if theta == int(SPACE):
                # degraded-to-exact branch: estimate IS the sample size
                assert r["theta_est"] == float(r["n_sample"])
