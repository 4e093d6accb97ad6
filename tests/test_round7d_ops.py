"""Round-7 batch-4 invariants (operators/round7d_ops.py): Brown's
smoothing against a pure-Python banded-EWMA reference on a linear
series (where level/trend/forecast have closed forms), Theil–Sen
against the hand-computable median on a series with one outlier, WOE/IV
against textbook formulas on engineered class balances, and the Bloom
filter's two defining guarantees (zero false negatives; false positives
only outside the member set)."""

from __future__ import annotations

import datetime as dt
import math

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_D = dt.datetime

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)
_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
    " c_mktsegment string"
)


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


def _orders_daily(revs):
    """One order per day with the given totalprice, Jan 1 1996 on."""
    base = _D(1996, 1, 1)
    return [
        (i + 1, 1, "O", float(r), base + dt.timedelta(days=i), "3-MEDIUM")
        for i, r in enumerate(revs)
    ]


# ---------------------------------------------------------------------------
# ts_double_exponential_forecast
# ---------------------------------------------------------------------------


def _banded_ewma(vals, win=20):
    out = []
    for t in range(len(vals)):
        lo = max(0, t - (win - 1))
        ws = [2 ** (win - 1 - (t - s)) for s in range(lo, t + 1)]
        vs = vals[lo : t + 1]
        out.append(round(sum(w * v for w, v in zip(ws, vs)) / sum(ws), 6))
    return out


def test_double_exponential_matches_python_reference_on_linear_series(
    spark, tmp_path
):
    """Daily revenue 100, 110, 120, … (slope 10): after warm-up the
    smoothing must track the line — trend ≈ slope, forecast ≈ next
    value — and every reported S1/S2 equals the banded-EWMA reference."""
    revs = [100.0 + 10.0 * i for i in range(50)]
    _write(spark, tmp_path, "orders", _orders_daily(revs), _ORD_SCHEMA)
    rows = sorted(
        REGISTRY["ts_double_exponential_forecast"].fn(
            spark, str(tmp_path)
        ).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == 5  # tail of 50 days, all past warm-up (>= 40)
    s1_ref = _banded_ewma(revs)
    s2_ref = _banded_ewma(s1_ref)
    for r, t in zip(rows, range(45, 50)):
        assert r["s1"] == s1_ref[t]
        assert r["s2"] == s2_ref[t]
        assert r["level"] == round(2 * s1_ref[t] - s2_ref[t], 6)
        assert r["trend"] == round(s1_ref[t] - s2_ref[t], 6)
        # a linear series is Brown's exact regime: trend -> slope and
        # the one-step forecast -> the next point (truncation noise
        # is below 1e-3 after 2x the window)
        assert abs(r["trend"] - 10.0) < 1e-3
        assert abs(r["forecast_next"] - (revs[t] + 10.0)) < 1e-2


# ---------------------------------------------------------------------------
# stats_theil_sen_trend
# ---------------------------------------------------------------------------


def test_theil_sen_ignores_single_outlier(spark, tmp_path):
    """Slope-2 line with one wild outlier: OLS would be dragged; the
    median pairwise slope must equal the pure-Python median exactly."""
    revs = [100.0 + 2.0 * i for i in range(15)]
    revs[7] = 5000.0  # outlier
    _write(spark, tmp_path, "orders", _orders_daily(revs), _ORD_SCHEMA)
    row = REGISTRY["stats_theil_sen_trend"].fn(spark, str(tmp_path)).collect()[0]
    n = len(revs)
    slopes = sorted(
        (revs[j] - revs[i]) / (j - i)
        for i in range(n)
        for j in range(i + 1, n)
    )
    m = len(slopes)
    want = (slopes[(m + 1) // 2 - 1] + slopes[(m + 2) // 2 - 1]) / 2.0
    assert row["n_days"] == n
    assert row["n_pairs"] == m
    assert row["theil_sen_slope"] == round(want, 6)
    assert abs(row["theil_sen_slope"] - 2.0) < 0.2  # robust to the outlier


# ---------------------------------------------------------------------------
# features_woe_iv
# ---------------------------------------------------------------------------


def test_woe_iv_matches_textbook_formula(spark, tmp_path):
    """Two segments with engineered pos/neg counts: WOE and IV terms
    must equal ln((pos/G)/(neg/B)) and (pos/G − neg/B)·WOE exactly."""
    # BUILDING: 6 pos, 2 neg; MACHINERY: 2 pos, 6 neg
    custs = [
        (1, "C1", 1, 0.0, "BUILDING"),
        (2, "C2", 1, 0.0, "MACHINERY"),
    ]
    orders, ok = [], 0
    for cust, pos, neg in ((1, 6, 2), (2, 2, 6)):
        for _ in range(pos):
            ok += 1
            orders.append((ok, cust, "O", 100.0, _D(1996, 1, 1), "1-URGENT"))
        for _ in range(neg):
            ok += 1
            orders.append((ok, cust, "O", 100.0, _D(1996, 1, 2), "5-LOW"))
    _write(spark, tmp_path, "customer", custs, _CUST_SCHEMA)
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    got = {
        r["segment"]: r
        for r in REGISTRY["features_woe_iv"].fn(spark, str(tmp_path)).collect()
    }
    G, B = 8.0, 8.0
    for seg, pos, neg in (("BUILDING", 6, 2), ("MACHINERY", 2, 6)):
        woe = math.log((pos / G) / (neg / B))
        iv = (pos / G - neg / B) * woe
        assert got[seg]["n_pos"] == pos and got[seg]["n_neg"] == neg
        assert got[seg]["woe"] == round(woe, 6)
        assert got[seg]["iv_term"] == round(iv, 6)
    # symmetric balances -> antisymmetric WOE, equal IV contributions
    assert got["BUILDING"]["woe"] == -got["MACHINERY"]["woe"]
    assert got["BUILDING"]["iv_term"] == got["MACHINERY"]["iv_term"]


def test_woe_iv_fixture_sanity(spark):
    """All five fixture segments emit (no zero cells) and every IV term
    is non-negative (it is (a−b)·ln(a/b), which has the sign of (a−b)²)."""
    rows = REGISTRY["features_woe_iv"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["iv_term"] >= 0.0
        assert r["n_pos"] > 0 and r["n_neg"] > 0


# ---------------------------------------------------------------------------
# sketch_bloom_filter
# ---------------------------------------------------------------------------


def test_bloom_filter_guarantees(spark):
    """Bloom's contract at fixture scale: every true member is claimed
    (NO false negatives — claimed ≥ members and false positives account
    for exactly the difference), and the realized FPR is consistent."""
    row = REGISTRY["sketch_bloom_filter"].fn(spark, SF_DIR).collect()[0]
    assert row["n_probes"] > 0
    assert row["n_members"] > 0
    assert row["n_claimed"] >= row["n_members"]
    assert row["n_false_positive"] == row["n_claimed"] - row["n_members"]
    non_members = row["n_probes"] - row["n_members"]
    assert row["fpr"] == round(row["n_false_positive"] / non_members, 6)
    # 1024 bits over ~150 members x 3 hashes keeps the realized FPR in
    # the theoretical ballpark ((1-e^{-kn/m})^k); generous upper bound
    assert row["fpr"] < 0.5
