"""Round-6 batch-3 invariants (operators/round6c_ops.py): LPA community
structure on an engineered two-clique graph, KS extremes (0 on
identical samples, →1 on disjoint supports), l-diversity homogeneity
detection, and cross-correlation's exact-lag recovery."""

from __future__ import annotations

import datetime as dt

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

_D = dt.datetime


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


def _lineitem_orders(pairs):
    """lineitem rows placing each (orderkey, partkey) in 1995 so the
    co-purchase edge builder sees them."""
    return [
        (ok, pk, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O", _D(1995, 6, 1))
        for i, (ok, pk) in enumerate(pairs)
    ]


_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp_ntz"
)

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)

_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
    " c_mktsegment string"
)


def test_lpa_two_cliques_converge_to_two_communities(spark, tmp_path):
    """Two 4-cliques (parts 1-4 and 11-14) bridged by one edge (4-11):
    after 3 deterministic rounds every clique node carries its clique's
    minimum label, giving exactly two communities anchored at 1 and
    11."""
    pairs = []
    # a clique = one order containing all its parts
    pairs += [(100, p) for p in (1, 2, 3, 4)]
    pairs += [(200, p) for p in (11, 12, 13, 14)]
    pairs += [(300, 4), (300, 11)]  # bridge
    _write(spark, tmp_path, "lineitem", _lineitem_orders(pairs), _LI_SCHEMA)
    rows = REGISTRY["graph_label_propagation"].fn(spark, str(tmp_path)).collect()
    got = {r["community"]: r["n_members"] for r in rows}
    # min-label tie-breaks pull each clique to its smallest id; the
    # bridge nodes keep their clique's plurality
    assert got == {1: 4, 11: 4}, rows


def test_ks_zero_and_one_extremes(spark, tmp_path):
    """KS D is 0 when both eras draw the identical multiset, and
    (n-1)/n≈1 when supports are disjoint (every pre-era price below
    every post-era price)."""
    rows = []
    # priority SAME: identical multisets in both eras
    for i in range(50):
        price = 1000.0 + i
        rows.append((2 * i, 1, "O", price, _D(1996, 1, 1), "SAME"))
        rows.append((2 * i + 1, 1, "O", price, _D(2000, 1, 1), "SAME"))
    # priority DISJ: era a in [1k,2k), era b in [100k,101k)
    base = 1000
    for i in range(50):
        rows.append((10000 + 2 * i, 1, "O", 1000.0 + i, _D(1996, 1, 1), "DISJ"))
        rows.append((10001 + 2 * i, 1, "O", 100000.0 + i, _D(2000, 1, 1), "DISJ"))
    del base
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    out = {r["priority"]: r for r in REGISTRY["stats_ks_two_sample"].fn(spark, str(tmp_path)).collect()}
    assert out["SAME"]["ks_d"] == 0.0
    assert out["DISJ"]["ks_d"] == 1.0
    assert out["SAME"]["n_before"] == 50 and out["SAME"]["n_after"] == 50


def test_l_diversity_flags_homogeneous_classes(spark, tmp_path):
    """A QI class whose members all share one segment is below l=2; a
    two-segment class passes l=2 but fails l=3."""
    custs = []
    # class (nation 1, band 0): 3 members, ALL 'BUILDING' -> diversity 1
    for i in range(3):
        custs.append((i, f"Customer#{i}", 1, 10.0, "BUILDING"))
    # class (nation 2, band 0): 4 members over 2 segments -> diversity 2
    for i in range(4):
        custs.append((10 + i, f"Customer#{10 + i}", 2, 10.0, ["AUTOMOBILE", "MACHINERY"][i % 2]))
    _write(spark, tmp_path, "customer", custs, _CUST_SCHEMA)
    out = {r["l_threshold"]: r for r in REGISTRY["anon_l_diversity"].fn(spark, str(tmp_path)).collect()}
    assert out[2]["n_classes"] == 2
    assert out[2]["min_diversity"] == 1
    assert out[2]["n_classes_below"] == 1 and out[2]["n_rows_at_risk"] == 3
    assert out[3]["n_classes_below"] == 2 and out[3]["n_rows_at_risk"] == 7


def test_xcorr_recovers_planted_lag(spark, tmp_path):
    """AUTOMOBILE revenue = BUILDING revenue shifted forward one day
    (y[d+1] = x[d] + noise-free affine): the lag=+1 correlation is
    exactly 1.0 and flat-series lags are below it."""
    orders = []
    custs = [
        (1, "Customer#1", 1, 10.0, "BUILDING"),
        (2, "Customer#2", 1, 10.0, "AUTOMOBILE"),
    ]
    _write(spark, tmp_path, "customer", custs, _CUST_SCHEMA)
    # deterministic non-constant daily series
    vals = [1000.0 + 137 * ((7 * i) % 23) for i in range(40)]
    ok = 0
    for i, v in enumerate(vals):
        day = _D(1996, 1, 1) + dt.timedelta(days=i)
        orders.append((ok, 1, "O", v, day, "1-URGENT")); ok += 1
        # y at day+1 carries 2x + 500 (affine -> r = 1)
        orders.append((ok, 2, "O", 2 * v + 500.0, day + dt.timedelta(days=1), "1-URGENT")); ok += 1
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    out = {r["lag"]: r for r in REGISTRY["ts_cross_correlation"].fn(spark, str(tmp_path)).collect()}
    assert out[1]["xcorr"] == 1.0
    for lag, r in out.items():
        if lag != 1 and r["n_days"] and r["n_days"] > 2:
            assert r["xcorr"] < 1.0, (lag, r)
