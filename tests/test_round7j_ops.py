"""Round-7 batch-10 invariants (operators/round7j_ops.py): AUC against
hand-ranked data and a pure-Python midrank reference, calibration-bin
accounting, the gains table's defining identities, and Kruskal-Wallis
against the textbook worked example."""

from __future__ import annotations

import datetime as dt

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


def _orders(specs):
    """(price, urgent) pairs → orders rows."""
    return [
        (i + 1, 1, "O", float(price),
         _D(2024, 1, 1), "1-URGENT" if pos else "5-LOW")
        for i, (price, pos) in enumerate(specs)
    ]


def _auc_reference(specs):
    """Midrank AUC in pure Python (the sklearn tie treatment)."""
    scores = sorted({s for s, _ in specs})
    ranks = {}
    below = 0
    for s in scores:
        t = sum(1 for x, _ in specs if x == s)
        ranks[s] = below + (t + 1) / 2.0
        below += t
    pos = [s for s, y in specs if y]
    n1, n0 = len(pos), len(specs) - len(pos)
    rsum = sum(ranks[s] for s in pos)
    return (rsum - n1 * (n1 + 1) / 2.0) / (n1 * n0)


# ---------------------------------------------------------------------------
# ml_roc_auc
# ---------------------------------------------------------------------------


def test_auc_perfect_and_inverted(spark, tmp_path):
    """All positives above all negatives → AUC 1 (Gini 1); inverted
    ordering → AUC 0 (Gini −1)."""
    perfect = [(100.0, 0), (200.0, 0), (300.0, 1), (400.0, 1)]
    _write(spark, tmp_path, "orders", _orders(perfect), _ORD_SCHEMA)
    r = REGISTRY["ml_roc_auc"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"], r["gini"]) == (2, 2, 1.0, 1.0)
    inverted = [(100.0, 1), (200.0, 1), (300.0, 0), (400.0, 0)]
    _write(spark, tmp_path, "orders", _orders(inverted), _ORD_SCHEMA)
    r = REGISTRY["ml_roc_auc"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["auc"], r["gini"]) == (0.0, -1.0)


def test_auc_midrank_ties_match_reference(spark, tmp_path):
    """Ties spanning both classes take average ranks: compare against
    the pure-Python midrank AUC on a crafted tied dataset."""
    specs = [
        (100.0, 0), (100.0, 1), (200.0, 0), (200.0, 0), (200.0, 1),
        (300.0, 1), (300.0, 0), (400.0, 1),
    ]
    _write(spark, tmp_path, "orders", _orders(specs), _ORD_SCHEMA)
    r = REGISTRY["ml_roc_auc"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(r["auc"] - round(_auc_reference(specs), 6)) < 1e-9


def test_auc_degenerate_single_class_is_null(spark, tmp_path):
    """No negatives → AUC undefined → NULL, not an error."""
    specs = [(100.0, 1), (200.0, 1)]
    _write(spark, tmp_path, "orders", _orders(specs), _ORD_SCHEMA)
    r = REGISTRY["ml_roc_auc"].fn(spark, str(tmp_path)).collect()[0]
    assert r["auc"] is None and r["gini"] is None
    assert (r["n_pos"], r["n_neg"]) == (2, 0)


def test_auc_equals_rank_sum_transform_at_fixture(spark):
    """AUC ∈ [0,1] and n_pos+n_neg equals the orders row count."""
    from python_etl_sample_spark.sources import table

    r = REGISTRY["ml_roc_auc"].fn(spark, SF_DIR).collect()[0]
    n = table(spark, SF_DIR, "orders").count()
    assert r["n_pos"] + r["n_neg"] == n
    assert 0.0 <= r["auc"] <= 1.0
    assert abs(r["gini"] - (2 * r["auc"] - 1)) < 2e-6


# ---------------------------------------------------------------------------
# ml_calibration_bins
# ---------------------------------------------------------------------------


def test_calibration_bins_partition_the_data(spark):
    """Bin ids live in 0..9, every order lands in exactly one bin, and
    per-bin Brier is bounded by the worst-case (p−y)² of 1."""
    from python_etl_sample_spark.sources import table

    rows = REGISTRY["ml_calibration_bins"].fn(spark, SF_DIR).collect()
    n = table(spark, SF_DIR, "orders").count()
    assert sum(r["n_rows"] for r in rows) == n
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["avg_pred"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0
        assert 0.0 <= r["brier"] <= 1.0
        # bin b holds predictions in [b/10, (b+1)/10)
        assert r["bin"] / 10.0 - 1e-9 <= r["avg_pred"] <= (r["bin"] + 1) / 10.0


def test_calibration_perfectly_separated_scores(spark, tmp_path):
    """A bimodal value distribution pushes the logistic score to the
    extreme bins; labels aligned with value make the top bin all-pos
    and the bottom bin all-neg, with per-bin Brier near zero there."""
    specs = [(100.0, 0)] * 10 + [(100000.0, 1)] * 10
    _write(spark, tmp_path, "orders", _orders(specs), _ORD_SCHEMA)
    rows = {
        r["bin"]: r
        for r in REGISTRY["ml_calibration_bins"].fn(spark, str(tmp_path)).collect()
    }
    lo, hi = min(rows), max(rows)
    assert rows[lo]["frac_pos"] == 0.0
    assert rows[hi]["frac_pos"] == 1.0
    assert rows[lo]["brier"] < 0.1 and rows[hi]["brier"] < 0.1


# ---------------------------------------------------------------------------
# ml_gains_deciles
# ---------------------------------------------------------------------------


def test_gains_deciles_identities_at_fixture(spark):
    """Ten deciles covering all rows; cum_capture is non-decreasing and
    ends at 1; the row-weighted mean lift is 1 (lift averages out)."""
    from python_etl_sample_spark.sources import table

    rows = sorted(
        REGISTRY["ml_gains_deciles"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    n = table(spark, SF_DIR, "orders").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n_rows"] for r in rows) == n
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-9
    wmean = sum(r["lift"] * r["n_rows"] for r in rows) / n
    assert abs(wmean - 1.0) < 1e-3


def test_gains_top_decile_captures_planted_signal(spark, tmp_path):
    """100 orders, the 10 highest-priced all positive and nothing else:
    decile 1 captures 100% with lift 10; every later decile has zero
    positives and lift 0."""
    specs = [(1000.0 + i, 1) for i in range(10)]
    specs += [(100.0 + i, 0) for i in range(90)]
    _write(spark, tmp_path, "orders", _orders(specs), _ORD_SCHEMA)
    rows = sorted(
        REGISTRY["ml_gains_deciles"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["decile"],
    )
    assert rows[0]["n_pos"] == 10
    assert rows[0]["cum_capture"] == 1.0
    assert rows[0]["lift"] == 10.0
    for r in rows[1:]:
        assert r["n_pos"] == 0
        assert r["cum_capture"] == 1.0
        assert r["lift"] == 0.0


# ---------------------------------------------------------------------------
# stats_kruskal_wallis
# ---------------------------------------------------------------------------


def _customers(groups):
    """{segment: [balances]} → customer rows."""
    rows, k = [], 0
    for seg, vals in groups.items():
        for v in vals:
            k += 1
            rows.append((k, f"c{k}", 1, float(v), seg))
    return rows


def test_kruskal_wallis_no_ties_worked_example(spark, tmp_path):
    """Three groups of distinct values with known rank sums:
    A = {1,2,3} (ranks 1..3), B = {4,5,6}, C = {7,8,9}.
    H = 12/(9·10)·(36/3 + 225/3 + 576/3) − 3·10 = 7.2; no ties so the
    corrected H equals H."""
    groups = {
        "A": [1, 2, 3],
        "B": [4, 5, 6],
        "C": [7, 8, 9],
    }
    _write(spark, tmp_path, "customer", _customers(groups), _CUST_SCHEMA)
    r = REGISTRY["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_total"], r["n_groups"]) == (9, 3)
    assert abs(r["h"] - 7.2) < 1e-6
    assert r["h_tie_corrected"] == r["h"]


def test_kruskal_wallis_identical_groups_give_zero(spark, tmp_path):
    """Groups drawn identically (same values in each) have equal mean
    ranks → H ≈ 0; the tie correction must not blow it up."""
    vals = [10, 20, 30, 40]
    groups = {"A": vals, "B": vals, "C": vals}
    _write(spark, tmp_path, "customer", _customers(groups), _CUST_SCHEMA)
    r = REGISTRY["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(r["h"]) < 1e-6
    assert abs(r["h_tie_corrected"]) < 1e-6


def test_kruskal_wallis_all_tied_is_null(spark, tmp_path):
    """Every value identical → tie correction C = 0 → NULL (the raw H
    is still reported)."""
    groups = {"A": [5, 5], "B": [5, 5]}
    _write(spark, tmp_path, "customer", _customers(groups), _CUST_SCHEMA)
    r = REGISTRY["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()[0]
    assert r["h_tie_corrected"] is None


def test_kruskal_wallis_fixture_sanity(spark):
    """k matches the segment count; H ≥ 0 within rounding and the tie
    correction only increases it (C ≤ 1)."""
    from python_etl_sample_spark.sources import table

    import pyspark.sql.functions as F

    r = REGISTRY["stats_kruskal_wallis"].fn(spark, SF_DIR).collect()[0]
    segs = (
        table(spark, SF_DIR, "customer")
        .select(F.countDistinct("c_mktsegment"))
        .collect()[0][0]
    )
    assert r["n_groups"] == segs
    assert r["h"] >= -1e-6
    assert r["h_tie_corrected"] >= r["h"] - 1e-9
