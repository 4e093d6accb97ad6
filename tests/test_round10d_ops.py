"""Round-10d invariants (operators/round10d_ops.py).

1. pipeline_dedup_funnel matches a pure-Python replay of all three
   stages (exact-hash keeper, greedy lowest-id near-dup drop over exact
   shingle Jaccard, integer-cross-multiplied quality gates) — the
   replay uses the same char-polynomial shingle keys as the engine, so
   the comparison is algorithm-vs-algorithm including key collisions.
2. ml_brier_decomposition satisfies the Murphy bounds: reliability and
   resolution are non-negative, resolution never exceeds uncertainty,
   and the published residual closes the identity at 6 dp.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pyarrow.parquet as pq

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_XP = 2147483647


def _shingle_keys(text: str) -> set[int]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]
    keys = set()
    for i in range(len(toks) - 2):
        acc = 0
        for ch in " ".join(toks[i : i + 3]):
            acc = (acc * 31 + ord(ch)) % _XP
        keys.add(acc)
    return keys


def test_funnel_matches_pure_python_replay(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()

    # stage 1: exact dedup, keep MIN doc_id per normalized text
    by_norm = defaultdict(list)
    for d in docs:
        by_norm[d["text"].strip().lower()].append(d["doc_id"])
    keep1 = {min(ids) for ids in by_norm.values()}
    s1 = [d for d in docs if d["doc_id"] in keep1]

    # stage 2: greedy near-dup drop (exact Jaccard >= 0.8, lowest id
    # wins) over the polynomial-keyed shingle sets
    keys = {d["doc_id"]: _shingle_keys(d["text"]) for d in s1}
    ids = sorted(keys)
    drop = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ka, kb = keys[a], keys[b]
            inter = len(ka & kb)
            if inter and inter / len(ka | kb) >= 0.8:
                drop.add(b)
    s2 = [d for d in s1 if d["doc_id"] not in drop]

    # stage 3: quality gates
    def keeps(d) -> bool:
        n = d["n_chars"]
        digits = len(re.sub(r"[^0-9]", "", d["text"]))
        upper = len(re.sub(r"[^A-Z]", "", d["text"]))
        return n >= 200 and digits * 5 <= n and upper * 10 <= n * 3

    s3 = [d for d in s2 if keeps(d)]

    exp = {
        "0_raw": (len(docs), sum(d["n_chars"] for d in docs), 0),
        "1_exact_dedup": (
            len(s1),
            sum(d["n_chars"] for d in s1),
            len(docs) - len(s1),
        ),
        "2_near_dedup": (
            len(s2),
            sum(d["n_chars"] for d in s2),
            len(s1) - len(s2),
        ),
        "3_quality_gate": (
            len(s3),
            sum(d["n_chars"] for d in s3),
            len(s2) - len(s3),
        ),
    }
    rows = REGISTRY["pipeline_dedup_funnel"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4
    raw_n, raw_ch, _ = exp["0_raw"]
    for r in rows:
        e = exp[r["stage"]]
        assert (r["n_docs"], r["n_chars"], r["n_dropped"]) == e
        assert abs(r["doc_retention"] - e[0] / raw_n) < 1e-6
        assert abs(r["char_retention"] - e[1] / raw_ch) < 1e-6
    # the funnel must actually funnel on the planted-near-dup fixtures
    assert exp["2_near_dedup"][2] > 0


def test_brier_decomposition_murphy_bounds(spark):
    r = REGISTRY["ml_brier_decomposition"].fn(spark, SF_DIR).collect()
    assert len(r) == 1
    row = r[0]
    assert 0.0 < row["base_rate"] < 1.0
    assert row["reliability"] >= 0.0
    assert row["resolution"] >= 0.0
    # resolution is bounded by uncertainty (variance decomposition)
    assert row["resolution"] <= row["uncertainty"] + 1e-9
    assert abs(row["uncertainty"] - row["base_rate"] * (1 - row["base_rate"])) < 1e-5
    # the published residual closes the identity at 6 dp by construction
    assert (
        abs(
            row["brier"]
            - row["reliability"]
            + row["resolution"]
            - row["uncertainty"]
            - row["within_bin_residual"]
        )
        < 1e-6
    )
    # and it is genuinely small: the bins are narrow (width 0.1)
    assert abs(row["within_bin_residual"]) < 0.01


def test_holt_winters_matches_pure_python_replay(spark):
    """Replay the whole decomposition-form pipeline (±3 MA seasonal
    fit, deseasonalize, two truncated integer-weight EWMAs, re-
    seasonalized forecast) in plain Python; values must agree to the
    query's 6-dp rounding (tolerance covers float-sum association)."""
    from collections import defaultdict
    from datetime import date, datetime

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pylist()
    per_day = defaultdict(float)
    for rec in tbl:
        d = rec["o_orderdate"]
        if isinstance(d, datetime):
            d = d.date()
        day = (d - date(1970, 1, 1)).days
        per_day[day] += float(rec["o_totalprice"])
    days = sorted(per_day)
    rev = [per_day[d] for d in days]

    # seasonal fit: mean detrended value per (day mod 7), full windows
    det = defaultdict(list)
    for i in range(3, len(days) - 3):
        # full window requires 7 CONSECUTIVE frame rows, matching the
        # ROWS-window (positions, not calendar days)
        tsum = sum(rev[i - 3 : i + 4])
        det[days[i] % 7].append(7 * rev[i] - tsum)
    sidx = {k: round(sum(v) / (7.0 * len(v)), 6) for k, v in det.items()}

    des = [round(rev[i] - sidx[days[i] % 7], 6) for i in range(len(days))]

    def ewma(xs):
        out = []
        for i in range(len(xs)):
            lo = max(0, i - 19)
            ws = [2 ** (19 - (i - j)) for j in range(lo, i + 1)]
            out.append(
                round(
                    sum(w * x for w, x in zip(ws, xs[lo : i + 1]))
                    / float(sum(ws)),
                    6,
                )
            )
        return out

    s1 = ewma(des)
    s2 = ewma(s1)

    rows = {
        r["day"]: r
        for r in REGISTRY["ts_holt_winters_forecast"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) == 5
    for day, r in rows.items():
        i = days.index(day)
        assert i >= 39  # rn >= 2*window
        lvl = round(2 * s1[i] - s2[i], 6)
        trd = round(s1[i] - s2[i], 6)
        nxt = sidx[(day + 1) % 7]
        assert abs(r["level"] - lvl) < 1e-4
        assert abs(r["trend"] - trd) < 1e-4
        assert abs(r["seasonal_next"] - nxt) < 1e-4
        assert abs(r["forecast_next"] - (lvl + trd + nxt)) < 2e-4
