"""Round-7 batch-11 invariants (operators/round7k_ops.py): RRF against
hand-computed fusion scores and its source rankings, PERCENTILE_CONT
against the textbook interpolation, char entropy against closed-form
values, and Brown-Forsythe against a hand-worked example."""

from __future__ import annotations

import datetime as dt
import math

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_D = dt.datetime

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
    " c_mktsegment string"
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
# sim_rrf_fusion
# ---------------------------------------------------------------------------


def test_rrf_scores_recompute_from_source_ranks(spark):
    """Every fused score equals round(Σ 1/(60+rank), 9) over the ranks
    the row itself reports, and at least one source rank is present."""
    rows = REGISTRY["sim_rrf_fusion"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        want = 0.0
        if r["rank_a"] is not None:
            want += round(1.0 / (60 + r["rank_a"]), 9)
        if r["rank_b"] is not None:
            want += round(1.0 / (60 + r["rank_b"]), 9)
        assert r["rank_a"] is not None or r["rank_b"] is not None
        assert abs(r["rrf_score"] - round(want, 9)) < 1e-12


def test_rrf_ranks_agree_with_bm25(spark):
    """rank_a values must be exactly the BM25 top-10 ranks for the
    same (probe, doc) pairs — fusion may not alter the source list."""
    bm = {
        (r["probe_id"], r["doc_id"]): r["rn"]
        for r in REGISTRY["text_bm25_rank"].fn(spark, SF_DIR).collect()
    }
    fused = REGISTRY["sim_rrf_fusion"].fn(spark, SF_DIR).collect()
    seen_a = {
        (r["probe_id"], r["doc_id"]): r["rank_a"]
        for r in fused
        if r["rank_a"] is not None
    }
    for key, ra in seen_a.items():
        assert bm[key] == ra


def test_rrf_doc_in_both_lists_outranks_single_list(spark, tmp_path):
    """A document that is both the best BM25 hit and the longest doc
    must fuse to rank 1: construct a corpus where doc 1 contains the
    probe terms AND is longest; doc 2 only matches, doc 3 is only
    long."""
    probe_text = "fast scan merge"
    rows = [
        (1, probe_text + " " + " ".join(f"w{i}" for i in range(200)),
         "en", "web", 0),
        (2, probe_text, "en", "web", 0),
        (3, " ".join(f"x{i}" for i in range(150)), "en", "web", 0),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    fused = [
        r
        for r in REGISTRY["sim_rrf_fusion"].fn(spark, str(tmp_path)).collect()
        if r["probe_id"] == 1
    ]
    top = min(fused, key=lambda r: r["rn"])
    assert top["doc_id"] == 1
    assert top["rank_a"] is not None and top["rank_b"] is not None


# ---------------------------------------------------------------------------
# agg_percentile_cont
# ---------------------------------------------------------------------------


def _li_rows(prices):
    return [
        (i + 1, 1, 1, 1, 1.0, float(p), 0.0, 0.0, "N", "O", _D(1995, 6, 1))
        for i, p in enumerate(prices)
    ]


def test_percentile_cont_textbook_interpolation(spark, tmp_path):
    """Values 10,20,30,40 (n=4): pos(q) = 1+3q → p25 = 17.5, p50 = 25,
    p75 = 32.5, p90 = 37, p99 = 39.7 — the NumPy 'linear' values."""
    _write(spark, tmp_path, "lineitem", _li_rows([10, 20, 30, 40]), _LI_SCHEMA)
    got = {
        r["pct"]: r["percentile_cont"]
        for r in REGISTRY["agg_percentile_cont"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {25: 17.5, 50: 25.0, 75: 32.5, 90: 37.0, 99: 39.7}


def test_percentile_cont_exact_positions_no_interpolation(spark, tmp_path):
    """With n=5, q=0.25/0.5/0.75 land exactly on order statistics —
    the interpolation must collapse to the exact value."""
    _write(
        spark, tmp_path, "lineitem", _li_rows([5, 10, 15, 20, 25]), _LI_SCHEMA
    )
    got = {
        r["pct"]: r["percentile_cont"]
        for r in REGISTRY["agg_percentile_cont"].fn(spark, str(tmp_path)).collect()
    }
    assert got[25] == 10.0 and got[50] == 15.0 and got[75] == 20.0


def test_percentile_cont_fixture_monotone_and_bounded(spark):
    """Percentiles are non-decreasing in q and bracketed by min/max."""
    from python_etl_sample_spark.sources import table

    import pyspark.sql.functions as F

    got = {
        r["pct"]: r["percentile_cont"]
        for r in REGISTRY["agg_percentile_cont"].fn(spark, SF_DIR).collect()
    }
    vals = [got[p] for p in (25, 50, 75, 90, 99)]
    assert vals == sorted(vals)
    mm = (
        table(spark, SF_DIR, "lineitem")
        .agg(F.min("l_extendedprice"), F.max("l_extendedprice"))
        .collect()[0]
    )
    assert mm[0] <= vals[0] and vals[-1] <= mm[1]


# ---------------------------------------------------------------------------
# text_char_entropy
# ---------------------------------------------------------------------------


def test_char_entropy_closed_forms(spark, tmp_path):
    """'aaaa' → H = 0; 'abcd' → H = 2 bits; 'aabb' → 1 bit; a doc with
    no alphanumerics is absent."""
    rows = [
        (1, "aaaa", "en", "web", 4),
        (2, "abcd", "en", "web", 4),
        (3, "aabb", "en", "web", 4),
        (4, "!!! ???", "en", "web", 7),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = {
        r["doc_id"]: r
        for r in REGISTRY["text_char_entropy"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["entropy_bits"] == 0.0
    assert got[2]["entropy_bits"] == 2.0
    assert got[3]["entropy_bits"] == 1.0
    assert got[2]["n_distinct"] == 4


def test_char_entropy_fixture_bounds(spark):
    """0 ≤ H ≤ log2(n_distinct) ≤ log2(36); natural text clusters in
    the 3.5-5 bit band, far from both degenerate poles."""
    rows = REGISTRY["text_char_entropy"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert -1e-9 <= r["entropy_bits"] <= math.log2(r["n_distinct"]) + 1e-6
        assert r["n_distinct"] <= 36
    mean_h = sum(r["entropy_bits"] for r in rows) / len(rows)
    assert 3.0 < mean_h < 5.2


# ---------------------------------------------------------------------------
# stats_levene_bf
# ---------------------------------------------------------------------------


def _cust_groups(groups):
    rows, k = [], 0
    for seg, vals in groups.items():
        for v in vals:
            k += 1
            rows.append((k, f"c{k}", 1, float(v), seg))
    return rows


def _bf_reference(groups):
    """Pure-Python Brown-Forsythe on |2v − 2·med| (the query's exact
    doubled-deviation formulation)."""
    zs = {}
    for seg, vals in groups.items():
        sv = sorted(int(round(v * 100)) for v in vals)
        n = len(sv)
        m2 = sv[(n + 1) // 2 - 1] + sv[n // 2]
        zs[seg] = [abs(2 * v - m2) for v in sv]
    allz = [z for v in zs.values() for z in v]
    n, k = len(allz), len(zs)
    s, ssq = sum(allz), sum(z * z for z in allz)
    st = sum(round(sum(v) ** 2 / len(v), 6) for v in zs.values())
    ssb = st - s * (s / n)
    ssw = ssq - st
    return round((ssb / (k - 1)) / (ssw / (n - k)), 6)


def test_levene_bf_hand_worked_example(spark, tmp_path):
    """Two groups with visibly different spreads: the F statistic must
    equal the pure-Python Brown-Forsythe reference."""
    groups = {
        "TIGHT": [100, 101, 102, 103, 104],
        "WIDE": [50, 90, 130, 170, 210],
    }
    _write(spark, tmp_path, "customer", _cust_groups(groups), _CUST_SCHEMA)
    r = REGISTRY["stats_levene_bf"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_total"], r["n_groups"]) == (10, 2)
    assert abs(r["f_stat"] - _bf_reference(groups)) < 1e-6


def test_levene_bf_equal_spreads_give_small_f(spark, tmp_path):
    """Identical deviation structures in both groups → SSB = 0 → F = 0
    (location shift alone must NOT trigger the variance test)."""
    groups = {
        "A": [100, 110, 120, 130, 140],
        "B": [600, 610, 620, 630, 640],  # same spread, shifted
    }
    _write(spark, tmp_path, "customer", _cust_groups(groups), _CUST_SCHEMA)
    r = REGISTRY["stats_levene_bf"].fn(spark, str(tmp_path)).collect()[0]
    assert r["f_stat"] == 0.0


def test_levene_bf_degenerate_all_constant_is_null(spark, tmp_path):
    """All values identical → zero within-group variance → NULL."""
    groups = {"A": [5, 5, 5], "B": [5, 5, 5]}
    _write(spark, tmp_path, "customer", _cust_groups(groups), _CUST_SCHEMA)
    r = REGISTRY["stats_levene_bf"].fn(spark, str(tmp_path)).collect()[0]
    assert r["f_stat"] is None


def test_levene_bf_fixture_sanity(spark):
    """F ≥ 0 and the group count matches the segment count."""
    from python_etl_sample_spark.sources import table

    import pyspark.sql.functions as F

    r = REGISTRY["stats_levene_bf"].fn(spark, SF_DIR).collect()[0]
    segs = (
        table(spark, SF_DIR, "customer")
        .select(F.countDistinct("c_mktsegment"))
        .collect()[0][0]
    )
    assert r["n_groups"] == segs
    assert r["f_stat"] >= 0.0
