"""Round-7 batch-8 invariants (operators/round7h_ops.py): the bigram
LM against a hand-counted corpus plus its order-sensitivity raison
d'être, substring spans on a constructed shared paragraph, t-closeness
against a hand-computed ordered EMD, and the ACF against a pure-Python
replication of the exact estimator."""

from __future__ import annotations

import datetime as dt
import math

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_D = dt.datetime

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
    " c_mktsegment string"
)


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


# ---------------------------------------------------------------------------
# text_bigram_lm_perplexity
# ---------------------------------------------------------------------------


def _bigram_reference(docs):
    """Pure-Python add-one bigram LM replicating the query's arithmetic
    (log10 of one float division rounded 9 dp, decimal-free here since
    the sums are tiny)."""
    toks = {d: [w for w in text.lower().split() if w] for d, text in docs}
    bgn = {d: list(zip(t, t[1:])) for d, t in toks.items()}
    cnt: dict[tuple, int] = {}
    for pairs in bgn.values():
        for p in pairs:
            cnt[p] = cnt.get(p, 0) + 1
    ctx: dict[str, int] = {}
    for (w1, _), c in cnt.items():
        ctx[w1] = ctx.get(w1, 0) + c
    vocab = len({w for t in toks.values() for w in t})
    out = {}
    for d, pairs in bgn.items():
        if not pairs:
            continue
        lps = [
            round(math.log10((cnt[p] + 1.0) / (ctx[p[0]] + vocab)), 9)
            for p in pairs
        ]
        h = -sum(lps) / len(pairs)
        out[d] = (len(pairs), round(h, 6), round(10.0**h, 2))
    return out


def test_bigram_lm_hand_corpus(spark, tmp_path):
    """Three tiny docs: per-doc n_bigrams / cross-entropy / perplexity
    must equal the pure-Python add-one bigram reference exactly."""
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "a dog ran"),
    ]
    _write(
        spark, tmp_path, "documents",
        [(d, t, "en", "web", len(t)) for d, t in docs], _DOC_SCHEMA,
    )
    ref = _bigram_reference(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in REGISTRY["text_bigram_lm_perplexity"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == ref


def test_bigram_lm_is_order_sensitive(spark, tmp_path):
    """The operator's raison d'être: many fluent repetitions of a
    phrase make its bigrams cheap, so a doc using the SAME words in
    scrambled order (all unseen bigrams) must score strictly higher
    perplexity — the case the unigram LM cannot distinguish at all."""
    fluent = " ".join(["the cat sat on the mat"] * 5)
    rows = [
        (1, fluent, "en", "web", len(fluent)),
        (2, "the cat sat on the mat", "en", "web", 22),
        (3, "mat the on sat cat the", "en", "web", 22),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = {
        r["doc_id"]: r["perplexity"]
        for r in REGISTRY["text_bigram_lm_perplexity"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got[2] < got[3]


def test_bigram_lm_fixture_shape(spark):
    """Every scored doc has n_bigrams ≥ 1, perplexity ≥ 1 (log-probs
    are negative), and perplexity = 10^cross_entropy at rounding."""
    rows = REGISTRY["text_bigram_lm_perplexity"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["perplexity"] >= 1.0
        assert abs(r["perplexity"] - 10.0 ** r["cross_entropy"]) <= max(
            0.011, r["perplexity"] * 1e-5
        )


# ---------------------------------------------------------------------------
# dedup_substring_spans
# ---------------------------------------------------------------------------


def test_substring_spans_shared_paragraph(spark, tmp_path):
    """Two docs share an embedded 9-word run → exactly its two 8-gram
    spans are reported, each with n_docs=2 and first_doc=1; a third
    unrelated doc contributes nothing."""
    shared = " ".join(f"s{i}" for i in range(9))  # 9 words -> 2 spans
    rows = [
        (1, "alpha beta " + shared + " gamma", "en", "web", 0),
        (2, shared + " delta epsilon zeta", "en", "web", 0),
        (3, " ".join(f"u{i}" for i in range(20)), "en", "web", 0),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = {
        r["span"]: r
        for r in REGISTRY["dedup_substring_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    want = {
        " ".join(f"s{i}" for i in range(8)),
        " ".join(f"s{i}" for i in range(1, 9)),
    }
    assert set(got) == want
    for r in got.values():
        assert r["n_docs"] == 2
        assert r["n_occurrences"] == 2
        assert r["first_doc"] == 1


def test_substring_spans_within_doc_repeat_is_not_cross_doc(spark, tmp_path):
    """A span repeated twice INSIDE one doc does not qualify (n_docs
    counts distinct documents), but its occurrences count when a second
    doc also carries it."""
    run = " ".join(f"r{i}" for i in range(8))  # exactly one 8-gram
    rows = [
        (1, run + " x0 x1 x2 x3 x4 x5 x6 " + run, "en", "web", 0),
        (2, " ".join(f"v{i}" for i in range(12)), "en", "web", 0),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = REGISTRY["dedup_substring_spans"].fn(spark, str(tmp_path)).collect()
    assert got == []  # repeat is intra-doc only
    rows[1] = (2, run + " tail0 tail1", "en", "web", 0)
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = {
        r["span"]: r
        for r in REGISTRY["dedup_substring_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got[run]["n_docs"] == 2
    assert got[run]["n_occurrences"] == 3


def test_substring_spans_fixture_invariants(spark):
    """Every reported span reaches ≥2 docs, occurrences ≥ docs, and the
    span is exactly 8 whitespace-separated words."""
    rows = REGISTRY["dedup_substring_spans"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 2
        assert r["n_occurrences"] >= r["n_docs"]
        assert len(r["span"].split(" ")) == 8


# ---------------------------------------------------------------------------
# anon_t_closeness
# ---------------------------------------------------------------------------


def test_t_closeness_hand_emd(spark, tmp_path):
    """Two classes concentrated in opposite 1000-unit bands: global is
    (1/2, 1/2), each class is a point mass, ordered EMD with m=2 gives
    t = 0.5 for both — hand-computed from Li et al.'s formula."""
    rows = [
        (1, "a", 1, 100.0, "X"),
        (2, "b", 1, 900.0, "X"),
        (3, "c", 2, 1100.0, "X"),
        (4, "d", 2, 1900.0, "X"),
    ]
    _write(spark, tmp_path, "customer", rows, _CUST_SCHEMA)
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in REGISTRY["anon_t_closeness"].fn(spark, str(tmp_path)).collect()
    }
    assert got[(1, "X")]["t_closeness"] == 0.5
    assert got[(2, "X")]["t_closeness"] == 0.5
    assert got[(1, "X")]["n_rows"] == 2


def test_t_closeness_zero_when_class_mirrors_global(spark, tmp_path):
    """Two classes with IDENTICAL band distributions: each equals the
    global distribution, so t = 0 exactly for both."""
    rows = []
    k = 0
    for nat in (1, 2):
        for bal in (500.0, 1500.0, 1500.0):
            k += 1
            rows.append((k, f"c{k}", nat, bal, "X"))
    _write(spark, tmp_path, "customer", rows, _CUST_SCHEMA)
    got = REGISTRY["anon_t_closeness"].fn(spark, str(tmp_path)).collect()
    assert {r["t_closeness"] for r in got} == {0.0}


def test_t_closeness_fixture_invariants(spark):
    """0 ≤ t ≤ 1 everywhere; class sizes sum to the customer count; the
    flagship k-anonymity point — small classes can still score low t,
    and t is not a function of class size."""
    rows = REGISTRY["anon_t_closeness"].fn(spark, SF_DIR).collect()
    import pyspark.sql.functions as F

    from python_etl_sample_spark.sources import table

    n = table(spark.sparkSession if hasattr(spark, "sparkSession") else spark,
              SF_DIR, "customer").count()
    assert sum(r["n_rows"] for r in rows) == n
    for r in rows:
        assert 0.0 <= r["t_closeness"] <= 1.0


# ---------------------------------------------------------------------------
# ts_autocorrelation
# ---------------------------------------------------------------------------


def _acf_reference(series):
    """Pure-Python replication of the query's exact estimator: global
    moments once, per-lag pair moments over calendar-aligned pairs,
    mirrored combination, Ljung-Box terms rounded at 12 dp."""
    n = len(series)
    vals = {day: v for day, v in series}
    s = float(sum(v for _, v in series))
    ssq = float(sum(v * v for _, v in series))
    xbar = s / n
    out = {}
    q_acc = 0.0
    for lag in range(1, 8):
        pairs = [
            (vals[d], vals[d + lag]) for d, _ in series if d + lag in vals
        ]
        npairs = len(pairs)
        p = float(sum(a * b for a, b in pairs))
        ta = float(sum(a for a, _ in pairs))
        tb = float(sum(b for _, b in pairs))
        rr = (p - xbar * ta - xbar * tb + npairs * xbar * xbar) / (
            ssq - s * xbar
        )
        q_acc += round(rr * rr / (n - lag), 12)
        out[lag] = (
            npairs,
            round(rr, 6),
            round(1.96 / math.sqrt(n), 6),
            round(n * (n + 2.0) * q_acc, 6),
        )
    return out


def test_acf_matches_pure_python_reference(spark, tmp_path):
    """A 40-day deterministic series with a strong period-2 component:
    all four output columns equal the reference at every lag, and the
    period shows as acf(2) > 0 > acf(1)."""
    base = _D(2024, 3, 1)
    series = [(d, (10000 + 5000 * (d % 2) + 13 * d)) for d in range(40)]
    rows = [
        (d + 1, base + dt.timedelta(days=d), 1, "purchase", cents / 100.0, "{}")
        for d, cents in series
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    ref = _acf_reference(series)
    got = {
        r["lag"]: (r["n_pairs"], r["acf"], r["wn_band"], r["ljung_box_q"])
        for r in REGISTRY["ts_autocorrelation"].fn(spark, str(tmp_path)).collect()
    }
    assert got == ref
    assert got[2][1] > 0 > got[1][1]


def test_acf_missing_day_drops_pairs(spark, tmp_path):
    """Deleting one interior day reduces n_pairs at lag 1 by exactly 2
    (its pair in each direction) and at lag 7 by 2 — calendar alignment
    never silently shifts the series."""
    base = _D(2024, 3, 1)
    series = [(d, 10000 + 13 * d) for d in range(30) if d != 15]
    rows = [
        (d + 1, base + dt.timedelta(days=d), 1, "purchase", cents / 100.0, "{}")
        for d, cents in series
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    got = {
        r["lag"]: r["n_pairs"]
        for r in REGISTRY["ts_autocorrelation"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1] == 30 - 1 - 2  # 29 adjacent pairs in the full series, -2
    assert got[7] == 30 - 7 - 2


def test_acf_fixture_shape(spark):
    """Lags 1..7 all present; |acf| ≤ 1 + eps; Ljung-Box Q is
    non-decreasing in lag; white-noise band constant across lags."""
    rows = sorted(
        REGISTRY["ts_autocorrelation"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == list(range(1, 8))
    assert len({r["wn_band"] for r in rows}) == 1
    qs = [r["ljung_box_q"] for r in rows]
    assert qs == sorted(qs)
    for r in rows:
        assert abs(r["acf"]) <= 1.000001
