"""Round-7 batch-5 invariants (operators/round7e_ops.py): CUPED against
closed-form expectations on an engineered correlated fixture, the
permutation test's p-value arithmetic and extreme-gap behavior, RAKE
against a hand-scored corpus, and shot-boundary deltas against the
generative frame definition."""

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


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


# ---------------------------------------------------------------------------
# events_uplift_cuped
# ---------------------------------------------------------------------------


def test_cuped_perfect_covariate_removes_all_variance(spark, tmp_path):
    """post = 2·pre exactly for every user ⇒ corr(X,Y)=1: var_reduction
    = 1 and the adjusted means of both arms collapse to the pooled
    2·mean(X) (all between-user variance is explained)."""
    rows, eid = [], 0
    for uid in range(1, 21):
        pre = 10.0 * uid
        for ts, v in ((_D(2024, 1, 5), pre), (_D(2024, 1, 25), 2 * pre)):
            eid += 1
            rows.append((eid, ts, uid, "view", v, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    got = {
        r["arm"]: r
        for r in REGISTRY["events_uplift_cuped"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"A", "B"}
    assert sum(r["n_users"] for r in got.values()) == 20
    pooled_mean_y = sum(2 * 10.0 * u for u in range(1, 21)) / 20.0
    for r in got.values():
        assert r["var_reduction"] == 1.0
        assert r["theta"] == 2.0
        assert abs(r["mean_y_adj"] - pooled_mean_y) < 1e-6


def test_cuped_fixture_sanity(spark):
    """Fixture events: two arms covering all users, var_reduction in
    [0, 1], and the adjusted means shift by θ·(arm pre-mean gap)."""
    rows = REGISTRY["events_uplift_cuped"].fn(spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r["var_reduction"] <= 1.0
        assert r["n_users"] > 0
        assert r["theta"] == rows[0]["theta"]  # pooled θ is shared


# ---------------------------------------------------------------------------
# stats_permutation_test
# ---------------------------------------------------------------------------


def test_permutation_test_pvalue_arithmetic(spark):
    """p must equal (1 + n_ge)/(1 + B) exactly, with n_ge ∈ [0, B]."""
    row = REGISTRY["stats_permutation_test"].fn(spark, SF_DIR).collect()[0]
    assert row["n_resamples"] == 32
    assert 0 <= row["n_ge"] <= 32
    assert row["p_value"] == round((1.0 + row["n_ge"]) / 33.0, 6)
    assert row["t_obs"] >= 0.0


def test_permutation_test_detects_overwhelming_gap(spark, tmp_path):
    """Urgent orders at 10 000, others at 1: no hash half-split of the
    labels reproduces that gap, so n_ge = 0 and p = 1/33."""
    import random

    rows = []
    for ok in range(1, 201):
        urgent = ok % 2 == 0
        rows.append(
            (
                ok,
                1,
                "O",
                10000.0 if urgent else 1.0,
                _D(1996, 1, 1 + (ok % 28)),
                "1-URGENT" if urgent else "5-LOW",
            )
        )
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string",
    )
    row = REGISTRY["stats_permutation_test"].fn(spark, str(tmp_path)).collect()[0]
    assert row["n_rows"] == 200
    assert abs(row["t_obs"] - 9999.0) < 1e-6
    assert row["n_ge"] == 0
    assert row["p_value"] == round(1.0 / 33.0, 6)


# ---------------------------------------------------------------------------
# text_rake_keywords
# ---------------------------------------------------------------------------


def test_rake_scores_multiword_phrase_highest(spark, tmp_path):
    """Classic RAKE behavior: a recurring multi-word phrase outscores
    single words because member words accumulate degree from the whole
    phrase. Hand-check the top phrase and its score."""
    texts = {
        1: "deep learning is the future of deep learning systems",
        2: "deep learning and gradient descent",
        3: "gradient descent is slow",
    }
    rows = [(d, t, "en", "web", len(t)) for d, t in texts.items()]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = REGISTRY["text_rake_keywords"].fn(spark, str(tmp_path)).collect()
    assert got, "no phrases extracted"
    top = got[0]
    # phrases: "deep learning" x2, "future" x1, "deep learning systems",
    # "gradient descent" x2, "slow".
    # deep: freq 3, degree 2+2+3=7; learning: freq 3, degree 7;
    # systems: freq 1, degree 3.
    # "deep learning systems" = 7/3 + 7/3 + 3/1 ≈ 7.666667 — the top.
    assert top["phrase"] == "deep learning systems"
    assert top["n_words"] == 3
    want = round(round(7 / 3, 6) + round(7 / 3, 6) + round(3 / 1, 6), 6)
    assert top["score"] == want
    # ordering is (score desc, doc_id, start_pos) and rows are unique
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_rake_fixture_topk_shape(spark):
    """Corpus run: exactly 10 rows, all multi-or-single word phrases
    with positive scores and no stopwords inside any phrase."""
    stop = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
    rows = REGISTRY["text_rake_keywords"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["score"] > 0
        words = r["phrase"].split(" ")
        assert len(words) == r["n_words"]
        assert not (set(words) & stop)


# ---------------------------------------------------------------------------
# multimodal_shot_boundary
# ---------------------------------------------------------------------------


def test_shot_boundary_matches_generative_definition(spark, tmp_path):
    """Frames are text char codes rolled by frame index, so the delta
    between consecutive frames is hand-computable; verify values and
    cut flags for a doc with a known text."""
    text = "abcdefghij" * 5  # L=50
    rows = [(3, text, "en", "web", len(text))]  # doc 3: 5 frames, w=7,h=6
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = sorted(
        REGISTRY["multimodal_shot_boundary"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["frame_no"],
    )
    n_frames = 2 + 3 % 7
    w, h = 4 + 3 % 5, 3 + 3 % 4
    assert len(got) == n_frames - 1
    L = len(text)
    for r in got:
        f = r["frame_no"]
        sdiff = sum(
            abs(
                ord(text[(3 * j + f) % L]) % 256
                - ord(text[(3 * j + f - 1) % L]) % 256
            )
            for j in range(w * h)
        )
        want = round(sdiff / (w * h), 6)
        assert r["delta_r"] == want
        assert r["is_cut"] == int(want > 40.0)


def test_shot_boundary_fixture_row_count(spark):
    """One row per consecutive frame pair: Σ(n_frames−1) over docs,
    with n_frames = 2 + doc_id % 7 — cross-check against the documents
    table itself."""
    import duckdb

    want = duckdb.sql(
        f"SELECT CAST(SUM(1 + doc_id % 7) AS BIGINT) FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    n = REGISTRY["multimodal_shot_boundary"].fn(spark, SF_DIR).count()
    assert n == want
