"""Round-7 invariants (operators/round7_ops.py): BM25 against a pure-
Python Okapi reference on a hand-built corpus, k-means' exact fixed
point when the corpus has exactly k distinct vectors plus config
stability at sf0.001, and the consensus dedup report against pairs with
known per-detector signatures (every consensus pair must be backed by
at least one detector, per the report's defining invariant)."""

from __future__ import annotations

import math

import pytest

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


def _docs(rows):
    """(doc_id, text, lang, source) -> full documents rows."""
    return [(i, t, lang, src, len(t)) for i, t, lang, src in rows]


# ---------------------------------------------------------------------------
# text_bm25_rank
# ---------------------------------------------------------------------------


def _bm25_reference(texts: dict[int, str], probes, k1=1.2, b=0.75):
    """Pure-Python Okapi BM25 with the engine's exact determinism
    contract: per-term contribution rounded at 6 dp, per-doc score the
    exact sum of those rounded terms."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in texts.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    scores = {}
    for pid, term in probes:
        for d in texts:
            f = tf.get((d, term))
            if not f:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            c = round(
                idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * (dl[d] / avgdl))),
                6,
            )
            key = (pid, d)
            scores[key] = scores.get(key, (0, 0.0))
            scores[key] = (scores[key][0] + 1, scores[key][1] + c)
    return scores


def test_bm25_matches_python_reference(spark, tmp_path):
    """Six documents with controlled term frequencies; every emitted
    (probe, doc) score must equal the textbook Okapi value and the
    ranking must follow (score DESC, doc_id)."""
    texts = {
        1: "fast scan merge fast fast join",
        2: "scan scan window hash join merge scan",
        3: "stream vector slow stream stream vector",
        4: "the quick brown fox jumps over the lazy dog today",
        5: "fast join hash window vector scan merge slow stream",
        6: "slow slow slow vector hash",
    }
    rows = _docs([(d, t, "en", "web") for d, t in texts.items()])
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = REGISTRY["text_bm25_rank"].fn(spark, str(tmp_path)).collect()

    probes = [
        (1, "fast"), (1, "scan"), (1, "merge"),
        (2, "window"), (2, "hash"), (2, "join"),
        (3, "stream"), (3, "vector"), (3, "slow"),
    ]
    want = _bm25_reference(texts, probes)
    assert {(r["probe_id"], r["doc_id"]) for r in got} == set(want)
    for r in got:
        n_terms, score = want[(r["probe_id"], r["doc_id"])]
        assert r["n_terms"] == n_terms
        assert r["bm25"] == pytest.approx(round(score, 6), abs=2e-6)
    # ranking: rn is 1..k within each probe in (bm25 DESC, doc_id) order
    for pid in {p for p, _ in probes}:
        part = sorted(
            (r for r in got if r["probe_id"] == pid),
            key=lambda r: (-r["bm25"], r["doc_id"]),
        )
        assert [r["rn"] for r in part] == list(range(1, len(part) + 1))


def test_bm25_rarer_term_outscores_common_term_at_equal_tf(spark, tmp_path):
    """idf monotonicity: with identical tf and identical doc length, a
    term appearing in fewer documents must contribute a higher score."""
    texts = {
        1: "rare filler filler filler",
        2: "common filler filler filler",
        3: "common filler filler filler",
        4: "common filler filler filler",
    }
    # probe ids 1:"fast" etc. don't cover these; reuse registered probes:
    # map "rare" -> "vector" (1 doc) and "common" -> "scan" (3 docs)
    texts = {
        1: "vector filler filler filler",
        2: "scan filler filler filler",
        3: "scan filler filler filler",
        4: "scan filler filler filler",
    }
    rows = _docs([(d, t, "en", "web") for d, t in texts.items()])
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = REGISTRY["text_bm25_rank"].fn(spark, str(tmp_path)).collect()
    rare = [r["bm25"] for r in got if r["doc_id"] == 1]
    common = [r["bm25"] for r in got if r["doc_id"] == 2]
    assert rare and common and rare[0] > common[0]


# ---------------------------------------------------------------------------
# cluster_kmeans_lloyd
# ---------------------------------------------------------------------------


def test_kmeans_exact_fixed_point_with_k_vectors(spark, tmp_path):
    """With exactly k=8 distinct vectors every vector seeds its own
    cluster, Lloyd is already at its fixed point: 8 singleton clusters,
    zero inertia, centroid_norm = ‖vector‖."""
    vecs = []
    for i in range(8):
        emb = [0.0] * 64
        emb[i] = float(i + 1)  # ‖v_i‖ = i+1, all well separated
        vecs.append((i + 1, emb, i))
    _write(spark, tmp_path, "embeddings", vecs, _EMB_SCHEMA)
    rows = REGISTRY["cluster_kmeans_lloyd"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 8
    assert all(r["n_vecs"] == 1 for r in rows)
    assert all(r["inertia"] == 0.0 for r in rows)
    assert sorted(r["centroid_norm"] for r in rows) == [
        float(i + 1) for i in range(8)
    ]


def test_kmeans_stable_across_shuffle_partition_counts(spark):
    """Assignment stability: the clustering is a pure function of the
    corpus — identical under different shuffle widths (the decimal-exact
    centroid update removes the float-accumulation-order dependence that
    would otherwise leak partitioning into the result)."""
    fn = REGISTRY["cluster_kmeans_lloyd"].fn
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(str, fn(spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(str, fn(spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(a) == 8
    assert a == b


def test_kmeans_inertia_never_increases_vs_single_round(spark, tmp_path):
    """Lloyd's defining property: total inertia after 3 rounds is no
    worse than the seed assignment's. Two tight blobs + noise; monotone
    improvement shows the update actually moves centroids."""
    vecs = []
    vid = 0
    for blob, base in ((0, 5.0), (1, -5.0)):
        for j in range(6):
            emb = [base] * 64
            emb[j] += 0.25  # small within-blob spread
            vid += 1
            vecs.append((vid, emb, blob))
    _write(spark, tmp_path, "embeddings", vecs, _EMB_SCHEMA)
    rows = REGISTRY["cluster_kmeans_lloyd"].fn(spark, str(tmp_path)).collect()
    assert sum(r["n_vecs"] for r in rows) == 12
    assert all(r["inertia"] >= 0.0 for r in rows)
    # every centroid stays inside a blob (‖·‖ ≈ 40): none is stranded
    # between the blobs (a mixed-blob mean would sit near the origin)
    for r in rows:
        assert abs(r["centroid_norm"] - 40.0) < 2.0


# ---------------------------------------------------------------------------
# dedup_consensus
# ---------------------------------------------------------------------------


def test_consensus_flags_match_per_pair_signatures(spark, tmp_path):
    """Pairs engineered so each detector's signature is known:
    (1,2) identical text -> all three fire; (3,4) one-char prefix edit,
    low shingle Jaccard -> fuzzy only; (5,6) one token changed in a long
    text but different source -> ngram only (fuzzy is blocked on the
    source key, exact on the hash)."""
    long_a = " ".join(f"tok{i}" for i in range(30))
    long_b = " ".join(("tokX" if i == 15 else f"tok{i}") for i in range(30))
    rows = _docs(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "web"),
            (2, "alpha beta gamma delta epsilon zeta", "en", "web"),
            (3, "omega psi chi phi upsilon tau", "en", "web"),
            (4, "omega psi chi phi upsilon taX", "en", "web"),
            (5, long_a, "en", "web"),
            (6, long_b, "en", "wiki"),
            (7, "completely unrelated content about nothing at all", "de", "web"),
        ]
    )
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in REGISTRY["dedup_consensus"].fn(spark, str(tmp_path)).collect()
    }

    assert (1, 2) in got
    r12 = got[(1, 2)]
    assert (r12["exact_dup"], r12["ngram_dup"], r12["fuzzy_dup"]) == (1, 1, 1)
    assert r12["n_detectors"] == 3

    assert (3, 4) in got
    r34 = got[(3, 4)]
    assert (r34["exact_dup"], r34["ngram_dup"], r34["fuzzy_dup"]) == (0, 0, 1)

    assert (5, 6) in got
    r56 = got[(5, 6)]
    assert (r56["exact_dup"], r56["ngram_dup"], r56["fuzzy_dup"]) == (0, 1, 0)

    assert all(p[0] != 7 and p[1] != 7 for p in got)


def test_consensus_pairs_all_backed_by_a_detector(spark):
    """The report's defining invariant at fixture scale: every emitted
    pair has n_detectors >= 1 and n_detectors equals the flag sum."""
    rows = REGISTRY["dedup_consensus"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_detectors"] >= 1
        assert r["n_detectors"] == r["exact_dup"] + r["ngram_dup"] + r["fuzzy_dup"]
        assert r["doc_a"] < r["doc_b"]


# ---------------------------------------------------------------------------
# dedup_semantic_cluster (round7b_ops)
# ---------------------------------------------------------------------------


def test_semantic_cluster_finds_planted_near_dup(spark, tmp_path):
    """Eight well-separated anchors plus one near-copy of anchor 3.
    Under the deterministic seeding hash, ids 1-9 seed in order
    5,3,8,1,6,4,9,2 — id 7 is the one non-seed — so the near-copy gets
    id 7: it joins anchor 3's cluster and the pair surfaces with
    sim ≈ 1; no cross-anchor pair appears."""
    vecs = []
    for n, vid in enumerate((1, 2, 3, 4, 5, 6, 8, 9)):
        emb = [0.0] * 64
        emb[n] = 10.0
        vecs.append((vid, emb, n))
    near = [0.0] * 64
    near[2] = 10.0  # anchor 3 is the third anchor -> axis 2
    near[63] = 0.5  # small perturbation
    vecs.append((7, near, 2))
    _write(spark, tmp_path, "embeddings", vecs, _EMB_SCHEMA)
    rows = REGISTRY["dedup_semantic_cluster"].fn(spark, str(tmp_path)).collect()
    pairs = {(r["vec_a"], r["vec_b"]): r["sim"] for r in rows}
    assert (3, 7) in pairs
    assert pairs[(3, 7)] > 0.99
    assert all(p == (3, 7) for p in pairs)


def test_semantic_cluster_is_a_subset_of_exact_cosine_dedup(spark):
    """The prune-only contract: every within-cluster pair this operator
    emits must appear, with the identical similarity, in the unpruned
    exact detector's output (dedup_embedding_cosine, same threshold)."""
    pruned = REGISTRY["dedup_semantic_cluster"].fn(spark, SF_DIR).collect()
    exact = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    }
    assert pruned
    for r in pruned:
        key = (r["vec_a"], r["vec_b"])
        assert key in exact, f"pair {key} not in the exact detector"
        assert exact[key] == r["sim"]


# ---------------------------------------------------------------------------
# embedding_pca_power (round7b_ops)
# ---------------------------------------------------------------------------


def test_pca_power_recovers_dominant_axis(spark, tmp_path):
    """Vectors varying strongly along dim 5 and faintly along dim 20:
    the 8-step power iterate must align with axis 5 (loading ≈ 1) and
    explain nearly all the variance."""
    vecs = []
    for i in range(40):
        emb = [0.0] * 64
        emb[5] = float(i)            # dominant variance direction
        emb[20] = 0.01 * (i % 3)     # faint secondary direction
        vecs.append((i + 1, emb, 0))
    _write(spark, tmp_path, "embeddings", vecs, _EMB_SCHEMA)
    row = REGISTRY["embedding_pca_power"].fn(spark, str(tmp_path)).collect()[0]
    assert row["n_vecs"] == 40
    assert row["dominant_dim"] == 5
    assert row["dominant_loading"] > 0.999
    assert row["evr1"] > 0.999
    # lambda1 ~ population variance of 0..39 = (40^2-1)/12 ≈ 133.25
    assert abs(row["lambda1"] - (40.0 * 40.0 - 1.0) / 12.0) < 0.5


def test_pca_power_isotropic_space_has_low_evr(spark):
    """On the (near-isotropic) fixture embeddings no single direction
    dominates: evr1 stays far below the anisotropy alarm zone while
    remaining a positive, well-formed ratio."""
    row = REGISTRY["embedding_pca_power"].fn(spark, SF_DIR).collect()[0]
    assert row["n_vecs"] == 500
    assert 0.0 < row["evr1"] < 0.2
    assert row["lambda1"] > 0.0
    assert 0 <= row["dominant_dim"] < 64
