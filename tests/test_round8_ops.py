"""Round-8 batch-1 invariants (operators/round8_ops.py): the
hash-compaction KLL quantile sketch (degenerate-lossless at level 0,
rank-error-bounded at real levels, lossless merge), and the
semantic-dedup recall report (pruned ⊆ exact by construction)."""

from __future__ import annotations

import duckdb

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


def _cents_sorted(sf_dir: str) -> list[int]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(round(o_totalprice * 100) AS BIGINT) FROM "
        f"read_parquet('{sf_dir}/orders.parquet') ORDER BY 1"
    ).fetchall()
    con.close()
    return [r[0] for r in rows]


# ---------------------------------------------------------------------------
# sketch_kll_quantiles
# ---------------------------------------------------------------------------


def test_kll_level0_is_lossless(spark):
    """At sf0.001 n ≤ the 2048 budget, so the level rule picks L = 0,
    the sketch keeps everything, and every estimate must EQUAL the
    exact answer — the degenerate case that pins the whole rank
    plumbing (targets, total order, tie-breaks) end to end."""
    rows = REGISTRY["sketch_kll_quantiles"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["level"] == 0
        assert r["kept"] == r["n_rows"]
        assert r["est_cents"] == r["exact_cents"]


def test_kll_rank_error_bound_vs_exact(spark):
    """At sf0.01 the sketch really subsamples (level ≥ 1). The
    estimate's RANK within the full total order must sit within
    4/√kept of the target quantile — the subsample rank-error bound
    with a fixed safety factor (deterministic here: the data and hash
    are fixed, so this can never flake). Exact answers are checked
    against agg_exact_quantiles_global's definition (value at rank
    ⌈q·n⌉) recomputed independently in pure Python."""
    import bisect

    cents = _cents_sorted(SF_DIR_01)
    n = len(cents)
    rows = {
        int(round(r["quantile"] * 100)): r
        for r in REGISTRY["sketch_kll_quantiles"].fn(spark, SF_DIR_01).collect()
    }
    assert set(rows) == {50, 95, 99}
    for qn, r in rows.items():
        assert r["level"] >= 1
        assert r["n_rows"] == n
        # exact side: the type-1 inverse CDF value at rank ceil(q*n)
        target = (n * qn + 99) // 100
        assert r["exact_cents"] == cents[target - 1]
        # sketch side: rank error bound
        lo = bisect.bisect_left(cents, r["est_cents"])
        hi = bisect.bisect_right(cents, r["est_cents"])
        err = min(abs(lo - target), abs(hi - target))
        assert err <= 4.0 / (r["kept"] ** 0.5) * n, (qn, err, r["kept"])


def test_kll_kept_is_exactly_the_hash_rule(spark):
    """The kept multiset must be EXACTLY {keys: hash ≡ 0 mod 2^L} — the
    property that makes the sketch a pure function of the set (and the
    merge lossless). Recomputed in pure Python at sf0.01."""
    con = duckdb.connect()
    keys = [
        r[0]
        for r in con.execute(
            f"SELECT o_orderkey FROM read_parquet('{SF_DIR_01}/orders.parquet')"
        ).fetchall()
    ]
    con.close()
    n = len(keys)
    lev = 0
    while n > 2048 * (1 << lev):
        lev += 1
    want_kept = sum(
        1 for k in keys if ((k % 3221225473) * 2654435761) % (1 << lev) == 0
    )
    r = REGISTRY["sketch_kll_quantiles"].fn(spark, SF_DIR_01).collect()[0]
    assert r["level"] == lev
    assert r["kept"] == want_kept


# ---------------------------------------------------------------------------
# sketch_kll_merge
# ---------------------------------------------------------------------------


def test_kll_merge_equals_direct_sketch(spark):
    """The merged ALL-scope sketch (union of per-priority sketches
    recompacted to the global level) must equal the DIRECT global
    sketch: same kept count and same median estimate as a pure-Python
    direct sample at the global level — the lossless-merge identity
    the operator exists to demonstrate."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)"
        f" FROM read_parquet('{SF_DIR_01}/orders.parquet')"
    ).fetchall()
    con.close()
    n = len(rows)
    lev = 0
    while n > 512 * (1 << lev):
        lev += 1
    direct = sorted(
        (c, k)
        for k, c in rows
        if ((k % 3221225473) * 2654435761) % (1 << lev) == 0
    )
    got = {
        r["scope"]: r
        for r in REGISTRY["sketch_kll_merge"].fn(spark, SF_DIR_01).collect()
    }
    allr = got["ALL"]
    assert allr["level"] == lev
    assert allr["kept"] == len(direct)
    st = (len(direct) * 50 + 99) // 100
    assert allr["est_p50_cents"] == direct[st - 1][0]
    # per-priority scopes: levels follow each group's own count and
    # exact medians are per-group
    assert len(got) == 6
    for scope, r in got.items():
        if scope == "ALL":
            continue
        glev = 0
        while r["n_rows"] > 512 * (1 << glev):
            glev += 1
        assert r["level"] == glev
        assert r["kept"] <= r["n_rows"]


# ---------------------------------------------------------------------------
# dedup_semantic_recall
# ---------------------------------------------------------------------------


def test_recall_pruned_is_subset_of_exact(spark):
    """No false positives by construction: every pair the cluster
    prune keeps (dedup_semantic_cluster) must appear in the exact
    cosine pair set (dedup_embedding_cosine), and the recall report's
    caught totals must equal the pruned pair count."""
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    }
    pruned = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["dedup_semantic_cluster"].fn(spark, SF_DIR).collect()
    }
    assert pruned <= exact
    report = REGISTRY["dedup_semantic_recall"].fn(spark, SF_DIR).collect()
    assert sum(r["n_exact"] for r in report) == len(exact)
    assert sum(r["n_caught"] for r in report) == len(pruned)
    for r in report:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_caught"] <= r["n_exact"]
