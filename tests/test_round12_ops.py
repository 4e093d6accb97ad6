"""Round-12 invariants (operators/round12_ops.py): the SemDeDup ε-sweep
and ANN recall under churn.

Oracle parity (the driver gate) proves both engines compute the same
thing; these pin that the thing computed has the operators' defining
properties — the sweep's retention curve is a consistent partition of
the corpus that brackets the deployed policy, and the churn split is an
exact reclassification of sim_ann_recall's truth pairs (recall can only
move through sampling, never through placement).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_sample_spark.operators.round7b_ops import dedup_semantic_cluster
from python_etl_sample_spark.operators.round10_ops import sim_ann_recall
from python_etl_sample_spark.operators.round12_ops import (
    _CHURN_MOD,
    _SEMDEDUP_TS,
    ann_recall_under_churn,
    dedup_semdedup_eps,
)
from python_etl_sample_spark.operators.similarity import sim_knn_per_query
from python_etl_sample_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def test_semdedup_curve_monotone_and_conserving(spark):
    rows = {
        r["sim_threshold"]: r
        for r in dedup_semdedup_eps(spark, SF_DIR).collect()
    }
    assert set(rows) == set(_SEMDEDUP_TS)
    n_vecs = table(spark, SF_DIR, "embeddings").count()
    prev_pairs, prev_kept = None, None
    for t in sorted(rows):
        r = rows[t]
        # a tighter threshold can only shrink the pair set and grow
        # the survivor set
        if prev_pairs is not None:
            assert r["n_pairs"] <= prev_pairs
            assert r["n_kept"] >= prev_kept
        prev_pairs, prev_kept = r["n_pairs"], r["n_kept"]
        # each dropped doc is the higher id of >= 1 qualifying pair
        assert r["n_dropped"] <= r["n_pairs"]
        # the kept/dropped split partitions the corpus exactly
        assert r["n_kept"] + r["n_dropped"] == n_vecs
        assert abs(r["retention"] - round(r["n_kept"] / n_vecs, 6)) < 1e-9
        assert abs(r["eps"] - round(1 - t, 2)) < 1e-9


def test_semdedup_deployed_threshold_matches_semantic_cluster(spark):
    """The 0.45 row of the sweep IS the deployed dedup_semantic_cluster
    policy: same pair count, same dropped set size."""
    row = {
        r["sim_threshold"]: r
        for r in dedup_semdedup_eps(spark, SF_DIR).collect()
    }[0.45]
    pairs = dedup_semantic_cluster(spark, SF_DIR).collect()
    assert row["n_pairs"] == len(pairs)
    assert row["n_dropped"] == len({p["vec_b"] for p in pairs})


def test_churn_is_exact_reclassification_of_recall_pairs(spark):
    """Per family, the churn classes partition sim_ann_recall's truth
    pairs: pair and catch totals agree exactly (placement is a pure
    function of the vector, so churn can relabel pairs but never change
    a flag), and the churned class size equals the truth pairs whose
    either endpoint is id-divisible by the churn modulus."""
    churn = ann_recall_under_churn(spark, SF_DIR).collect()
    recall = sim_ann_recall(spark, SF_DIR).collect()
    for fam in ("lsh", "ivf"):
        c_rows = [r for r in churn if r["family"] == fam]
        r_rows = [r for r in recall if r["family"] == fam]
        assert sum(r["n_pairs"] for r in c_rows) == sum(
            r["n_pairs"] for r in r_rows
        )
        assert sum(r["n_caught"] for r in c_rows) == sum(
            r["n_caught"] for r in r_rows
        )
    exact = sim_knn_per_query(spark, SF_DIR).select("query_id", "neighbor_id")
    n_churned_truth = exact.filter(
        (F.col("query_id") % _CHURN_MOD == 0)
        | (F.col("neighbor_id") % _CHURN_MOD == 0)
    ).count()
    by_class = {
        (r["family"], r["pair_class"]): r["n_pairs"] for r in churn
    }
    for fam in ("lsh", "ivf"):
        assert by_class.get((fam, "churned"), 0) == n_churned_truth
