"""Round-10e invariants (operators/round10e_ops.py).

Beyond driver oracle parity:

1. Monotonicity + the exhaustive anchor: candidates and retention both
   grow with nprobe; nprobe = k probes every cell, so its candidates
   are exactly all-but-self and retention is exactly 1.0.
2. Cross-pin to the shipped tier: a top-5-exhaustive neighbor that is
   reachable at nprobe = 2 necessarily survives into sim_pq_ivf_adc's
   top-5 (its candidate-set rank can only improve), so the sweep's
   n_covered at nprobe = 2 must EQUAL |IVFADC top-5 ∩ exhaustive
   top-5| — the sweep and the deployed query must tell one story.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"


def test_sweep_monotone_and_exhaustive_anchor(spark):
    rows = {
        r["nprobe"]: r
        for r in REGISTRY["sim_ivf_nprobe_sweep"].fn(spark, SF_DIR).collect()
    }
    assert sorted(rows) == [1, 2, 4, 8]
    for a, b in ((1, 2), (2, 4), (4, 8)):
        assert rows[a]["n_candidates"] <= rows[b]["n_candidates"]
        assert rows[a]["n_covered"] <= rows[b]["n_covered"]
    n_vecs = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    full = rows[8]
    assert full["retention"] == 1.0
    assert full["n_candidates"] == full["n_queries"] * (n_vecs - 1)
    assert full["n_top5"] == 5 * full["n_queries"]
    # partial probing must actually prune (else the sweep is vacuous)
    assert rows[1]["n_candidates"] < full["n_candidates"]


def test_sweep_agrees_with_shipped_ivfadc(spark):
    rows = {
        r["nprobe"]: r
        for r in REGISTRY["sim_ivf_nprobe_sweep"].fn(spark, SF_DIR).collect()
    }
    ex = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["sim_pq_adc"].fn(spark, SF_DIR).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["sim_pq_ivf_adc"].fn(spark, SF_DIR).collect()
    }
    assert rows[2]["n_covered"] == len(ex & ivf)
