"""Session-memo lifecycle (cache.py): repeated query invocation must
not accumulate persisted intermediates (round-2 ADVICE — per-call
persists leaked until GC), and release must empty the memo."""

from __future__ import annotations

from python_etl_sample_spark.cache import cache_keys, release_all
from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"


def test_repeated_calls_do_not_grow_cache(spark):
    for _ in range(2):
        REGISTRY["dedup_near_minhash"].fn(spark, SF_DIR).count()
        REGISTRY["sim_cosine_topk"].fn(spark, SF_DIR).count()
        REGISTRY["sim_ann_ivf"].fn(spark, SF_DIR).count()
    n_after_warm = len(cache_keys())
    for _ in range(3):
        REGISTRY["dedup_near_minhash"].fn(spark, SF_DIR).count()
        REGISTRY["sim_cosine_topk"].fn(spark, SF_DIR).count()
        REGISTRY["sim_ann_ivf"].fn(spark, SF_DIR).count()
    assert len(cache_keys()) == n_after_warm, "cache grew across repeated calls"


def test_gemm_queries_share_one_packed_corpus(spark):
    release_all()
    REGISTRY["sim_cosine_topk"].fn(spark, SF_DIR).count()
    keys_after_first = cache_keys()
    REGISTRY["dedup_embedding_cosine"].fn(spark, SF_DIR).count()
    REGISTRY["sim_knn_per_query"].fn(spark, SF_DIR).count()
    # the two later GEMM consumers reuse the packed corpus the first
    # call built — no new packed_embeddings entries
    packed = [k for k in cache_keys() if "packed_embeddings" in k]
    assert len(packed) == 1
    assert keys_after_first == [k for k in cache_keys() if k in keys_after_first]


def test_release_all_empties_the_memo(spark):
    REGISTRY["dedup_near_minhash"].fn(spark, SF_DIR).count()
    assert cache_keys()
    release_all()
    assert cache_keys() == []
    # and the memo rebuilds cleanly afterwards
    assert REGISTRY["dedup_near_minhash"].fn(spark, SF_DIR).count() >= 0
