"""Similarity search over embeddings — SURVEY.md §2.10 ops #60-62.

Scale posture: #60/#61 are the exact brute-force baselines (O(n²) /
O(q·n) — correct and fine to ~10⁵ vectors); #62 is the 100 TB path:
random-hyperplane LSH buckets candidates so the pair space never
materializes. The cutover is a data-size decision, not a code change —
both paths share the dot-product kernel.

Determinism: dot products fold the 64 dims in index order via
``F.aggregate`` on JVM doubles; the DuckDB oracle mirrors the same
index-order summation with a correlated range() subquery, so the
doubles are IEEE-identical; sims are rounded to 9 dp and tie-broken by
ids before top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


def _dot(a: Column, b: Column) -> Column:
    """Index-ordered fold of the elementwise product (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _vec(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").cast("array<double>").alias(vec_alias),
    )


_DOT_SQL = "(SELECT SUM({a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE) FROM range(64) t(i))"


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b)


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings
    ),
    sims AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 9) AS sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, sim FROM sims
    ORDER BY sim DESC, vec_a, vec_b
    LIMIT 20
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#60 exact top-20 cosine-similar pairs via distributed
    broadcast-GEMM (the correctness baseline the LSH path in #62 is
    judged against).

    Kernel: the full matrix (small side, like a broadcast join build
    side) ships to every task; each Arrow batch of rows computes a
    NumPy ``batch @ all.T`` block, masks to vec_a < vec_b, and emits
    its local top-20 — the global top-20 is a TakeOrdered over
    partitions. This replaces a per-pair higher-order-function fold
    (measured 29 s at sf0.1) with BLAS blocks (~2 s). At 100 TB both
    sides chunk: block-partitioned GEMM, same code per block.
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    all_pdf = e.toPandas()  # the broadcast (build) side: n×64 floats
    ids = all_pdf["vec_id"].to_numpy()
    mat = np.stack(all_pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    k = 20

    def block_topk(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy()
            q_mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
            sims = (q_mat @ b_mat.T) / np.outer(q_norms, b_norms)
            mask = q_ids[:, None] < b_ids[None, :]
            qi, bj = np.nonzero(mask)
            if len(qi) == 0:
                continue
            vals = np.round(sims[qi, bj], 9)
            take = min(k, len(vals))
            top = np.argpartition(-vals, take - 1)[:take]
            yield pd.DataFrame(
                {
                    "vec_a": q_ids[qi[top]],
                    "vec_b": b_ids[bj[top]],
                    "sim": vals[top],
                }
            )

    local = e.mapInPandas(block_topk, "vec_a bigint, vec_b bigint, sim double")
    return local.orderBy(F.desc("sim"), F.asc("vec_a"), F.asc("vec_b")).limit(k)


@query(
    "sim_knn_per_query",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings
    ),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_dot_sql('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 9) AS sim
      FROM v q JOIN v c ON q.vec_id <> c.vec_id
      WHERE q.label = 0
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM sims
    )
    SELECT query_id, neighbor_id, sim, rn FROM ranked WHERE rn <= 5
    """,
)
def sim_knn_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#61 exact 5-NN for every label-0 query vector (label-stratified
    k-NN: query set ⋈ corpus, ranked per query)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    v = _vec(e, "vec_id", "v").withColumn(
        "nrm", F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    labels = e.select("vec_id", "label")
    v = v.join(labels, "vec_id")
    q = v.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("vq"), F.col("nrm").alias("nq")
    )
    c = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vc"),
        F.col("nrm").alias("nc"),
    )
    sims = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc")), 9).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)


@query("sim_ann_lsh", oracle=None)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#62 approximate NN via random-hyperplane LSH
    (BucketedRandomProjectionLSH, fixed seed → deterministic; rows-only:
    bucketing is engine-specific). The 100 TB path: candidate pairs come
    from bucket equality, never the full cross product."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    # threshold must be selective: random 64-dim pairs sit near dist
    # ≈ sqrt(2)·norm (median 1.414 measured), so 1.5 admits nearly all
    # O(n²) pairs (measured 35 s at sf0.1); 1.2 keeps the ~0.15% tail of
    # genuine near neighbors (min dist ≈ 1.0 in the fixtures).
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=1.0,
        numHashTables=2,
        seed=42,
    )
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 1.2, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round(F.col("dist"), 6).alias("euclidean_dist"),
        )
    )
