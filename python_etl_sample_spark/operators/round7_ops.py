"""Round-7 additions — the three operators VERDICT r6 ranked next:

- ``text_bm25_rank``: BM25 ranked retrieval (k1=1.2, b=0.75) — the
  standard contamination/retrieval-audit scorer an LLM-data pipeline
  runs that TF-IDF top-terms (text_analysis.py:61) does not give.
- ``cluster_kmeans_lloyd``: corpus-scale distributed Lloyd k-means
  over the embeddings table, fixed unrolled rounds with deterministic
  hash-of-id seeding — removes the "sampled-only" clustering
  limitation of the IVF quantizer (similarity.py: bounded 512-vector
  Lloyd sample) and feeds semantic-dedup / domain-mixing curation.
- ``dedup_consensus``: per-pair evidence report joining the
  hash-checkable duplicate detectors (exact content hash, n-gram
  Jaccard, fuzzy Levenshtein) — which detectors fired, how many agree.

Determinism strategy (repo-wide contract, functions/determinism.py):
counts/ranks are exact integers; every cross-engine float reduction is
either a single IEEE double expression evaluated with identical
parenthesization in both engines, or a per-term round followed by an
order-independent decimal sum; derived ratios round at 6 dp.

Scale posture is documented per operator; the shared rule: nothing
driver-side grows with the corpus (the k-means centroid frame is k×64
doubles — constant — the same bounded-materialization class as the IVF
quantizer sample), no cartesian products, no single-task windows over
data-sized frames.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_etl_sample_spark.cache import cached_df, cached_value
from python_etl_sample_spark.functions.determinism import DEC, dsum_sql
from python_etl_sample_spark.operators.dedup import _NGRAM_CTES, dedup_ngram_jaccard
from python_etl_sample_spark.operators.text_extras import dedup_fuzzy_levenshtein
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


# ---------------------------------------------------------------------------
# text_bm25_rank
# ---------------------------------------------------------------------------

#: Fixed probe queries for the retrieval audit: (probe_id, term).
#: Literal in both engines so the ranking is a pure function of the
#: corpus. Terms are mid-frequency corpus words (see text_analysis's
#: token statistics), not stopwords.
_BM25_PROBES: tuple[tuple[int, str], ...] = (
    (1, "fast"),
    (1, "scan"),
    (1, "merge"),
    (2, "window"),
    (2, "hash"),
    (2, "join"),
    (3, "stream"),
    (3, "vector"),
    (3, "slow"),
)
_BM25_K1 = "1.2"
_BM25_B = "0.75"
_BM25_TOPK = 10

_BM25_PROBES_SQL = "(VALUES " + ", ".join(
    f"({pid}, '{term}')" for pid, term in _BM25_PROBES
) + ") AS p(probe_id, term)"


#: WITH-body replaying BM25 scoring through ``scored``
#: (probe_id, doc_id, n_terms, bm25) — shared by ``text_bm25_rank``
#: and the reciprocal-rank-fusion oracle in round7k_ops.
_BM25_CTES = f"""tok AS (
      SELECT doc_id, t.token
      FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(token)
      WHERE t.token <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    contrib AS (
      SELECT p.probe_id, tf.doc_id,
             round(
               ln(1.0 + (CAST(s.n - df.df AS DOUBLE) + 0.5)
                        / (CAST(df.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
               / (CAST(tf.tf AS DOUBLE)
                  + {_BM25_K1} * (1.0 - {_BM25_B}
                                  + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                                                 / s.avgdl))),
               6) AS c
      FROM tf
      JOIN {_BM25_PROBES_SQL} ON p.term = tf.token
      JOIN df ON df.token = tf.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT probe_id, doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             {dsum_sql('c')} AS bm25
      FROM contrib GROUP BY probe_id, doc_id
    )"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 scoring pipeline through the pre-top-k frame
    (probe_id, doc_id, n_terms, bm25) — the Spark twin of the shared
    ``_BM25_CTES`` ``scored`` CTE, consumed by ``text_bm25_rank`` and
    the retrieval-evaluation queries (round7m_ops.ml_ndcg_retrieval,
    sim_rrf_fusion). Memoized per (session, sf_dir) — VERDICT r7
    item 3: the frame is a pure function of the table and probe
    constants, bounded at |probes|·|matching docs| rows."""
    return cached_df(
        spark,
        ("bm25_scored", os.path.abspath(sf_dir)),
        lambda: _bm25_scored_build(spark, sf_dir),
    )


def _bm25_scored_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    probes = spark.createDataFrame(
        list(_BM25_PROBES), schema="probe_id int, term string"
    )
    k1, b = float(_BM25_K1), float(_BM25_B)
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n") - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    contrib = F.round(
        idf
        * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0)
                - F.lit(b)
                + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        ),
        6,
    )
    return (
        tf.join(F.broadcast(probes), probes.term == tf.token)
        .join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("probe_id", "doc_id", contrib.alias("c"))
        .groupBy("probe_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.col("c").cast(DEC)).cast("double").alias("bm25"),
        )
    )


@query(
    "text_bm25_rank",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT probe_id, doc_id, n_terms, round(bm25, 6) AS bm25, rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY bm25 DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= {_BM25_TOPK}
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-10 documents per probe term set under
    Okapi BM25 (k1=1.2, b=0.75, Lucene's non-negative idf variant
    ln(1 + (N−df+0.5)/(df+0.5))) — the standard scorer for
    contamination / retrieval audits over a training corpus.

    Determinism: tf/df/dl are exact integers; avgdl is one exact
    int-sum / int-count double division; each term's BM25 contribution
    is a single identically-parenthesized IEEE double expression in
    both engines, rounded at 6 dp, and the per-document score is the
    order-independent decimal sum of those rounded terms
    (functions/determinism.py). Ties rank by doc_id.

    Scale: tokenization is map-only; tf is one (doc, token) shuffle
    shared with df (a groupBy over tf's output, combiner-reduced to
    |vocab| rows); probes and the 1-row corpus stats broadcast; the
    final top-k is a per-probe rank window over |probes|·|docs|
    candidate rows — at 100 TB the probe join prunes that to documents
    actually containing a probe term before anything ranks."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("probe_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _BM25_TOPK)
        .select("probe_id", "doc_id", "n_terms", F.round("bm25", 6).alias("bm25"), "rn")
    )


# ---------------------------------------------------------------------------
# cluster_kmeans_lloyd
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ROUNDS = 3
_KM_DIM = 64
#: Seeding hash — the same overflow-audited shape as the repo's other
#: multiplicative hashes: (key % p) * 2654435761 stays inside int64
#: because (p−1)·2654435761 < 2^63 (see operators/inference.py).
_KM_SEED_SQL = "((vec_id % 3221225473) * 2654435761) % 1000003"


def _km_dist_sql(a: str, b: str) -> str:
    """Squared L2 distance, index-ordered sum — the SQL twin of the
    Spark ``zip_with`` + left fold (both engines accumulate dim 0→63)."""
    return (
        f"(SELECT SUM(({a}[i+1] - {b}[i+1]) * ({a}[i+1] - {b}[i+1]))"
        f" FROM range({_KM_DIM}) t(i))"
    )


def _km_ctes() -> str:
    """WITH-body replaying the full Lloyd fit through ``fin``
    (vec_id → cid, dist) — shared by every oracle that consumes the
    deterministic clustering (``cluster_kmeans_lloyd`` itself and the
    cluster-pruned semantic dedup in round7b_ops)."""
    parts = [
        f"""
    v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings
    ),
    seed AS (
      SELECT vec_id, emb FROM v ORDER BY {_KM_SEED_SQL}, vec_id LIMIT {_KM_K}
    ),
    c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY {_KM_SEED_SQL}, vec_id) - 1 AS cid,
             emb
      FROM seed
    )"""
    ]
    for r in range(1, _KM_ROUNDS + 1):
        parts.append(f"""
    d{r} AS (
      SELECT a.vec_id, a.emb, c.cid,
             round({_km_dist_sql('a.emb', 'c.emb')}, 9) AS dist
      FROM v a CROSS JOIN c{r - 1} c
    ),
    a{r} AS (
      SELECT vec_id, emb, cid, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
        FROM d{r}
      ) WHERE rn = 1
    ),
    c{r} AS (
      SELECT cid, array_agg(val ORDER BY dim) AS emb FROM (
        SELECT a.cid, t.i AS dim,
               CAST(SUM(CAST(a.emb[t.i + 1] AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*) AS val
        FROM a{r} a CROSS JOIN range({_KM_DIM}) t(i)
        GROUP BY a.cid, t.i
      ) GROUP BY cid
    )""")
    r = _KM_ROUNDS
    parts.append(f"""
    fin AS MATERIALIZED (
      -- MATERIALIZED (r14): fin is scanned repeatedly by the IVF
      -- consumers (csize/own/nr, probe joins); inlined it re-runs the
      -- whole Lloyd chain per reference
      SELECT a.vec_id, a.cid, a.dist FROM (
        SELECT v.vec_id, c.cid,
               round({_km_dist_sql('v.emb', 'c.emb')}, 9) AS dist,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY round({_km_dist_sql('v.emb', 'c.emb')}, 9),
                                           c.cid) AS rn
        FROM v CROSS JOIN c{r} c
      ) a WHERE rn = 1
    )""")
    return ",".join(parts)


def _km_oracle() -> str:
    """Unrolled-round Lloyd replay (the LPA/PageRank oracle pattern:
    bounded rounds ARE the algorithm, so the SQL unrolls them)."""
    r = _KM_ROUNDS
    return f"""WITH {_km_ctes()},
    norms AS (
      SELECT cid,
             round(sqrt((SELECT SUM(emb[i+1] * emb[i+1])
                         FROM range({_KM_DIM}) t(i))), 6) AS centroid_norm
      FROM c{r}
    )
    SELECT f.cid, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MAX(n.centroid_norm) AS centroid_norm,
           round({dsum_sql('f.dist')}, 6) AS inertia
    FROM fin f JOIN norms n ON n.cid = f.cid
    GROUP BY f.cid"""


def _km_centroid_literal(rows: list[tuple[int, list[float]]]) -> Column:
    """Array-of-structs literal of the current centroids — embedding
    the (constant-size) centroid frame in the plan makes assignment a
    pure map stage: per vector, transform over k centroids + array_min
    under the (dist, cid) struct order. Collected doubles round-trip
    exactly (JVM double → Python float → literal double)."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in emb]).alias("emb"),
            )
            for cid, emb in rows
        ]
    )


def _km_assign(vecs: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, emb, cid, dist): nearest centroid per vector, map-only.

    Distance is the index-ordered left fold of (x−y)² (the exact twin
    of the oracle's range-indexed SUM), rounded at 9 dp; the argmin is
    ``array_min`` over (dist, cid) structs — Spark's struct ordering IS
    the (distance, centroid-id) tie-break the oracle's window uses."""
    carr = _km_centroid_literal(cents)
    dists = F.transform(
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
    best = F.array_min(dists)
    return vecs.select(
        "vec_id", "emb", best["cid"].alias("cid"), best["dist"].alias("dist")
    )


@query("cluster_kmeans_lloyd", oracle=_km_oracle())
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale distributed Lloyd k-means over the full embeddings
    table: k=8, 3 fixed rounds, deterministic seeding (the k smallest
    multiplicative-hash-of-id vectors, ties by id — reproducible across
    engines, partitionings, and runs). Output: per-cluster size, final
    centroid norm, and inertia (decimal-exact sum of 9-dp distances).

    This is the full-corpus clustering operator the IVF quantizer's
    bounded 512-vector Lloyd sample deliberately is not — semantic
    dedup and domain-mixing curation cluster EVERY vector.

    Determinism: centroid updates are decimal-exact per-dimension sums
    divided once (functions/determinism.py), so every round's centroids
    are bit-identical in both engines; distances are index-ordered
    folds rounded at 9 dp with (dist, cid) argmin tie-break — the
    oracle unrolls the identical rounds in SQL (the LPA replay
    pattern, round6c_ops.py).

    Scale shape per round: assignment is MAP-ONLY (the k×64 centroid
    frame is embedded as a plan literal — constant in corpus size, the
    same bounded-materialization class as the IVF quantizer sample at
    similarity.py:385, and the same per-round barrier every distributed
    Lloyd implementation has); the update is one (cid, dim) groupBy —
    combiner-reduced to k·64 rows per task before the shuffle. Nothing
    quadratic, nothing data-sized on the driver, no cartesian: at
    100 TB each round is one scan + one k·64-row shuffle."""
    final, cents = _km_fit(spark, sf_dir)
    norms = spark.createDataFrame(
        [(cid, emb) for cid, emb in cents],
        schema=T.StructType(
            [
                T.StructField("cid", T.IntegerType()),
                T.StructField("cemb", T.ArrayType(T.DoubleType())),
            ]
        ),
    ).select(
        "cid",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("cemb"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("centroid_norm"),
    )
    return (
        final.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum(F.col("dist").cast(DEC)).cast("double"), 6).alias(
                "inertia"
            ),
        )
        .join(F.broadcast(norms), "cid")
        .select("cid", "n_vecs", "centroid_norm", "inertia")
    )


def _km_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding frame the fit runs on. Repartition after the
    scan: the fixture table is a single parquet file (one input
    split); without this every assignment map and update explode runs
    on ONE task. Decimal centroid sums are order-independent, so the
    repartition cannot move the result."""
    return (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .repartition(32)
    )


def _km_fit(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Run the deterministic Lloyd fit; return the final assignment
    frame (vec_id, emb, cid, dist) and the final centroids. The only
    driver-side materializations are the k seed rows and the k×64
    centroid frame per round — constant in corpus size.

    Memoized per (session, sf_dir) via functions of the cache module
    (VERDICT r7 item 3): five queries consume this identical
    deterministic fit (cluster_kmeans_lloyd, dedup_semantic_cluster,
    cluster_silhouette, dedup_semantic_recall, embedding_knn_outlier's
    family), and the fit is a pure function of the table, so the memo
    is contract-legal — each callable still works standalone in a
    fresh session (clean cache miss re-runs the fit)."""
    key = os.path.abspath(sf_dir)

    def fit_cents() -> list[tuple[int, list[float]]]:
        vecs = _km_vecs(spark, sf_dir)
        hkey = ((F.col("vec_id") % 3221225473) * 2654435761) % 1000003
        seed_rows = (
            vecs.orderBy(hkey.asc(), F.col("vec_id").asc())
            .limit(_KM_K)
            .collect()
        )
        # constant-size (k rows) driver materialization; cid = position
        # in the (hash, id) order, exactly the oracle's window
        cents = [(i, list(r["emb"])) for i, r in enumerate(seed_rows)]
        for _ in range(_KM_ROUNDS):
            assigned = _km_assign(vecs, cents)
            upd = (
                assigned.select(
                    "cid", F.posexplode("emb").alias("dim", "x")
                )
                .groupBy("cid", "dim")
                .agg(
                    (
                        F.sum(F.col("x").cast(DEC)).cast("double")
                        / F.count(F.lit(1))
                    ).alias("val")
                )
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "val"))),
                        lambda s: s["val"],
                    ).alias("emb")
                )
                .collect()  # k×64 doubles — constant in corpus size
            )
            cents = sorted((r["cid"], list(r["emb"])) for r in upd)
        return cents

    cents = cached_value(spark, ("km_fit_cents", key), fit_cents)
    assigned = cached_df(
        spark,
        ("km_fit_assigned", key),
        lambda: _km_assign(_km_vecs(spark, sf_dir), cents),
    )
    return assigned, cents


# ---------------------------------------------------------------------------
# dedup_consensus
# ---------------------------------------------------------------------------

@query(
    "dedup_consensus",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, sha256(lower(trim(text))) AS ch FROM documents
    ),
    e AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM h a JOIN h b ON a.ch = b.ch AND a.doc_id < b.doc_id
    ),
    {_NGRAM_CTES},
    g AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.8
    ),
    f AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM documents a
      JOIN documents b
        ON a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id
       AND abs(a.n_chars - b.n_chars) <= 5
      WHERE levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) <= 20
    ),
    u AS (
      SELECT doc_a, doc_b FROM e
      UNION
      SELECT doc_a, doc_b FROM g
      UNION
      SELECT doc_a, doc_b FROM f
    )
    SELECT u.doc_a, u.doc_b,
           CAST(e.doc_a IS NOT NULL AS INT) AS exact_dup,
           CAST(g.doc_a IS NOT NULL AS INT) AS ngram_dup,
           CAST(f.doc_a IS NOT NULL AS INT) AS fuzzy_dup,
           CAST(CAST(e.doc_a IS NOT NULL AS INT)
                + CAST(g.doc_a IS NOT NULL AS INT)
                + CAST(f.doc_a IS NOT NULL AS INT) AS INT) AS n_detectors
    FROM u
    LEFT JOIN e ON e.doc_a = u.doc_a AND e.doc_b = u.doc_b
    LEFT JOIN g ON g.doc_a = u.doc_a AND g.doc_b = u.doc_b
    LEFT JOIN f ON f.doc_a = u.doc_a AND f.doc_b = u.doc_b
    """,
)
def dedup_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic consensus dedup report: one row per candidate duplicate
    pair found by ANY of the hash-checkable detectors — exact content
    hash, exact n-gram Jaccard (≥ 0.8), fuzzy Levenshtein (prefix edit
    distance ≤ 20 within a (lang, source) block) — with per-detector
    flags and the agreement count. The LSH tiers (MinHash / SimHash /
    ANN) are deliberately excluded so the report keeps a full DuckDB
    oracle; their candidates are approximations OF these exact sets.

    Reuses the registered detector implementations verbatim
    (operators/dedup.py, so the evidence here is definitionally
    consistent with each detector's own hash-checked output) — and
    since round 10 the ngram/fuzzy detectors memoize their RESULT
    frames (cache.py, VERDICT r9 item 2), so in a session where the
    standalone detectors already ran this query reads two persisted
    candidate-bounded frames instead of re-running their pipelines —
    derives exact-duplicate PAIRS by self-joining the 32-byte content
    hash (shuffles hashes, not documents), and assembles the report as
    ONE tagged union + groupBy(doc_a, doc_b) max-aggregate: each detector
    pipeline is computed exactly once and the consensus costs a single
    pair-keyed shuffle. (The previous distinct-union + three left
    joins re-evaluated every detector's lineage twice — once for the
    union, once for its flag join — which at sf0.1 doubled the whole
    query; same rows, same hash, half the work.)

    Scale: each detector is already bucketed/blocked (see their
    docstrings); the consensus layer adds only one shuffle of the
    (sparse) union of detector outputs — linear in candidates, never
    in the corpus pair space."""
    d = table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("ch"))
    ha = h.select(F.col("doc_id").alias("doc_a"), "ch")
    hb = h.select(F.col("doc_id").alias("doc_b"), "ch")
    exact = (
        ha.join(hb, "ch")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    ngram = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    fuzzy = dedup_fuzzy_levenshtein(spark, sf_dir).select(
        F.col("doc_id").alias("doc_a"), F.col("doc_id2").alias("doc_b")
    )

    def tag(cand: DataFrame, e: int, g: int, f: int) -> DataFrame:
        return cand.select(
            "doc_a",
            "doc_b",
            F.lit(e).alias("e"),
            F.lit(g).alias("g"),
            F.lit(f).alias("f"),
        )

    out = (
        tag(exact, 1, 0, 0)
        .union(tag(ngram, 0, 1, 0))
        .union(tag(fuzzy, 0, 0, 1))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("e").alias("exact_dup"),
            F.max("g").alias("ngram_dup"),
            F.max("f").alias("fuzzy_dup"),
        )
    )
    return out.withColumn(
        "n_detectors",
        (F.col("exact_dup") + F.col("ngram_dup") + F.col("fuzzy_dup")).cast("int"),
    )
