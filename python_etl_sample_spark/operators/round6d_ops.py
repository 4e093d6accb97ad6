"""Round-6 fourth batch: MMR diversified re-ranking (the RAG retrieval
operator plain top-k similarity can't express), the Mann-Kendall trend
test (nonparametric complement to OLS slopes), Theil inequality
decomposition (the additively-decomposable complement to Gini), and
daily user lifecycle states (new / retained / resurrected / churned).

Parity notes: similarity values follow the established embedding-oracle
idiom (index-ordered double fold, round 9 — operators/similarity.py);
MMR's greedy argmax steps are unrolled with a (score DESC, vec_id ASC)
tie-break so both engines pick identical items; Mann-Kendall's S is a
pure integer sign sum over decimal-exact monthly revenues; Theil uses
the PMI/PSI-precedented ln surface over exact-sum ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum, dsum_sql
from python_etl_sample_spark.operators.similarity import _dot, _dot_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: MMR: queries are the two smallest vec_ids; pool = top-8 by cosine;
#: select 3 with relevance weight λ = 0.7.
_MMR_QUERIES = (0, 1)
_MMR_POOL = 8
_MMR_SELECT = 3
_MMR_LAMBDA = 0.7


def _mmr_sql() -> str:
    """Unrolled greedy MMR in DuckDB SQL: pool CTE, candidate-pair sims,
    then one argmax CTE per selection step."""
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    qids = ", ".join(map(str, _MMR_QUERIES))
    return f"""
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings
    ),
    rel AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({_dot_sql('q.embedding', 'c.embedding')}
                   / (q.nrm * c.nrm), 9) AS rel
      FROM v q JOIN v c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN ({qids})
    ),
    pool AS (
      SELECT query_id, cand_id, rel FROM (
        SELECT query_id, cand_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id) AS rn
        FROM rel
      ) WHERE rn <= {_MMR_POOL}
    ),
    psim AS (
      SELECT p.query_id, p.cand_id AS a, p2.cand_id AS b,
             round({_dot_sql('va.embedding', 'vb.embedding')}
                   / (va.nrm * vb.nrm), 9) AS sim
      FROM pool p
      JOIN pool p2 ON p2.query_id = p.query_id AND p2.cand_id <> p.cand_id
      JOIN v va ON va.vec_id = p.cand_id
      JOIN v vb ON vb.vec_id = p2.cand_id
    ),
    s1 AS (
      SELECT query_id, cand_id, rel AS score FROM (
        SELECT query_id, cand_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id) AS rn
        FROM pool
      ) WHERE rn = 1
    ),
    m2 AS (
      SELECT p.query_id, p.cand_id,
             {lam} * p.rel - {mu} * ps.sim AS score
      FROM pool p
      JOIN s1 ON s1.query_id = p.query_id AND p.cand_id <> s1.cand_id
      JOIN psim ps ON ps.query_id = p.query_id
                  AND ps.a = p.cand_id AND ps.b = s1.cand_id
    ),
    s2 AS (
      SELECT query_id, cand_id, score FROM (
        SELECT query_id, cand_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, cand_id) AS rn
        FROM m2
      ) WHERE rn = 1
    ),
    m3 AS (
      SELECT p.query_id, p.cand_id,
             {lam} * p.rel
             - {mu} * GREATEST(ps1.sim, ps2.sim) AS score
      FROM pool p
      JOIN s1 ON s1.query_id = p.query_id
      JOIN s2 ON s2.query_id = p.query_id
      JOIN psim ps1 ON ps1.query_id = p.query_id
                   AND ps1.a = p.cand_id AND ps1.b = s1.cand_id
      JOIN psim ps2 ON ps2.query_id = p.query_id
                   AND ps2.a = p.cand_id AND ps2.b = s2.cand_id
      WHERE p.cand_id <> s1.cand_id AND p.cand_id <> s2.cand_id
    ),
    s3 AS (
      SELECT query_id, cand_id, score FROM (
        SELECT query_id, cand_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, cand_id) AS rn
        FROM m3
      ) WHERE rn = 1
    )
    SELECT query_id, 1 AS rank, cand_id AS vec_id,
           ROUND(score, 6) AS mmr_score FROM s1
    UNION ALL
    SELECT query_id, 2, cand_id, ROUND(score, 6) FROM s2
    UNION ALL
    SELECT query_id, 3, cand_id, ROUND(score, 6) FROM s3
    """


@query("sim_mmr_rerank", oracle=_mmr_sql())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein):
    from each query's top-{_MMR_POOL} cosine pool, greedily select
    {_MMR_SELECT} items maximizing λ·relevance − (1−λ)·max-similarity-
    to-already-selected — the diversified-retrieval step RAG pipelines
    run AFTER ANN so near-duplicate passages don't crowd the context
    window. Plain top-k (sim_cosine_topk) cannot express it: the score
    of item 3 depends on items 1-2.

    The greedy loop is unrolled into {_MMR_SELECT} argmax rounds with a
    (score DESC, vec_id ASC) tie-break, making the selection fully
    deterministic — the oracle replays it exactly. Relevance and
    pairwise sims use the repo's index-ordered-fold + round-9 idiom.
    Scale: the pool build is the ANN tier's job (here exact top-8 per
    query); after it, every round works on ≤{_MMR_POOL} rows/query —
    per-query work is CONSTANT, so the whole rerank is a narrow
    map-side pipeline over queries at 100 TB."""
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    emb = emb.withColumn("nrm", F.sqrt(_dot(F.col("vec"), F.col("vec"))))
    q = emb.filter(F.col("vec_id").isin(*_MMR_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    rel = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            "vec",
            "nrm",
            F.round(
                _dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")),
                9,
            ).alias("rel"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("cand_id"))
    # the pool CARRIES its vectors (8 rows x 64 doubles per query), so
    # the candidate-pair sims below are a tiny pool⋈pool join — never a
    # second pass over the full embeddings table
    pool_v = (
        rel.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _MMR_POOL)
        .drop("rn")
    )
    pool = pool_v.select("query_id", "cand_id", "rel")
    p2 = pool_v.select(
        "query_id",
        F.col("cand_id").alias("b_cand"),
        F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    psim = (
        pool_v.join(p2, "query_id")
        .filter(F.col("cand_id") != F.col("b_cand"))
        .select(
            "query_id",
            F.col("cand_id").alias("a"),
            F.col("b_cand").alias("b"),
            F.round(
                _dot(F.col("vec"), F.col("b_vec"))
                / (F.col("nrm") * F.col("b_nrm")),
                9,
            ).alias("sim"),
        )
    )
    wscore = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("cand_id")
    )

    def argmax(df):
        return (
            df.withColumn("rn", F.row_number().over(wscore))
            .filter(F.col("rn") == 1)
            .select("query_id", "cand_id", "score")
        )

    s1 = argmax(pool.select("query_id", "cand_id", F.col("rel").alias("score")))
    s1k = s1.select("query_id", F.col("cand_id").alias("s1_id"))
    m2 = (
        pool.join(s1k, "query_id")
        .filter(F.col("cand_id") != F.col("s1_id"))
        .join(
            psim.select(
                "query_id",
                F.col("a").alias("cand_id"),
                F.col("b").alias("s1_id"),
                F.col("sim").alias("sim1"),
            ),
            ["query_id", "cand_id", "s1_id"],
        )
        .select(
            "query_id", "cand_id", (lam * F.col("rel") - mu * F.col("sim1")).alias("score")
        )
    )
    s2 = argmax(m2)
    s2k = s2.select("query_id", F.col("cand_id").alias("s2_id"))
    m3 = (
        pool.join(s1k, "query_id")
        .join(s2k, "query_id")
        .filter((F.col("cand_id") != F.col("s1_id")) & (F.col("cand_id") != F.col("s2_id")))
        .join(
            psim.select(
                "query_id",
                F.col("a").alias("cand_id"),
                F.col("b").alias("s1_id"),
                F.col("sim").alias("sim1"),
            ),
            ["query_id", "cand_id", "s1_id"],
        )
        .join(
            psim.select(
                "query_id",
                F.col("a").alias("cand_id"),
                F.col("b").alias("s2_id"),
                F.col("sim").alias("sim2"),
            ),
            ["query_id", "cand_id", "s2_id"],
        )
        .select(
            "query_id",
            "cand_id",
            (lam * F.col("rel") - mu * F.greatest("sim1", "sim2")).alias("score"),
        )
    )
    s3 = argmax(m3)
    out = (
        s1.select("query_id", F.lit(1).alias("rank"), "cand_id", "score")
        .union(s2.select("query_id", F.lit(2), "cand_id", "score"))
        .union(s3.select("query_id", F.lit(3), "cand_id", "score"))
    )
    return out.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("cand_id").alias("vec_id"),
        F.round("score", 6).alias("mmr_score"),
    )


@query(
    "stats_mann_kendall_trend",
    oracle=f"""
    WITH monthly AS (
      SELECT c.c_mktsegment AS seg,
             CAST(date_part('year', o.o_orderdate) * 12
                  + date_part('month', o.o_orderdate) AS INTEGER) AS m,
             {dsum_sql('o.o_totalprice')} AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.seg,
             CASE WHEN b.rev > a.rev THEN 1
                  WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
      FROM monthly a JOIN monthly b
        ON a.seg = b.seg AND b.m > a.m
    ),
    n AS (SELECT seg, COUNT(*) AS n_months FROM monthly GROUP BY seg)
    SELECT n.seg, n.n_months,
           COALESCE(CAST(SUM(p.sgn) AS BIGINT), 0) AS s_stat,
           ROUND(CAST(COALESCE(SUM(p.sgn), 0) AS DOUBLE)
                 / NULLIF(n.n_months * (n.n_months - 1) / 2, 0), 6)
             AS kendall_tau
    FROM n LEFT JOIN pairs p ON p.seg = n.seg
    GROUP BY n.seg, n.n_months
    """,
)
def stats_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per market segment on monthly revenue:
    S = Σ_{{i<j}} sign(x_j − x_i) over the month-ordered series, and
    Kendall's tau = S / C(n,2) — the nonparametric "is it trending"
    answer that, unlike an OLS slope (agg_regression_ols), is immune to
    outlier months and needs no linearity assumption.

    Monthly revenues are decimal-exact sums, so every sign comparison
    is exact and S is a pure integer — tau is one division, rounded.
    The i<j self-join is over the BOUNDED monthly frame (n ≈ 80 months
    → ~3.2k pairs/segment), never over raw orders: the classic
    aggregate-then-quadratic shape that stays constant-size as the
    fact table grows to 100 TB."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("int")
            .alias("m"),
        )
        .agg(dsum("o_totalprice").alias("rev"))
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    pairs = a.join(
        b, (F.col("a.seg") == F.col("b.seg")) & (F.col("b.m") > F.col("a.m"))
    ).select(
        F.col("a.seg").alias("seg"),
        F.when(F.col("b.rev") > F.col("a.rev"), 1)
        .when(F.col("b.rev") < F.col("a.rev"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    n = monthly.groupBy("seg").agg(F.count(F.lit(1)).alias("n_months"))
    return (
        n.join(pairs, "seg", "left")
        .groupBy("seg", "n_months")
        .agg(
            F.coalesce(F.sum("sgn"), F.lit(0)).cast("bigint").alias("s_stat"),
        )
        .select(
            "seg",
            "n_months",
            "s_stat",
            F.round(
                F.when(
                    F.col("n_months") > 1,
                    F.col("s_stat").cast("double")
                    / (F.col("n_months") * (F.col("n_months") - 1) / 2),
                ),
                6,
            ).alias("kendall_tau"),
        )
    )


@query(
    "agg_theil_index",
    oracle=f"""
    WITH cust AS (
      SELECT c.c_nationkey AS nation, o.o_custkey AS k,
             {dsum_sql('o.o_totalprice')} AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT nation, COUNT(*) AS ng, {dsum_sql('x')} AS xg
      FROM cust GROUP BY nation
    ),
    tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, {dsum_sql('xg')} AS xt FROM g)
    SELECT c.nation,
           MAX(g.ng) AS n_customers,
           ROUND(SUM((c.x / g.xg) * ln((c.x / g.xg) * g.ng)), 6)
             AS theil_within,
           ROUND(MAX((g.xg / t.xt) * ln((g.xg / t.xt) * (t.n / g.ng))), 6)
             AS between_term,
           ROUND(MAX(g.xg / t.xt), 6) AS revenue_share
    FROM cust c
    JOIN g ON g.nation = c.nation
    CROSS JOIN tot t
    GROUP BY c.nation
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue, decomposed by
    nation: within-nation T_g = Σ (x/X_g)·ln((x/X_g)·n_g) plus each
    nation's between-group term (X_g/X)·ln((X_g/X)·(n/n_g)) — total
    inequality = Σ share·T_g + Σ between, the additive decomposition
    Gini (stats_gini_lorenz) famously lacks, which is why Theil is the
    concentration diagnostic for partitioned data.

    Customer revenues are decimal-exact; every ln argument is a ratio
    of exact sums times an exact count (PMI/PSI ln-parity surface);
    the per-nation rollup sums ≤customers terms, rounded at 6 dp.
    Scale: one custkey aggregate (co-partitioned with the orders
    scan), one nation aggregate, two broadcast scalar attaches."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"), F.col("o_custkey").alias("k")
        )
        .agg(dsum("o_totalprice").alias("x"))
    )
    g = cust.groupBy("nation").agg(
        F.count(F.lit(1)).alias("ng"), dsum("x").alias("xg")
    )
    tot = g.agg(
        F.sum("ng").cast("bigint").alias("n"), dsum("xg").alias("xt")
    )
    return (
        cust.join(F.broadcast(g), "nation")
        .crossJoin(F.broadcast(tot))
        .groupBy("nation")
        .agg(
            F.max("ng").alias("n_customers"),
            F.round(
                F.sum(
                    (F.col("x") / F.col("xg"))
                    * F.log((F.col("x") / F.col("xg")) * F.col("ng"))
                ),
                6,
            ).alias("theil_within"),
            F.round(
                F.max(
                    (F.col("xg") / F.col("xt"))
                    * F.log(
                        (F.col("xg") / F.col("xt"))
                        * (F.col("n") / F.col("ng"))
                    )
                ),
                6,
            ).alias("between_term"),
            F.round(F.max(F.col("xg") / F.col("xt")), 6).alias("revenue_share"),
        )
    )


@query(
    "events_user_lifecycle",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS m
      FROM events
    ),
    flagged AS (
      SELECT user_id, m,
             LAG(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m,
             MIN(m) OVER (PARTITION BY user_id) AS first_m
      FROM active
    ),
    states AS (
      SELECT m,
             CASE WHEN m = first_m THEN 'new'
                  WHEN prev_m = m - 1 THEN 'retained'
                  ELSE 'resurrected' END AS state
      FROM flagged
    ),
    churn AS (
      SELECT m + 1 AS m, 'churned' AS state
      FROM flagged f
      WHERE NOT EXISTS (
        SELECT 1 FROM active a
        WHERE a.user_id = f.user_id AND a.m = f.m + 1
      )
      AND m + 1 <= (SELECT MAX(m) FROM active)
    )
    SELECT m AS day_idx, state, COUNT(*) AS n_users
    FROM (SELECT * FROM states UNION ALL SELECT * FROM churn)
    GROUP BY m, state
    """,
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user lifecycle accounting (epoch-day periods — the events
    fixture spans one month, so days are the natural grain; swap 86400
    for any period length): every active (user, day) is exactly one of
    new (first day ever), retained (also active the previous day), or
    resurrected (active before, but not yesterday); churned counts
    users active on d−1 who vanish on d (within the observed range).
    The growth-accounting identity every subscription dashboard runs —
    and the composite of window-lag, first-value, anti-join-existence,
    and period arithmetic.

    All integer day indexes and exact counts. Scale: the distinct
    (user, day) frame is the only shuffle (partial-agg map-side); the
    lag/min windows partition BY USER (never global), and the churn
    check is a self anti-join on the same partitioning."""
    ev = table(spark, sf_dir, "events")
    active = (
        ev.select(
            "user_id",
            F.expr("unix_timestamp(cast(ts as timestamp)) div 86400").alias("m"),
        )
        .distinct()
    )
    wu = Window.partitionBy("user_id").orderBy("m")
    wall = Window.partitionBy("user_id")
    flagged = active.select(
        "user_id",
        "m",
        F.lag("m").over(wu).alias("prev_m"),
        F.min("m").over(wall).alias("first_m"),
    )
    states = flagged.select(
        "m",
        F.when(F.col("m") == F.col("first_m"), "new")
        .when(F.col("prev_m") == F.col("m") - 1, "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    max_m = active.agg(F.max("m").alias("max_m"))
    cand = flagged.select("user_id", (F.col("m") + 1).alias("m"))
    churn = (
        cand.join(active, ["user_id", "m"], "left_anti")
        .crossJoin(F.broadcast(max_m))
        .filter(F.col("m") <= F.col("max_m"))
        .select("m", F.lit("churned").alias("state"))
    )
    return (
        states.union(churn)
        .groupBy(F.col("m").alias("day_idx"), "state")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
