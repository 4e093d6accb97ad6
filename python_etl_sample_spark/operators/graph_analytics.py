"""Graph analytics over the part co-purchase graph: triangle counting
(degree-oriented, the MapReduce-classic shape) and fixed-iteration
PageRank in exact scaled-integer arithmetic.

The graph: two parts are linked when some 1995 order ships both — the
standard "co-occurrence projection" of the order×part bipartite graph,
the same construction behind related-item graphs and co-citation
networks. The 1995 ship-year filter bounds the projection (each order
contributes C(lines, 2) edges) and is pushed to the parquet scan.

Engine-parity ground rules:

- Triangle counting is pure integers end-to-end — no float can reach
  the hash.
- PageRank runs in scaled-integer arithmetic (rank mass × 10^15 as
  BIGINT, truncating division mirrored textually in the oracle), so
  five join-aggregate iterations are BIT-EXACT across engines: no
  accumulated float-summation drift, no rounding-boundary risk. The
  deliberate truncation leak (≤ deg ulps of 1e-15 mass per node per
  round) is identical in both engines by construction.

Scale posture (100 TB):

- Degree orientation (orient each edge toward the higher-(degree, id)
  endpoint) is the load-balancing trick from Suri & Vassilvitskii's
  MR triangle counting: out-degrees are bounded by ~sqrt(2m), so the
  per-node wedge fan-out — the quadratic step — is capped, and the
  wedge→edge equi-join shuffles on plain int keys. No cartesian
  anywhere (plan-pinned in tests/test_round5_refs.py).
- PageRank iterates shuffle(join on src) → partial-agg(sum by dst);
  ranks stay (node, deg, r) rows co-partitionable with the edge list.
  On a real cluster both sides would be pre-bucketed by node id so
  every round is a zero-exchange join; here AQE handles it. Five
  rounds of lineage on a pair list is well inside plan-size limits —
  the CC kernel's localCheckpoint pattern (functions/components.py)
  is the escape hatch if rounds grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: Rank mass is tracked as BIGINT millionths-of-a-billionth (1e15).
#: 0.85 damping → the largest intermediate is 85 × 10^15 < 2^63.
_PR_SCALE = 1_000_000_000_000_000


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected edge list (u < v) of parts co-shipped in
    the same 1995 order. DISTINCT twice: once to collapse a part
    appearing on several lines of one order, once to collapse a pair
    co-occurring in several orders.

    Deliberately NOT checkpointed/persisted even though consumers fan
    out over it (triangle counting 3×, PageRank's unrolled rounds ~10×):
    the static plan shows the re-derivations, but Spark's ReuseExchange
    dedupes the identical subtrees at runtime — the executed PageRank
    plan carries 20 ReusedExchange nodes and ONE job runs all rounds,
    measured 0.24 s warm at sf0.1 versus 2.2 s for the eager/lazy
    localCheckpoint variant (7 sequential jobs of scheduling overhead).
    Materializing the derived graph becomes the right call only when
    rounds grow past plan-size limits or consumers span JOBS (the CC
    kernel's case); a single-job fan-out should lean on exchange reuse.
    Pinned in test_round5b_refs (executed-plan ReusedExchange count)."""
    # range predicate, not year() — a raw-column comparison reaches the
    # parquet scan as a pushed filter + row-group min/max prune; a
    # function of the column would not (pinned in test_round5b_refs)
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .select("l_orderkey", "l_partkey")
    )
    # per-order pair expansion without the self-join (r14, the
    # basket_brand_pairs_lift shape): ONE groupBy(l_orderkey) shuffle
    # with map-side-combined collect_set replaces the former
    # distinct + self-equi-join — collect_set subsumes the per-order
    # DISTINCT, and sort_array + (j > i) reproduces the a < b pair set
    # exactly. Fan-out stays per-order-bounded (TPC-H baskets ≤ 7
    # lines), so no skew concern at scale; the second DISTINCT (a pair
    # co-occurring in several orders) is unchanged.
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        per_order.select("ps", F.posexplode("ps").alias("i", "u"))
        .select("u", "i", F.posexplode("ps").alias("j", "v"))
        .filter(F.col("j") > F.col("i"))
        .select("u", "v")
        .distinct()
    )


# li/edges/deg are MATERIALIZED (r14): every consumer references edges
# (and often deg) several times — the unrolled iterative oracles up to
# 4x per round — and DuckDB's CTE inlining re-derives the whole
# lineitem self-join per reference, which is what blew graph_kcore_peel
# past a 16 GiB spill budget at sf1 (4 references/round x 4 rounds).
_EDGES_SQL = """
    li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    )
"""


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    oriented AS (
      SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tris AS (
      SELECT COUNT(*) AS n_triangles
      FROM (SELECT o1.s, LEAST(o1.t, o2.t) AS b, GREATEST(o1.t, o2.t) AS c
            FROM oriented o1 JOIN oriented o2
              ON o1.s = o2.s AND o1.t < o2.t) w
      JOIN edges e ON e.u = w.b AND e.v = w.c
    )
    SELECT (SELECT COUNT(*) FROM deg)   AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT n_triangles FROM tris) AS n_triangles,
           ROUND(3.0 * (SELECT n_triangles FROM tris)
                 / NULLIF((SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT)
                           FROM deg), 0), 6)
             AS global_clustering
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the
    co-purchase graph, via degree-oriented wedge checking.

    Each edge is oriented toward its higher-(degree, node-id) endpoint;
    every triangle then has exactly one apex whose two out-edges cover
    it, so counting (wedge at s) ⋈ (closing edge) equi-join hits each
    triangle once — no 3-way enumeration, no double counting, and the
    out-degree (hence the wedge blow-up) is bounded by ~sqrt(2m)
    regardless of raw degree skew. Wedge pairs are canonicalized
    (b < c) so the closing join is against the canonical u<v edge list
    as a plain two-column equi-join."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
        )
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    # wedge enumeration without the self-join (r14): group each apex's
    # out-neighborhood and pair-explode it — one groupBy(s) shuffle
    # instead of shuffling `oriented` twice. sort_array + (j > i)
    # yields each unordered {t, t'} pair once with b < c already
    # canonical (so the old least/greatest normalization is implicit).
    # Per-apex fan-out stays bounded: degree orientation caps
    # out-degree at ~sqrt(2m) regardless of raw degree skew, which is
    # exactly the bound that made the join form safe too.
    wedges = (
        oriented.groupBy("s")
        .agg(F.sort_array(F.collect_set("t")).alias("ts"))
        .select("ts", F.posexplode("ts").alias("i", "b"))
        .select("b", "i", F.posexplode("ts").alias("j", "c"))
        .filter(F.col("j") > F.col("i"))
        .select("b", "c")
    )
    tri = wedges.join(
        edges, (F.col("b") == F.col("u")) & (F.col("c") == F.col("v"))
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    summary = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.expr("sum(deg * (deg - 1) div 2)").alias("n_wedges"),
        )
        .crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri)
    )
    return summary.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            3.0 * F.col("n_triangles") / F.nullif(F.col("n_wedges"), F.lit(0)), 6
        ).alias("global_clustering"),
    )


def _pr_iter_sql(prev: str, cur: str) -> str:
    """One unrolled PageRank round in exact scaled-integer arithmetic."""
    return f"""
    {cur} AS (
      SELECT d.node, d.deg,
             CAST(15 * {_PR_SCALE} // (100 * (SELECT COUNT(*) FROM deg))
                  + (85 * COALESCE(s.contrib, 0)) // 100 AS BIGINT) AS r
      FROM deg d
      LEFT JOIN (
        SELECT e.dst AS node, SUM(p.r // p.deg) AS contrib
        FROM dir e JOIN {prev} p ON p.node = e.src
        GROUP BY e.dst
      ) s ON s.node = d.node
    )"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH {_EDGES_SQL},
    dir AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v AS src, u AS dst FROM edges
    ),
    it0 AS (
      SELECT node, deg,
             CAST({_PR_SCALE} // (SELECT COUNT(*) FROM deg) AS BIGINT) AS r
      FROM deg
    ),
    {_pr_iter_sql("it0", "it1")},
    {_pr_iter_sql("it1", "it2")},
    {_pr_iter_sql("it2", "it3")},
    {_pr_iter_sql("it3", "it4")},
    {_pr_iter_sql("it4", "it5")}
    SELECT node AS part_id, deg AS degree, r AS rank_scaled
    FROM it5
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five damped PageRank iterations (d = 0.85) over the undirected
    co-purchase graph, returning every node's rank as a scaled BIGINT
    (rank × 10^15).

    Exactness by design: rank mass is an integer, per-edge contribution
    is truncating integer division by out-degree, and the damping mix
    is (85·Σ) div 100 — the identical expression tree the oracle
    unrolls — so five rounds of join-aggregate are bit-equal across
    engines rather than "close enough to round". Every node sits in the
    edge list by construction (degree ≥ 1), so there is no dangling
    mass to redistribute.

    Shape per round: broadcast-or-shuffle join ranks⋈edges on src
    (Spark picks broadcast while ranks fit, the right call at any n
    since ranks ≪ edges), then one partial-aggregated shuffle on dst.
    The driver loop is plan construction only — no actions, no
    collect: a single job executes all five unrolled rounds, with
    ReuseExchange deduping the repeated edge/degree subtrees at
    runtime (measured: 20 ReusedExchange nodes, 0.24 s warm at sf0.1;
    a localCheckpoint-per-round variant was 9× slower from per-job
    scheduling overhead — see _copurchase_edges docstring)."""
    edges = _copurchase_edges(spark, sf_dir)
    dir_edges = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = (
        dir_edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        "node", "deg", F.expr(f"CAST({_PR_SCALE} div n AS BIGINT)").alias("r")
    )
    base = F.expr(f"CAST(15 * {_PR_SCALE} div (100 * n) AS BIGINT)")
    for _ in range(5):
        contrib = (
            ranks.join(dir_edges, ranks.node == dir_edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.expr("sum(r div deg)").alias("contrib"))
        )
        ranks = (
            deg.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                "deg",
                (base + F.expr("CAST((85 * coalesce(contrib, 0)) div 100 AS BIGINT)")).alias("r"),
            )
        )
    return ranks.select(
        F.col("node").alias("part_id"),
        F.col("deg").alias("degree"),
        F.col("r").alias("rank_scaled"),
    )


_BFS_ROUNDS = 4
_INF = 999


def _bfs_round_sql(prev: str, cur: str) -> str:
    """One unrolled BFS relaxation in sentinel-integer arithmetic."""
    return f"""
    {cur} AS (
      SELECT d.node,
             LEAST(p.dist, COALESCE(m.nbr_min + 1, {_INF})) AS dist
      FROM deg d
      JOIN {prev} p ON p.node = d.node
      LEFT JOIN (
        SELECT e.dst AS node, MIN(q.dist) AS nbr_min
        FROM dir e JOIN {prev} q ON q.node = e.src AND q.dist < {_INF}
        GROUP BY e.dst
      ) m ON m.node = d.node
    )"""


@query(
    "graph_bfs_hops",
    oracle=f"""
    WITH {_EDGES_SQL},
    dir AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v AS src, u AS dst FROM edges
    ),
    seeds AS (
      SELECT node FROM deg ORDER BY deg DESC, node LIMIT 10
    ),
    d0 AS (
      SELECT d.node,
             CASE WHEN s.node IS NOT NULL THEN 0 ELSE {_INF} END AS dist
      FROM deg d LEFT JOIN seeds s ON s.node = d.node
    ),
    {_bfs_round_sql("d0", "d1")},
    {_bfs_round_sql("d1", "d2")},
    {_bfs_round_sql("d2", "d3")},
    {_bfs_round_sql("d3", "d4")}
    SELECT CAST(dist AS BIGINT) AS hops, COUNT(*) AS n_parts,
           CAST(MIN(node) AS BIGINT) AS min_part,
           CAST(MAX(node) AS BIGINT) AS max_part
    FROM d4 WHERE dist < {_INF} GROUP BY dist
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the co-purchase graph: hop distance from
    the 10 highest-degree parts (the "hub reachability" question), four
    relaxation rounds, reported as nodes-per-hop-level with id extremes.

    Pure integer relaxation with a sentinel (999 = unreached) instead
    of NULL-propagating mins — LEAST/MIN over exact BIGINTs, so four
    unrolled rounds are bit-equal across engines. Each round is the
    BSP/Pregel step expressed relationally: frontier⋈edges on src
    (only settled nodes q.dist < INF join — the frontier filter), one
    partial-agg MIN shuffle on dst, and a LEAST merge with the previous
    state. The driver loop only builds the plan; runtime exchange reuse
    dedupes the repeated edge subtrees exactly as in graph_pagerank.
    Hop-level aggregation (not per-node rows) keeps the answer
    calendar-sized; the per-node frame is the intermediate.

    Lineage note — the OPPOSITE call from graph_pagerank, measured both
    ways: each BFS round references the previous distance frame TWICE
    (frontier join + merge), so the unrolled tree DOUBLES per round
    (2^rounds copies; 5.8 s at sf0.1) and, unlike PageRank's linear
    tree, cannot be saved by same-job exchange reuse alone. A lazy
    localCheckpoint on the edge list and on each round's distances
    caps the tree at one round (2.6 s measured). Rule of thumb
    recorded: linear self-reference → lean on ReuseExchange;
    multiplicative self-reference → cut lineage per round."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    dir_edges = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = dir_edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    seeds = deg.orderBy(F.desc("deg"), F.asc("node")).limit(10).select("node")
    dist = deg.join(
        seeds.withColumnRenamed("node", "seed"),
        F.col("node") == F.col("seed"),
        "left",
    ).select(
        "node",
        F.when(F.col("seed").isNotNull(), F.lit(0))
        .otherwise(F.lit(_INF))
        .alias("dist"),
    )
    for _ in range(_BFS_ROUNDS):
        nbr = (
            dist.filter(F.col("dist") < _INF)
            .join(dir_edges, dist.node == dir_edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("dist").alias("nbr_min"))
        )
        dist = (
            dist.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("dist"), F.coalesce(F.col("nbr_min") + 1, F.lit(_INF))
                ).alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        dist.filter(F.col("dist") < _INF)
        .groupBy(F.col("dist").cast("bigint").alias("hops"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("node").cast("bigint").alias("min_part"),
            F.max("node").cast("bigint").alias("max_part"),
        )
    )


_KCORE_K = 3
_KCORE_ROUNDS = 4


def _peel_sql(prev_nodes: str, cur: str) -> str:
    """One unrolled k-core peel: drop nodes whose degree in the current
    induced subgraph is below k; the edge set follows the node set."""
    return f"""
    {cur} AS MATERIALIZED (
      SELECT d.node FROM (
        SELECT node, COUNT(*) AS deg FROM (
          SELECT e.u AS node FROM edges e
          JOIN {prev_nodes} a ON a.node = e.u
          JOIN {prev_nodes} b ON b.node = e.v
          UNION ALL
          SELECT e.v AS node FROM edges e
          JOIN {prev_nodes} a ON a.node = e.u
          JOIN {prev_nodes} b ON b.node = e.v
        ) GROUP BY node
      ) d WHERE d.deg >= {_KCORE_K}
    )"""


@query(
    "graph_kcore_peel",
    oracle=f"""
    WITH {_EDGES_SQL},
    n0 AS (SELECT node FROM deg),
    {_peel_sql("n0", "n1")},
    {_peel_sql("n1", "n2")},
    {_peel_sql("n2", "n3")},
    {_peel_sql("n3", "n4")}
    SELECT * FROM (
      SELECT 0 AS round, COUNT(*) AS n_nodes FROM n0
      UNION ALL SELECT 1, COUNT(*) FROM n1
      UNION ALL SELECT 2, COUNT(*) FROM n2
      UNION ALL SELECT 3, COUNT(*) FROM n3
      UNION ALL SELECT 4, COUNT(*) FROM n4
    )
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four rounds of {_KCORE_K}-core peeling over the co-purchase
    graph: repeatedly drop nodes whose degree in the surviving induced
    subgraph is below {_KCORE_K}, reporting the shrinking node count
    per round — the dense-core extraction that separates structurally
    connected products from incidental co-occurrences (and, on
    documents, dense duplicate cores from stragglers).

    Each round is two semi-join filters of the edge list against the
    surviving node set, a degree partial-agg, and a threshold filter —
    all exact integers. The surviving-node frame shrinks monotonically,
    and each round takes a lazy lineage cut (the BFS rule: a round
    references its predecessor on BOTH edge endpoints, so unrolled
    lineage would grow multiplicatively). Four fixed rounds make the
    result deterministic and SQL-mirrorable; full convergence is the
    same loop with a count-stability check (the CC kernel's escape
    hatch), noted rather than hashed."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    counts = [("0", nodes)]
    cur = nodes
    for rnd in range(1, _KCORE_ROUNDS + 1):
        kept_edges = edges.join(
            cur.withColumnRenamed("node", "u"), "u", "leftsemi"
        ).join(cur.withColumnRenamed("node", "v"), "v", "leftsemi")
        deg = (
            kept_edges.select(F.col("u").alias("node"))
            .unionAll(kept_edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        cur = (
            deg.filter(F.col("deg") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=False)
        )
        counts.append((str(rnd), cur))
    out = None
    for rnd, frame in counts:
        row = frame.agg(F.count(F.lit(1)).alias("n_nodes")).select(
            F.lit(int(rnd)).alias("round"), "n_nodes"
        )
        out = row if out is None else out.unionAll(row)
    return out
