"""Round-8 batch 1 — the mergeable quantile sketch and the semantic-
dedup recall report (VERDICT r7 items 4 and 5):

- ``sketch_kll_quantiles``: a KLL-class mergeable quantile sketch over
  order values, with the random compaction coin replaced by a
  hash-of-key bit so the sketch is a pure function of the SET —
  order-free, exactly mergeable, and replayable by the DuckDB oracle.
  Reports p50/p95/p99 estimates against the exact total-order answers.
- ``sketch_kll_merge``: the mergeability demonstration — per-priority
  sketches built at their own (coarser) levels, merged by recompacting
  the union to the global level, with per-scope estimate vs exact
  medians. Hash-driven compaction makes merge LOSSLESS with respect to
  the direct sketch of the union: recompacting to level L keeps
  exactly the keys with hash ≡ 0 (mod 2^L), the same set direct
  sketching keeps — the property random-coin KLL only has in
  distribution, this sketch has by identity.
- ``dedup_semantic_recall``: measures the cluster-pruned semantic
  dedup's recall against the exact cosine pair set per similarity
  band — turning round7b_ops' docstring honesty ("a cross-cluster
  near-dup pair is invisible here") into a hash-checked number.

KLL framing, stated precisely: a KLL sketch compacted to completion
keeps the items that survived every level-0..L-1 compaction; with the
compaction coin replaced by "keep iff bit k of hash(key) is 0", the
survivor set is {key : hash(key) ≡ 0 mod 2^L} with uniform weight 2^L
— the fully-compacted sketch IS deterministic hash-sampling, which is
what makes it oracle-replayable and exactly mergeable. Error is the
subsample rank error O(1/√(n/2^L)); the level rule n ≤ B·2^L bounds
the kept set near the budget B. The hash is the repo's audited
full-entropy mix ((key % 3221225473) · 2654435761 — overflow-scanned
by tests/test_ansi_edges.py); its low L bits equal the low L bits of
key % 3221225473 times an odd constant, a bijection on Z/2^L, so the
keep predicate is uniform across key residues.

Determinism: levels, keep predicates, ranks, and target ranks are
exact integer arithmetic ((n·qn + 99) div 100 — never float ceil);
estimates and exact answers are cents at selected ranks of the
(cents, key) total order; recall bands compare 9-dp-rounded cosines
against constant literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.operators.round7_ops import _km_ctes, _km_fit
from python_etl_sample_spark.operators.similarity import (
    _DEDUP_COS_ORACLE,
    dedup_embedding_cosine,
)
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_OCENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
#: sketch budget (kept-item target) for the global sketch
_KLL_B = 2048
#: per-scope budget for the merge demonstration (coarser on purpose —
#: it forces distinct per-group levels and a real recompaction)
_KLL_MB = 512
#: audited full-entropy key mix (see tests/test_ansi_edges.py)
_KLL_HASH = "((o_orderkey % 3221225473) * 2654435761)"
_KLL_QS = (50, 95, 99)


# ---------------------------------------------------------------------------
# sketch_kll_quantiles
# ---------------------------------------------------------------------------

@query(
    "sketch_kll_quantiles",
    oracle=f"""
    WITH n_t AS (SELECT COUNT(*) AS n FROM orders),
    lv AS (
      SELECT MIN(l) AS lev, MAX(n) AS n
      FROM range(0, 41) t(l) CROSS JOIN n_t
      WHERE n <= {_KLL_B} * ((1::BIGINT) << l)
    ),
    smp AS (
      SELECT {_OCENTS} AS cents, o_orderkey AS k
      FROM orders CROSS JOIN lv
      WHERE ({_KLL_HASH} % ((1::BIGINT) << lev)) = 0
    ),
    srank AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, k) AS rn,
             COUNT(*) OVER () AS kept
      FROM smp
    ),
    frank AS (
      SELECT {_OCENTS} AS cents,
             ROW_NUMBER() OVER (ORDER BY {_OCENTS}, o_orderkey) AS rn
      FROM orders
    ),
    q AS (SELECT UNNEST([{",".join(str(q) for q in _KLL_QS)}]) AS qn),
    t AS (
      SELECT q.qn, lv.n, lv.lev, s.kept,
             (s.kept * q.qn + 99) // 100 AS st,
             (lv.n * q.qn + 99) // 100 AS ft
      FROM q CROSS JOIN lv CROSS JOIN (SELECT MAX(kept) AS kept
                                       FROM srank) s
    )
    SELECT t.qn / 100.0 AS quantile,
           CAST(t.n AS BIGINT) AS n_rows,
           CAST(t.lev AS BIGINT) AS level,
           CAST(t.kept AS BIGINT) AS kept,
           CAST(sr.cents AS BIGINT) AS est_cents,
           CAST(fr.cents AS BIGINT) AS exact_cents
    FROM t
    JOIN srank sr ON sr.rn = t.st
    JOIN frank fr ON fr.rn = t.ft
    """,
)
def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (KLL with hash-deterministic
    compaction, fully compacted — see module docstring) over order
    value cents: pick the level L as the smallest integer with
    n ≤ {B}·2^L, keep the rows whose audited key-hash is ≡ 0 mod 2^L
    (each carrying weight 2^L), and estimate p50/p95/p99 as the kept
    values at sample ranks ⌈q·kept⌉ — reported side by side with the
    EXACT total-order answers at ranks ⌈q·n⌉ so the error is visible
    in the output row itself.

    This fills the sketch tier's quantile gap (HLL/KMV/CMS/Bloom/theta
    cover cardinality and membership): unlike percentile_approx, the
    kept set is a pure function of the data — two sketches over
    disjoint shards merge by recompacting the union to the coarser
    level and give the IDENTICAL result direct sketching gives
    (demonstrated by ``sketch_kll_merge``), which is what makes
    pre-aggregated rollups sound at 100 TB.

    Scale: the keep predicate is a map-side filter (pushdown-adjacent:
    scan → filter before any shuffle); the kept frame is ~B rows
    regardless of corpus size, so its ranking is constant work; the
    exact side is one pass of the range-partitioned total-order kernel
    — included here for the comparison, omitted in production use
    where the sketch replaces it. Everything is exact integers.
    """
    o = table(spark, sf_dir, "orders")
    n_t = o.agg(F.count(F.lit(1)).alias("n"))
    lv = (
        spark.range(0, 41)
        .withColumnRenamed("id", "l")
        .crossJoin(F.broadcast(n_t))
        .filter(F.col("n") <= _KLL_B * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(l AS INT))"))
        .agg(F.min("l").alias("lev"), F.max("n").alias("n"))
    )
    modulus = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(lev AS INT))")
    smp = (
        o.select(
            F.expr(_OCENTS).alias("cents"), F.col("o_orderkey").alias("k")
        )
        .crossJoin(F.broadcast(lv))
        .filter(
            ((F.col("k") % 3221225473) * 2654435761) % modulus == 0
        )
    )
    srank = attach_global_order(
        smp.select("cents", "k"),
        [F.asc("cents"), F.asc("k")],
        rn="rn",
        total_count="kept",
    )
    frank = attach_global_order(
        o.select(F.expr(_OCENTS).alias("cents"), "o_orderkey"),
        [F.asc("cents"), F.asc("o_orderkey")],
        rn="rn",
    )
    kept_t = srank.agg(F.max("kept").alias("kept"))
    targets = (
        spark.createDataFrame([(q,) for q in _KLL_QS], "qn int")
        .crossJoin(F.broadcast(lv))
        .crossJoin(F.broadcast(kept_t))
        .select(
            "qn",
            "n",
            "lev",
            "kept",
            F.expr("(kept * qn + 99) div 100").alias("st"),
            F.expr("(n * qn + 99) div 100").alias("ft"),
        )
    )
    return (
        srank.select(F.col("rn").alias("st"), F.col("cents").alias("est_cents"))
        .join(F.broadcast(targets), "st")
        .join(
            frank.select(
                F.col("rn").alias("ft"), F.col("cents").alias("exact_cents")
            ),
            "ft",
        )
        .select(
            (F.col("qn") / 100.0).alias("quantile"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("lev").cast("long").alias("level"),
            F.col("kept").cast("long").alias("kept"),
            F.col("est_cents").cast("long").alias("est_cents"),
            F.col("exact_cents").cast("long").alias("exact_cents"),
        )
    )


# ---------------------------------------------------------------------------
# sketch_kll_merge
# ---------------------------------------------------------------------------

def _kll_merge_scope_ctes() -> str:
    """Shared CTE body: the scoped frame (each order under its own
    priority AND under 'ALL'), per-scope levels, per-scope sketches
    built group-locally then MERGED into the ALL scope by recompaction
    (union of group sketches re-filtered to the global level)."""
    return f"""
    scoped AS (
      SELECT o_orderpriority AS scope, {_OCENTS} AS cents, o_orderkey AS k
      FROM orders
      UNION ALL
      SELECT 'ALL', {_OCENTS}, o_orderkey FROM orders
    ),
    ns AS (SELECT scope, COUNT(*) AS n FROM scoped GROUP BY scope),
    lvs AS (
      SELECT ns.scope, ns.n, MIN(t.l) AS lev
      FROM ns CROSS JOIN range(0, 41) t(l)
      WHERE ns.n <= {_KLL_MB} * ((1::BIGINT) << t.l)
      GROUP BY ns.scope, ns.n
    ),
    gsk AS (
      SELECT s.scope, s.cents, s.k
      FROM scoped s JOIN lvs ON lvs.scope = s.scope
      WHERE s.scope <> 'ALL'
        AND ({_KLL_HASH.replace("o_orderkey", "s.k")}
             % ((1::BIGINT) << lvs.lev)) = 0
    ),
    msk AS (
      SELECT 'ALL' AS scope, g.cents, g.k
      FROM gsk g JOIN lvs ON lvs.scope = 'ALL'
      WHERE ({_KLL_HASH.replace("o_orderkey", "g.k")}
             % ((1::BIGINT) << lvs.lev)) = 0
    ),
    sk AS (SELECT * FROM gsk UNION ALL SELECT * FROM msk)
    """


@query(
    "sketch_kll_merge",
    oracle=f"""
    WITH {_kll_merge_scope_ctes()},
    srank AS (
      SELECT scope, cents,
             ROW_NUMBER() OVER (PARTITION BY scope
                                ORDER BY cents, k) AS rn,
             COUNT(*) OVER (PARTITION BY scope) AS kept
      FROM sk
    ),
    frank AS (
      SELECT scope, cents,
             ROW_NUMBER() OVER (PARTITION BY scope
                                ORDER BY cents, k) AS rn
      FROM scoped
    ),
    t AS (
      SELECT l.scope, l.n, l.lev, s.kept,
             (s.kept * 50 + 99) // 100 AS st,
             (l.n * 50 + 99) // 100 AS ft
      FROM lvs l
      JOIN (SELECT scope, MAX(kept) AS kept FROM srank GROUP BY scope) s
        ON s.scope = l.scope
    )
    SELECT t.scope,
           CAST(t.n AS BIGINT) AS n_rows,
           CAST(t.lev AS BIGINT) AS level,
           CAST(t.kept AS BIGINT) AS kept,
           CAST(sr.cents AS BIGINT) AS est_p50_cents,
           CAST(fr.cents AS BIGINT) AS exact_p50_cents
    FROM t
    JOIN srank sr ON sr.scope = t.scope AND sr.rn = t.st
    JOIN frank fr ON fr.scope = t.scope AND fr.rn = t.ft
    """,
)
def sketch_kll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-rollup demonstration for the hash-compaction KLL
    sketch: build one sketch per order priority at that group's own
    level (budget {MB} — deliberately coarse so levels differ), then
    produce the global scope by MERGING the five group sketches —
    recompact their union to the global level by applying the global
    level's hash bits — and report, per scope, the sketch median
    against the exact median. The merge is lossless by identity:
    hash ≡ 0 (mod 2^L_global) implies hash ≡ 0 (mod 2^L_group), so the
    recompacted union is exactly the direct global sketch — the
    pre-aggregation property that lets a 100 TB pipeline keep
    per-partition quantile sketches and roll them up later without a
    second scan.

    Scale: group sketches are map-side filters; the merge touches only
    ~B rows per group; exact medians (for the comparison column) come
    from ONE pass of the range-partitioned total-order kernel over the
    scope-stacked frame (scope leads the sort, per-scope rank = global
    rank − scope offset — the events_rfm_segmentation stacking trick),
    never a per-scope single-task window."""
    o = table(spark, sf_dir, "orders")
    scoped = o.select(
        F.col("o_orderpriority").alias("scope"),
        F.expr(_OCENTS).alias("cents"),
        F.col("o_orderkey").alias("k"),
    ).unionAll(
        o.select(
            F.lit("ALL").alias("scope"),
            F.expr(_OCENTS).alias("cents"),
            F.col("o_orderkey").alias("k"),
        )
    # persist the scope-stacked union: it feeds the scope counts, the
    # group sketches AND the exact-rank kernel — without a barrier the
    # 2x-orders union re-evaluates once per branch (r14 plan audit:
    # 18 exchanges)
    ).persist()
    ns = scoped.groupBy("scope").agg(F.count(F.lit(1)).alias("n"))
    lvs = (
        ns.crossJoin(F.broadcast(spark.range(0, 41).withColumnRenamed("id", "l")))
        .filter(F.col("n") <= _KLL_MB * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(l AS INT))"))
        .groupBy("scope", "n")
        .agg(F.min("l").alias("lev"))
    )
    hmod = lambda name: F.expr(  # noqa: E731
        f"shiftleft(CAST(1 AS BIGINT), CAST({name} AS INT))"
    )
    hval = (F.col("k") % 3221225473) * 2654435761
    # per-group sketches at their own levels (map-side filter)
    gsk = (
        scoped.filter(F.col("scope") != "ALL")
        .join(F.broadcast(lvs.select("scope", "lev")), "scope")
        .filter(hval % hmod("lev") == 0)
        .select("scope", "cents", "k")
    )
    # merge: union of the five group sketches, recompacted to the
    # global level — NOT a direct sample of the base table; the
    # equality of the two is the property under demonstration
    all_lev = lvs.filter(F.col("scope") == "ALL").select(
        F.col("lev").alias("glev")
    )
    msk = (
        gsk.crossJoin(F.broadcast(all_lev))
        .filter(hval % hmod("glev") == 0)
        .select(F.lit("ALL").alias("scope"), "cents", "k")
    )
    sk = gsk.unionAll(msk)
    # kept frames are budget-bounded (≤ ~2·MB rows per scope by the
    # level rule), so a scope-partitioned window is safe at any corpus
    wsk = Window.partitionBy("scope").orderBy("cents", "k")
    # persist the budget-bounded sketch ranks (≤ ~2·MB rows/scope):
    # referenced by the kept totals and the est-side probe — pinning
    # stops the gsk/msk sketch cascade re-evaluating per reference
    srank = sk.select(
        "scope",
        "cents",
        F.row_number().over(wsk).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("scope")).alias("kept"),
    ).persist()
    # exact per-scope ranks: ONE total-order kernel pass over the
    # scope-stacked frame; per-scope rank = global rank − scope offset
    ranked = attach_global_order(
        scoped,
        [F.asc("scope"), F.asc("cents"), F.asc("k")],
        rn="__grn",
    )
    offs = ns.select(
        F.col("scope").alias("oscope"),
        (
            # bounded-window: the scope-count frame has ≤ 6 rows (five
            # order priorities + 'ALL' — a constant domain), so the
            # unpartitioned prefix-sum window is constant-size
            F.sum("n").over(
                Window.orderBy("scope").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("off"),
    ).fillna(0, subset=["off"])
    frank = ranked.join(
        F.broadcast(offs), ranked.scope == F.col("oscope")
    ).select("scope", "cents", (F.col("__grn") - F.col("off")).alias("rn"))
    t = lvs.join(
        srank.groupBy("scope").agg(F.max("kept").alias("kept")), "scope"
    ).select(
        "scope",
        "n",
        "lev",
        "kept",
        F.expr("(kept * 50 + 99) div 100").alias("st"),
        F.expr("(n * 50 + 99) div 100").alias("ft"),
    )
    # the t⋈srank probe result is ≤6 rows — broadcast it into the
    # exact-side join so frank is probed by a BHJ, not sort-merged
    return (
        F.broadcast(
            t.join(
                srank.select(
                    "scope",
                    F.col("rn").alias("st"),
                    F.col("cents").alias("est_p50_cents"),
                ),
                ["scope", "st"],
            )
        )
        .join(
            frank.select(
                "scope",
                F.col("rn").alias("ft"),
                F.col("cents").alias("exact_p50_cents"),
            ),
            ["scope", "ft"],
        )
        .select(
            "scope",
            F.col("n").cast("long").alias("n_rows"),
            F.col("lev").cast("long").alias("level"),
            F.col("kept").cast("long").alias("kept"),
            F.col("est_p50_cents").cast("long").alias("est_p50_cents"),
            F.col("exact_p50_cents").cast("long").alias("exact_p50_cents"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_semantic_recall
# ---------------------------------------------------------------------------

_RECALL_BANDS_SQL = """CASE
      WHEN sim < 0.50 THEN '0.45-0.50'
      WHEN sim < 0.55 THEN '0.50-0.55'
      WHEN sim < 0.60 THEN '0.55-0.60'
      ELSE '0.60+' END"""


@query(
    "dedup_semantic_recall",
    oracle=f"""
    WITH {_km_ctes()},
    exact AS (
      SELECT * FROM ({_DEDUP_COS_ORACLE}) x
    ),
    joined AS (
      SELECT e.sim,
             CASE WHEN fa.cid = fb.cid THEN 1 ELSE 0 END AS caught
      FROM exact e
      JOIN fin fa ON fa.vec_id = e.vec_a
      JOIN fin fb ON fb.vec_id = e.vec_b
    )
    SELECT {_RECALL_BANDS_SQL} AS band,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(caught) AS BIGINT) AS n_caught,
           round(SUM(caught) / CAST(COUNT(*) AS DOUBLE), 6) AS recall
    FROM joined
    GROUP BY 1
    """,
)
def dedup_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall report for the cluster-pruned semantic dedup: join the
    EXACT cosine near-dup pair set (dedup_embedding_cosine, the
    block-partitioned GEMM pass) against the k-means assignment that
    drives dedup_semantic_cluster's prune, and report, per similarity
    band, how many exact pairs land in the same cluster (caught) vs
    cross clusters (missed) — the measured number behind round7b_ops'
    docstring statement that cross-cluster pairs are invisible to the
    prune. False positives are impossible by construction (the pruned
    set is exactly {{same-cluster}} ∩ {{sim ≥ threshold}}, a subset of
    the exact set — pinned by tests/test_round8_ops.py), so recall is
    the only number that needs measuring.

    Both inputs are deterministic and individually hash-checked
    (similarity.py GEMM pairs; round7_ops' Lloyd fit), so the report
    itself carries a full oracle — a recall measurement an LSH-based
    dedup cannot give an exact oracle for.

    Scale: the pair set is the bounded output of the threshold filter
    (fixture: 7/14/144 pairs at sf0.001/0.01/0.1); the two assignment
    joins are broadcast-sized in the pair count; the expensive inputs
    (GEMM grid, Lloyd fit) are the session-memoized shared
    intermediates their own queries are benched on."""
    pairs = dedup_embedding_cosine(spark, sf_dir)
    assigned, _ = _km_fit(spark, sf_dir)
    cid = assigned.select("vec_id", "cid")
    joined = (
        pairs.join(
            cid.select(
                F.col("vec_id").alias("vec_a"), F.col("cid").alias("cid_a")
            ),
            "vec_a",
        )
        .join(
            cid.select(
                F.col("vec_id").alias("vec_b"), F.col("cid").alias("cid_b")
            ),
            "vec_b",
        )
        .select(
            "sim",
            F.when(F.col("cid_a") == F.col("cid_b"), 1)
            .otherwise(0)
            .alias("caught"),
        )
    )
    band = (
        F.when(F.col("sim") < 0.50, "0.45-0.50")
        .when(F.col("sim") < 0.55, "0.50-0.55")
        .when(F.col("sim") < 0.60, "0.55-0.60")
        .otherwise("0.60+")
    )
    return joined.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum("caught").cast("long").alias("n_caught"),
        F.round(
            F.sum("caught").cast("double") / F.count(F.lit(1)), 6
        ).alias("recall"),
    )
