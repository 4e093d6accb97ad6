"""Round-7 batch 14 — spatial density clustering, binary embeddings,
the paired nonparametric test, and lexical more-like-this:

- ``spatial_hotspot_clusters``: grid-density hotspot detection — the
  DBSCAN-shaped primitive expressed relationally: dense cells (count
  above 1.25× the uniform expectation) merged into clusters via
  8-neighbor connected components (the repo's pointer-jump kernel,
  replayed by a recursive-CTE oracle).
- ``embedding_binary_hamming``: sign-quantized binary embeddings
  (64 dims → two 32-bit words) with exact Hamming top-5 per probe —
  the 64×-compression retrieval tier used when float vectors are too
  big to shuffle.
- ``stats_wilcoxon_signed_rank``: the paired nonparametric test
  (day-d revenue vs day-d+14) with midranks over the |diff|
  histogram, tie-corrected normal approximation — the paired
  complement to the rank-sum test.
- ``sim_more_like_this``: lexical document similarity — TF-IDF cosine
  top-5 per probe document through the inverted index with a
  document-frequency cap, the "more like this" query every search
  stack ships.

Determinism: cell counts and Hamming distances are exact integers;
hotspot labels are component minima under converged min-label
propagation (order-free); signed ranks are exact 2×midrank integers
with one mirrored float z; MLT weights round at 6 dp, products at
12 dp into decimal sums, with one mirrored normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.components import (
    pointer_jump_components,
)
from python_etl_sample_spark.functions.determinism import DEC, dsum_sql
from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.operators.spatial import _CX, _CY
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_VCENTS = "CAST(round(value * 100) AS BIGINT)"
_DEC38 = "decimal(38,0)"

# ---------------------------------------------------------------------------
# spatial_hotspot_clusters
# ---------------------------------------------------------------------------

def _hotspot_fwd_edges(dense: DataFrame) -> DataFrame:
    """Forward 8-neighbor adjacency over the dense-cell frame as an
    EQUI-join: explode each dense cell to its four forward-offset
    neighbor keys — (0,+1), (+1,-1), (+1,0), (+1,+1), exactly the
    neighbors with a LARGER cell id, since cell = cx·100000 + cy
    orders lexicographically on (cx, cy) and cy + 1 < 100000 at any
    achievable grid size (g ≈ √(n/4) stays far below 10⁵ even at
    sf 100000) — then hash-join the keys back against the dense-cell
    set.  Produces the identical edge set as the symmetric
    |Δcx| ≤ 1 ∧ |Δcy| ≤ 1 ∧ src < dst predicate, but plans as a
    shuffled/broadcast HASH join on the key: O(d) work instead of the
    O(d²) BroadcastNestedLoopJoin a theta join costs when the
    dense-cell count d grows with the corpus (the same
    replicate-into-neighbor-cells shape as ``spatial_knn_grid``,
    round6f_ops.py)."""
    # guard the cy-wraparound edge of the packed key (ADVICE r8): at
    # cy = 0 the (+1,-1) offset would wrap to (cx, 99999) and at
    # cy = 99999 the +1 offsets would wrap to (cx+1, 0)/(cx+2, 0) —
    # unreachable at any achievable grid size, but gated here so a
    # future caller with a larger grid can never match a spurious key
    cy = F.col("cell") % 100000
    nbr = dense.select(
        F.col("cell").alias("src"),
        F.explode(
            F.array_compact(
                F.array(
                    F.when(cy < 99999, F.col("cell") + 1),  # (0, +1)
                    F.when(cy > 0, F.col("cell") + 100000 - 1),  # (+1, -1)
                    (F.col("cell") + 100000).cast("bigint"),  # (+1, 0)
                    F.when(cy < 99999, F.col("cell") + 100000 + 1),  # (+1,+1)
                )
            )
        ).alias("dst"),
    )
    return nbr.join(dense.select(F.col("cell").alias("dst")), "dst").select(
        "src", "dst"
    )


#: tile side for the block-local CC solve — a tile holds ≤ _TILE² =
#: 65 536 cells (≤ ~1.6 MB of union-find state per Arrow group), and
#: the tile key (cx div S)·4096 + (cy div S) is collision-free up to
#: g < 4096·_TILE ≈ 10⁶ grid rows (≈ sf 2.6·10⁷ — far past 100 TB)
_TILE = 256


def _hotspot_components(dense: DataFrame, fwd: DataFrame) -> DataFrame:
    """(cell, cluster) labels for the dense-cell adjacency graph —
    cluster = the component's minimum cell id, computed with the
    two-level decomposition production systems use for grid/DBSCAN
    merges at scale (the same philosophy as
    ``graph_connected_components``, graph.py): solve each size-bounded
    spatial TILE locally with an O(n α(n)) union-find inside one Arrow
    ``applyInPandas`` group, then run the iterative pointer-jump
    kernel only on the CONTRACTED tile-boundary graph (one node per
    tile-local sub-component touching a cross-tile edge).

    Why not the kernel over the raw cell graph: hotspot components are
    snake-shaped (the sf0.1 grid has a 1079-cell component of diameter
    ≈ 60 whose scrambled cell ids defeat the min-id shortcut — see
    functions/components.py), so the flat kernel needs ~62 rounds of
    Spark jobs. Tiling solves everything inside a tile in ONE stage;
    the residue graph is perimeter-sized (≤ 4·_TILE nodes per tile vs
    _TILE² cells) and its diameter is measured in TILE units, so the
    kernel's rounds drop by ~_TILE× on the same worst case. At the
    test scale factors the grid fits one tile and the kernel is
    skipped outright.

    Correctness does not depend on tile placement: local labels are
    minima of tile-local sub-components, the contracted closure merges
    them across boundary edges, and min(local minima over a component)
    = the component's global minimum — the exact labels the oracle's
    recursive CTE produces."""
    import pandas as pd

    def tile(col: str):  # exact integer arithmetic end to end
        return F.expr(
            f"(({col} div 100000) div {_TILE}) * 4096"
            f" + (({col} % 100000) div {_TILE})"
        )

    e = fwd.select(
        "src", "dst", tile("src").alias("t_src"), tile("dst").alias("t_dst")
    )

    def tile_uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["src"], pdf["dst"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        keys = list(parent)
        return pd.DataFrame(
            {"node": keys, "lab": [find(k) for k in keys]}
        )

    intra = e.filter(F.col("t_src") == F.col("t_dst"))
    loc = intra.groupBy("t_src").applyInPandas(
        tile_uf, schema="node bigint, lab bigint"
    )
    cell2loc = (
        dense.select("cell")
        .join(loc.withColumnRenamed("node", "cell"), "cell", "left")
        .select("cell", F.coalesce(F.col("lab"), F.col("cell")).alias("loc"))
        .localCheckpoint(eager=True)
    )
    cross = e.filter(F.col("t_src") != F.col("t_dst"))
    bedges = (
        cross.join(
            cell2loc.select(
                F.col("cell").alias("src"), F.col("loc").alias("lsrc")
            ),
            "src",
        )
        .join(
            cell2loc.select(
                F.col("cell").alias("dst"), F.col("loc").alias("ldst")
            ),
            "dst",
        )
        .filter(F.col("lsrc") != F.col("ldst"))
        .select(F.col("lsrc").alias("src"), F.col("ldst").alias("dst"))
    )
    n_cross = bedges.count()  # perimeter-bounded, one action
    if n_cross:
        glab = pointer_jump_components(bedges, n_bound=2 * n_cross)
        final = (
            cell2loc.join(
                glab.withColumnRenamed("node", "loc"), "loc", "left"
            )
            .select(
                "cell",
                F.coalesce(F.col("lab"), F.col("loc")).alias("cluster"),
            )
        )
    else:
        final = cell2loc.select(
            "cell", F.col("loc").alias("cluster")
        )
    return final


@query(
    "spatial_hotspot_clusters",
    oracle=f"""
    WITH RECURSIVE
    n_t AS (SELECT COUNT(*) AS n FROM customer),
    g_t AS (SELECT n, GREATEST(2, CAST(floor(sqrt(n / 4.0)) AS BIGINT))
                     AS g
            FROM n_t),
    pts AS (
      SELECT ({_CX.format(k="c_custkey")}) * g // 10000 AS cx,
             ({_CY.format(k="c_custkey")}) * g // 10000 AS cy,
             n, g
      FROM customer CROSS JOIN g_t
    ),
    cells AS (SELECT cx, cy, COUNT(*) AS cnt, MAX(n) AS n, MAX(g) AS g
              FROM pts GROUP BY cx, cy),
    dense AS (
      SELECT cx * 100000 + cy AS cell, cx, cy, cnt
      FROM cells
      WHERE 4 * g * g * cnt > 5 * n AND cnt >= 2
    ),
    fwd AS (
      SELECT a.cell AS src, b.cell AS dst
      FROM dense a JOIN dense b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND a.cell < b.cell
    ),
    edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
    reach(node, lab) AS (
      SELECT cell, cell FROM dense
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node AS cell, MIN(lab) AS cluster FROM reach GROUP BY node)
    SELECT c.cluster AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(d.cnt) AS BIGINT) AS n_points,
           CAST(MAX(d.cnt) AS BIGINT) AS peak_cell_count
    FROM comp c JOIN dense d ON d.cell = c.cell
    GROUP BY c.cluster
    """,
)
def spatial_hotspot_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot detection: bucket customers onto an ADAPTIVE
    g×g density grid (g = ⌊√(n/4)⌋, so expected cell fill stays ≈4 at
    every data size — a fixed grid under-resolves small maps and
    washes out at scale), keep cells whose count exceeds 1.25× the
    uniform expectation with a two-point floor (exact integers:
    4·g²·cnt > 5·n AND cnt ≥ 2), and merge dense cells touching in
    the 8-neighborhood into clusters via connected components. The
    DBSCAN shape — density gate + neighborhood merge — expressed as
    equi-joins and the pointer-jump CC kernel instead of all-pairs
    distance scans; the report gives each hotspot's extent, mass, and
    peak-cell density.

    Scale: one groupBy collapses points to the cell grid (the only
    data-sized shuffle; the g² grid has ~n/4 cells, each a 16-byte
    row); the dense-cell adjacency is an explode-4-forward-offsets +
    EQUI-join on the neighbor cell key (``_hotspot_fwd_edges`` — O(d)
    hash-join work in the dense-cell count d, never the O(d²) nested
    loop a theta join would plan); components come from the two-level
    tile decomposition in ``_hotspot_components`` — size-bounded
    per-tile union-find in one Arrow stage, then the shared
    pointer-jump kernel (functions/components.py) on the contracted
    perimeter graph only — replayed exactly by the oracle's recursive
    closure.

    Determinism: g = max(2, ⌊√(n/4)⌋) derives from the exact count
    through one IEEE sqrt (identical on both engines); cell indices
    x·g // 10000 and the density gate are exact integers; cluster ids
    are component MINIMA (order-free); the kernel converges fully so
    labels equal the transitive closure."""
    c = table(spark, sf_dir, "customer")
    n_t = c.agg(F.count(F.lit(1)).alias("n"))
    g_t = n_t.select(
        "n",
        F.greatest(
            F.lit(2).cast("bigint"),
            F.floor(F.sqrt(F.col("n") / 4.0)).cast("bigint"),
        ).alias("g"),
    )
    pts = c.crossJoin(F.broadcast(g_t)).select(
        ((F.expr(_CX.format(k="c_custkey"))) * F.col("g") / 10000)
        .cast("bigint")
        .alias("cx"),
        ((F.expr(_CY.format(k="c_custkey"))) * F.col("g") / 10000)
        .cast("bigint")
        .alias("cy"),
        "n",
        "g",
    )
    cells = pts.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("n").alias("n"),
        F.max("g").alias("g"),
    )
    dense = cells.filter(
        (4 * F.col("g") * F.col("g") * F.col("cnt") > 5 * F.col("n"))
        & (F.col("cnt") >= 2)
    ).select(
        (F.col("cx") * 100000 + F.col("cy")).alias("cell"),
        "cx",
        "cy",
        "cnt",
    ).persist()
    # persist (r14): dense feeds both sides of the neighbor equi-join,
    # the component solve and the final rollup join — without a
    # barrier the customer scan + grid groupBy re-evaluates ~4x
    fwd = _hotspot_fwd_edges(dense)
    comp = dense.join(_hotspot_components(dense, fwd), "cell").select(
        "cell", "cnt", "cluster"
    )
    return comp.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("cnt").cast("long").alias("n_points"),
        F.max("cnt").cast("long").alias("peak_cell_count"),
    )


# ---------------------------------------------------------------------------
# embedding_binary_hamming
# ---------------------------------------------------------------------------

_BH_PROBES = 10
_BH_TOPK = 5


def _sig_sql(alias: str, lo: int, hi: int) -> str:
    """SQL for the sign-bit word over dims [lo, hi) of an embedding."""
    return (
        f"(SELECT SUM(CASE WHEN {alias}.embedding[i + 1] > 0"
        f" THEN (1::BIGINT << (i - {lo})) ELSE 0 END)"
        f" FROM range({lo}, {hi}) t(i))"
    )


@query(
    "embedding_binary_hamming",
    oracle=f"""
    WITH sig AS (
      SELECT v.vec_id,
             COALESCE({_sig_sql('v', 0, 32)}, 0) AS w1,
             COALESCE({_sig_sql('v', 32, 64)}, 0) AS w2
      FROM embeddings v
    ),
    probes AS (SELECT * FROM sig ORDER BY vec_id LIMIT {_BH_PROBES}),
    cand AS (
      SELECT p.vec_id AS probe_id, s.vec_id AS neighbor_id,
             bit_count(xor(p.w1, s.w1))
             + bit_count(xor(p.w2, s.w2)) AS hamming
      FROM probes p JOIN sig s ON s.vec_id <> p.vec_id
    )
    SELECT probe_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                       ORDER BY hamming, neighbor_id) AS rn
          FROM cand)
    WHERE rn <= {_BH_TOPK}
    """,
)
def embedding_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-embedding retrieval: sign-quantize each 64-dim embedding
    into two 32-bit sign words (bit i set iff dim i > 0 — 64×
    compression of the float vector), then exact Hamming-distance
    top-5 neighbors for the first 10 probe vectors. The
    coarse-quantization tier real vector stacks deploy when float
    vectors are too large to move: Hamming on sign bits approximates
    angular distance (Charikar's hyperplane bound), costs two XOR +
    popcounts per comparison, and shuffles 16 bytes per vector
    instead of 512.

    Scale: signature construction is map-only (an integer fold over
    the vector); the probe side is a constant 10-row broadcast, so
    the scan streams once with no pairwise blow-up beyond probes ×
    corpus — and at 100 TB the signatures themselves become the
    compact index the ANN tiers bucket on.

    Determinism: signatures and Hamming distances are exact integers;
    ties rank by neighbor id."""
    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    def word(lo: int, hi: int):
        return F.aggregate(
            F.sequence(F.lit(lo), F.lit(hi - 1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at(F.col("emb"), (i + 1).cast("int")) > 0,
                # 2^(i-lo) ≤ 2^31 is exact in double -> exact long
                F.pow(F.lit(2.0), i - lo).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    sig = v.select(
        "vec_id", word(0, 32).alias("w1"), word(32, 64).alias("w2")
    )
    probes = sig.orderBy("vec_id").limit(_BH_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("w1").alias("p1"),
        F.col("w2").alias("p2"),
    )
    cand = sig.crossJoin(F.broadcast(probes)).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    hamming = F.bit_count(
        F.col("p1").bitwiseXOR(F.col("w1"))
    ) + F.bit_count(F.col("p2").bitwiseXOR(F.col("w2")))
    w = Window.partitionBy("probe_id").orderBy("hamming", "neighbor_id")
    return (
        cand.select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            hamming.cast("long").alias("hamming"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _BH_TOPK)
    )


# ---------------------------------------------------------------------------
# stats_wilcoxon_signed_rank
# ---------------------------------------------------------------------------

_WX_LAG = 14


@query(
    "stats_wilcoxon_signed_rank",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, SUM({_VCENTS}) AS v
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT b.v - a.v AS d
      FROM daily a
      JOIN daily b ON b.day = a.day + CAST('{_WX_LAG} days' AS INTERVAL)
      WHERE b.v <> a.v
    ),
    h AS (SELECT ABS(d) AS ad, COUNT(*) AS cnt,
                 SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS npos
          FROM pairs GROUP BY ABS(d)),
    r AS (
      SELECT ad, cnt, npos,
             SUM(cnt) OVER (ORDER BY ad
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM h
    ),
    agg AS (
      SELECT SUM(CAST(npos AS DECIMAL(38,0)) * (2 * cum - cnt + 1))
               AS w2pos,
             SUM(CAST(cnt AS DECIMAL(38,0))) AS n,
             SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS tsum
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(CAST(w2pos AS DOUBLE) / 2.0, 6) AS w_plus,
           round(CAST(n * (n + 1) AS DOUBLE) / 2.0
                 - CAST(w2pos AS DOUBLE) / 2.0, 6) AS w_minus,
           CASE WHEN n >= 2 AND
                     (CAST(n * (n + 1) AS DOUBLE) * (2 * CAST(n AS DOUBLE) + 1)
                      - CAST(tsum AS DOUBLE) / 2.0) > 0
                THEN round((CAST(w2pos AS DOUBLE) / 2.0
                            - CAST(n * (n + 1) AS DOUBLE) / 4.0)
                           / sqrt((CAST(n * (n + 1) AS DOUBLE)
                                   * (2 * CAST(n AS DOUBLE) + 1)
                                   - CAST(tsum AS DOUBLE) / 2.0) / 24.0),
                           6)
                END AS z_score
    FROM agg
    """,
)
def stats_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wilcoxon signed-rank test for a paired location shift: each
    day's revenue pairs with the revenue 14 days later (calendar
    alignment — a missing partner day drops the pair), zero diffs are
    discarded (the standard treatment), |diffs| take midranks over
    their histogram, and W⁺ sums the ranks of positive diffs. The
    tie-corrected normal approximation
    z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48) is the
    two-week-shift significance readout — the PAIRED complement to
    the two-sample rank-sum test (stats_rank_sum_u), with pairing
    removing the day-of-week variance both days share.

    Scale: the daily rollup is the only data-sized shuffle; the lag
    join, |diff| histogram, and midrank cumulative all run on the
    calendar-bounded daily frame via the total-order kernel.

    Determinism: diffs are exact integer cents; 2×midranks
    (2·cum − cnt + 1) are exact integers so W⁺ halves once; the z
    combines exact decimal sums with mirrored parenthesization,
    rounded at 6 dp; a degenerate all-tied frame yields NULL."""
    ev = table(spark, sf_dir, "events")
    # persist (r14): both sides of the lag self-join read this
    # calendar-bounded frame — one events scan + groupBy, not two
    daily = ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day")).agg(
        F.sum(F.expr(_VCENTS)).alias("v")
    ).persist()
    a = daily.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = daily.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    pairs = a.join(
        b, F.col("db") == F.date_add(F.col("da"), _WX_LAG)
    ).filter(F.col("vb") != F.col("va")).select(
        (F.col("vb") - F.col("va")).alias("d")
    )
    h = pairs.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("npos"),
    )
    r = attach_global_order(h, [F.asc("ad")], cumsums=[("cnt", "cum")])
    avg2 = 2 * F.col("cum") - F.col("cnt") + 1
    cd = F.col("cnt").cast(_DEC38)
    agg = r.agg(
        F.sum(F.col("npos").cast(_DEC38) * avg2).alias("w2pos"),
        F.sum(cd).alias("n"),
        F.sum(cd * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "tsum"
        ),
    )
    n = F.col("n")
    nd = n.cast("double")
    w2 = F.col("w2pos").cast("double")
    var_num = (n * (n + 1)).cast("double") * (2 * nd + 1) - F.col(
        "tsum"
    ).cast("double") / 2.0
    z = (w2 / 2.0 - (n * (n + 1)).cast("double") / 4.0) / F.sqrt(
        var_num / 24.0
    )
    return agg.select(
        n.cast("long").alias("n_pairs"),
        F.round(w2 / 2.0, 6).alias("w_plus"),
        F.round(
            (n * (n + 1)).cast("double") / 2.0 - w2 / 2.0, 6
        ).alias("w_minus"),
        F.when((n >= 2) & (var_num > 0), F.round(z, 6)).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# sim_more_like_this
# ---------------------------------------------------------------------------

_MLT_PROBES = 5
_MLT_TOPK = 5
_MLT_DF_CAP = 100


@query(
    "sim_more_like_this",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM documents,
           unnest(string_split_regex(lower(text), '\s+')) AS t(token)
      WHERE t.token <> ''
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    wt AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln((nd.n + 1.0) / (df.df + 1.0)), 6) AS w
      FROM tf JOIN df ON df.token = tf.token CROSS JOIN nd
      WHERE df.df <= {_MLT_DF_CAP}
    ),
    nrm AS (
      SELECT doc_id,
             sqrt(CAST(SUM(CAST(round(w * w, 12) AS DECIMAL(28,14)))
                       AS DOUBLE)) AS nrm
      FROM wt GROUP BY doc_id
    ),
    probes AS (SELECT DISTINCT doc_id FROM wt
               ORDER BY doc_id LIMIT {_MLT_PROBES}),
    dots AS (
      SELECT p.doc_id AS probe_id, c.doc_id AS neighbor_id,
             {dsum_sql('round(p.w * c.w, 12)')} AS dot
      FROM wt p
      JOIN probes pr ON pr.doc_id = p.doc_id
      JOIN wt c ON c.token = p.token AND c.doc_id <> p.doc_id
      GROUP BY p.doc_id, c.doc_id
    ),
    sims AS (
      SELECT d.probe_id, d.neighbor_id,
             round(d.dot / (np.nrm * nc.nrm), 9) AS sim
      FROM dots d
      JOIN nrm np ON np.doc_id = d.probe_id
      JOIN nrm nc ON nc.doc_id = d.neighbor_id
    )
    SELECT probe_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM sims)
    WHERE rn <= {_MLT_TOPK}
    """,
)
def sim_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical 'more like this': TF-IDF cosine top-5 similar documents
    for the five lowest-id probe documents, computed through the
    inverted index — probe and candidate meet ONLY on shared terms, so
    the pair space is driven by vocabulary overlap, never all-pairs.
    The df ≤ 100 cap drops ubiquitous terms from the match (the
    standard Lucene MoreLikeThis guard): at scale the cap is what
    keeps the hottest posting lists out of the join entirely.

    Scale: tf/df are the shared one-shuffle text statistics; the
    similarity join shuffles on the TERM key (posting-list join) with
    the cap bounding every posting list; per-probe top-5 ranks ≤ the
    probe's candidate set. The embedding-space siblings
    (sim_cosine_topk / sim_ann_*) cover the dense path; this is the
    sparse one.

    Determinism: tf/df/n are exact integers; weights are one ln of an
    exact ratio rounded at 6 dp; dot products and norms accumulate
    12-dp-rounded products in decimals; the similarity is one mirrored
    normalization rounded at 9 dp, ties on neighbor id."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    # persist tf and wt (r14): tf feeds df/nd/wt and wt feeds
    # norms/probes/both dot sides — without barriers the tokenize +
    # groupBy pipeline re-evaluates ~7x (r14 plan audit: 29 exchanges)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")).persist()
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").alias("n"))
    wt = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") <= _MLT_DF_CAP)
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("w"),
        )
        .persist()
    )
    nrm = wt.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("w") * F.col("w"), 12).cast("decimal(28,14)")
            ).cast("double")
        ).alias("nrm")
    )
    probes = (
        wt.select("doc_id").distinct().orderBy("doc_id").limit(_MLT_PROBES)
    )
    p = wt.join(probes, "doc_id").select(
        F.col("doc_id").alias("probe_id"),
        "token",
        F.col("w").alias("pw"),
    )
    dots = (
        p.join(wt, "token")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", F.col("doc_id").alias("neighbor_id"))
        .agg(
            F.sum(
                F.round(F.col("pw") * F.col("w"), 12).cast(DEC)
            )
            .cast("double")
            .alias("dot")
        )
    )
    sims = (
        dots.join(
            nrm.select(
                F.col("doc_id").alias("probe_id"),
                F.col("nrm").alias("np"),
            ),
            "probe_id",
        )
        .join(
            nrm.select(
                F.col("doc_id").alias("neighbor_id"),
                F.col("nrm").alias("nc"),
            ),
            "neighbor_id",
        )
        .select(
            "probe_id",
            "neighbor_id",
            F.round(F.col("dot") / (F.col("np") * F.col("nc")), 9).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _MLT_TOPK)
    )
