"""Round-7 batch 7 — funnel timing, containment dedup, and community
quality:

- ``events_funnel_latency``: the timing profile of the signup → view →
  purchase funnel (events_funnel counts WHO converts; this measures
  HOW LONG each transition takes) — exact mean/p50/p90 per stage from
  one stacked total-order kernel pass.
- ``text_containment_dedup``: asymmetric shingle containment
  |A∩B|/|A| — catches a document EMBEDDED in a larger one (quotes,
  boilerplate wrappers), which symmetric Jaccard (dedup_ngram_jaccard)
  structurally under-scores.
- ``graph_community_modularity``: Newman modularity of the
  deterministic LPA communities — the quality number that says whether
  the partition is better than chance.

Determinism: funnel gaps are exact epoch-second integers and the
percentiles are exact order statistics at ⌈q·n⌉ under a unique total
order; containment is one integer division rounded 6 dp; modularity
terms combine exact edge/degree counts with mirrored parenthesization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum_sql
from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


# ---------------------------------------------------------------------------
# events_funnel_latency
# ---------------------------------------------------------------------------

@query(
    "events_funnel_latency",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s ON s.user_id = e.user_id AND e.ts > s.t
      WHERE e.event_type = 'view' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    gaps AS (
      SELECT 'signup_to_view' AS stage, s.user_id,
             CAST(date_diff('second', s.t, v.t) AS BIGINT) AS gap_s
      FROM s JOIN v ON v.user_id = s.user_id
      UNION ALL
      SELECT 'view_to_purchase', v.user_id,
             CAST(date_diff('second', v.t, p.t) AS BIGINT)
      FROM v JOIN p ON p.user_id = v.user_id
    ),
    ranked AS (
      SELECT stage, gap_s,
             ROW_NUMBER() OVER (PARTITION BY stage
                                ORDER BY gap_s, user_id) AS r,
             COUNT(*) OVER (PARTITION BY stage) AS n
      FROM gaps
    )
    SELECT stage, CAST(MAX(n) AS BIGINT) AS n_users,
           round(CAST(SUM(gap_s) AS DOUBLE) / MAX(n) / 60.0, 6)
             AS mean_minutes,
           round(MAX(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN gap_s END) / 60.0, 6) AS p50_minutes,
           round(MAX(CASE WHEN r = CAST(ceil(0.9 * n) AS BIGINT)
                     THEN gap_s END) / 60.0, 6) AS p90_minutes
    FROM ranked GROUP BY stage
    """,
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel transition timing: for users who progress signup → view →
    purchase in strict time order (events_funnel's step semantics),
    the per-transition latency profile — count, mean, and EXACT p50/p90
    (order statistics at rank ⌈q·n⌉, not interpolations) in minutes.
    The question a growth team asks after the conversion counts: where
    does the funnel stall.

    Both stages rank in ONE total-order kernel pass over the stacked
    (stage, gap, user) frame — stage leads the range sort, so each
    stage's block is contiguous and the within-stage rank is the
    global rank minus the stage offset (a 2-row broadcast; the RFM
    pattern, but with unequal block sizes so offsets come from counts
    rather than arithmetic).

    Determinism: gaps are exact epoch-second integers; mean is one
    exact-sum division; percentile ranks are integers; ties rank by
    user_id.

    Scale: three filtered per-user MIN aggregates whose inputs shrink
    monotonically (funnel survivors only), then the kernel's one range
    shuffle over ≤ 2·|converters| rows."""
    ev = table(spark, sf_dir, "events")
    # persist each funnel stage: s is referenced by v and g1, v by p,
    # g1 and g2, and the stacked gaps frame by both the rank kernel
    # and the stage-counts branch — without barriers the events scans
    # re-evaluate once per reference (r14 plan audit: 29 exchanges)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_s"))
        .persist()
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("ts_s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_v"))
        .persist()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("ts_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_p"))
    )
    g1 = s.join(v, "user_id").select(
        F.lit("signup_to_view").alias("stage"),
        "user_id",
        (F.unix_timestamp("ts_v") - F.unix_timestamp("ts_s")).alias("gap_s"),
    )
    g2 = v.join(p, "user_id").select(
        F.lit("view_to_purchase").alias("stage"),
        "user_id",
        (F.unix_timestamp("ts_p") - F.unix_timestamp("ts_v")).alias("gap_s"),
    )
    gaps = g1.unionAll(g2).persist()
    ranked = attach_global_order(
        gaps, [F.asc("stage"), F.asc("gap_s"), F.asc("user_id")], rn="grn"
    )
    offs = gaps.groupBy("stage").agg(F.count(F.lit(1)).alias("n"))
    # per-stage offset = rows in preceding stage blocks; 2 rows total
    # bounded-window: exclusive prefix over the 2-row stage-counts frame
    from pyspark.sql import Window as W

    w_off = W.orderBy("stage").rowsBetween(W.unboundedPreceding, -1)
    offs = offs.withColumn(
        "off", F.coalesce(F.sum("n").over(w_off), F.lit(0))
    )
    r = (
        ranked.join(F.broadcast(offs), "stage")
        .withColumn("r", F.col("grn") - F.col("off"))
    )
    return r.groupBy("stage").agg(
        F.max("n").cast("long").alias("n_users"),
        F.round(F.sum("gap_s").cast("double") / F.max("n") / 60.0, 6).alias(
            "mean_minutes"
        ),
        F.round(
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("gap_s"),
                )
            )
            / 60.0,
            6,
        ).alias("p50_minutes"),
        F.round(
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.9 * F.col("n")).cast("long"),
                    F.col("gap_s"),
                )
            )
            / 60.0,
            6,
        ).alias("p90_minutes"),
    )


# ---------------------------------------------------------------------------
# text_containment_dedup
# ---------------------------------------------------------------------------

_CONT_T = "0.9"


@query(
    "text_containment_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      FROM toks, UNNEST(generate_series(1, len(t)-2)) AS u(i)
      WHERE len(t) >= 3
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    directed AS (
      SELECT doc_a AS contained_doc, doc_b AS container_doc,
             n_inter, sa.n AS n_contained,
             round(n_inter * 1.0 / sa.n, 6) AS containment
      FROM inter JOIN sizes sa ON sa.doc_id = doc_a
      UNION ALL
      SELECT doc_b, doc_a, n_inter, sb.n,
             round(n_inter * 1.0 / sb.n, 6)
      FROM inter JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT contained_doc, container_doc,
           CAST(n_inter AS BIGINT) AS n_inter,
           CAST(n_contained AS BIGINT) AS n_contained,
           containment
    FROM directed WHERE containment >= {_CONT_T}
    """,
)
def text_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|
    over word-3-gram shingles, emitting every directed pair with
    C ≥ {_CONT_T} — the detector for a document EMBEDDED in a longer
    one (quoted articles, boilerplate-wrapped reposts), which symmetric
    Jaccard under-scores by construction (a 10× length gap caps J at
    ~0.1 while containment is 1.0). Broder's containment measure next
    to dedup_ngram_jaccard's resemblance.

    Reuses the inverted-index intersection shape: pairs sharing ≥ 1
    shingle get counted via the shingle-hash equi-join (no pair with
    zero overlap ever materializes), then each undirected intersection
    row fans into its two directed containments. Exact counts; one
    division rounded 6 dp.

    Scale: identical to dedup_ngram_jaccard — 8-byte shingle-hash
    shuffle, document-frequency-bounded fan-out, AQE skew-split for
    hot shingles; the directed expansion is 2× the (sparse)
    intersection table."""
    from python_etl_sample_spark.operators.dedup import _shingle_hashes

    tokens = _shingle_hashes(spark, sf_dir)
    sizes = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ta = tokens.select(F.col("doc_id").alias("doc_a"), "h")
    tb = tokens.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        ta.join(tb, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    both = inter.join(sa, "doc_a").join(sb, "doc_b")
    # one explode fans each undirected row into its two directed
    # containments in a single pass — the previous d1.unionAll(d2)
    # evaluated the intersection+size joins twice per run
    return (
        both.select(
            "n_inter",
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("cd"),
                        F.col("doc_b").alias("cr"),
                        F.col("na").alias("nc"),
                    ),
                    F.struct(
                        F.col("doc_b").alias("cd"),
                        F.col("doc_a").alias("cr"),
                        F.col("nb").alias("nc"),
                    ),
                )
            ).alias("p"),
        )
        .select(
            F.col("p.cd").alias("contained_doc"),
            F.col("p.cr").alias("container_doc"),
            "n_inter",
            F.col("p.nc").alias("n_contained"),
            F.round(F.col("n_inter") * 1.0 / F.col("p.nc"), 6).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= float(_CONT_T))
    )


# ---------------------------------------------------------------------------
# graph_community_modularity
# ---------------------------------------------------------------------------

def _modularity_oracle() -> str:
    from python_etl_sample_spark.operators.graph_analytics import _EDGES_SQL
    from python_etl_sample_spark.operators.round6c_ops import (
        _LPA_ROUNDS,
        _lpa_round_sql,
    )

    rounds = ",".join(
        _lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(_LPA_ROUNDS)
    )
    return f"""
    WITH {_EDGES_SQL},
    sym AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    {rounds},
    lab AS (SELECT node, label FROM l{_LPA_ROUNDS}),
    m AS (SELECT COUNT(*) AS m FROM edges),
    internal AS (
      SELECT la.label AS community, COUNT(*) AS m_c
      FROM edges e
      JOIN lab la ON la.node = e.u
      JOIN lab lb ON lb.node = e.v
      WHERE la.label = lb.label
      GROUP BY la.label
    ),
    degs AS (
      SELECT la.label AS community, SUM(d.deg) AS d_c,
             COUNT(*) AS n_members
      FROM deg d JOIN lab la ON la.node = d.node
      GROUP BY la.label
    )
    SELECT d.community, CAST(d.n_members AS BIGINT) AS n_members,
           CAST(COALESCE(i.m_c, 0) AS BIGINT) AS n_internal_edges,
           CAST(d.d_c AS BIGINT) AS degree_sum,
           round(COALESCE(i.m_c, 0) * 1.0 / m.m
                 - (d.d_c * 1.0 / (2 * m.m)) * (d.d_c * 1.0 / (2 * m.m)),
                 6) + 0.0 AS q_term  -- + 0.0 folds DuckDB's -0.0 to 0.0
    FROM degs d
    LEFT JOIN internal i ON i.community = d.community
    CROSS JOIN m
    """


@query("graph_community_modularity", oracle=_modularity_oracle())
def graph_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the deterministic LPA communities
    (round6c_ops._lpa_fit — the identical fit the LPA query reports):
    per community, Q_c = m_c/m − (d_c/2m)², whose sum is the partition
    modularity — the standard "is this better than a random graph with
    the same degrees" quality score a community detection needs before
    anyone acts on it.

    Determinism: m, m_c, d_c are exact integer counts; each Q term is
    two IEEE divisions and one multiply with mirrored parenthesization,
    rounded 6 dp. The LPA fit itself is the hash-proven deterministic
    one (plurality with (count DESC, label ASC) tie-break).

    Scale: on top of the LPA supersteps, one edges⋈labels⋈labels
    equi-join chain (shuffles node-keyed int pairs), one degree join,
    and a 1-row edge total broadcast — all node/edge-keyed, nothing
    quadratic."""
    from python_etl_sample_spark.operators.graph_analytics import (
        _copurchase_edges,
    )
    from python_etl_sample_spark.operators.round6c_ops import _lpa_fit

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    lab = _lpa_fit(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    m = edges.agg(F.count(F.lit(1)).alias("m"))
    la = lab.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lb = lab.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    internal = (
        edges.join(la, "u")
        .join(lb, "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("community"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    degs = (
        deg.join(lab, "node")
        .groupBy(F.col("label").alias("community"))
        .agg(F.sum("deg").alias("d_c"), F.count(F.lit(1)).alias("n_members"))
    )
    return (
        degs.join(internal, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.col("n_members").cast("long").alias("n_members"),
            F.coalesce("m_c", F.lit(0)).cast("long").alias("n_internal_edges"),
            F.col("d_c").cast("long").alias("degree_sum"),
            (
                F.round(
                    F.coalesce("m_c", F.lit(0)) * 1.0 / F.col("m")
                    - (F.col("d_c") * 1.0 / (2 * F.col("m")))
                    * (F.col("d_c") * 1.0 / (2 * F.col("m"))),
                    6,
                )
                + 0.0  # mirror of the oracle's -0.0 normalization
            ).alias("q_term"),
        )
    )
