"""Round-6 extensions: exact global quantiles on the range-partitioned
total-order kernel, Matryoshka embedding-truncation quality, URL
canonicalization dedup, and n-gram novelty scoring.

Engine-parity ground rules follow functions/determinism.py: integer
ratios stay integer until one mirrored float division; libm outputs are
rounded (9 dp) before any cross-row aggregation; array folds use the
index-ordered textual mirror pair (_dot/_dot_sql) that the similarity
tier verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.operators.graph_analytics import _copurchase_edges
from python_etl_sample_spark.operators.similarity import _dot
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: (numerator, denominator) quantile fractions — integer arithmetic so
#: rank = ceil(q·n) is exact in both engines (0.9·n in doubles rounds
#: unpredictably at ulp boundaries; (n·qn + qd − 1) div qd never does)
_QUANTILES = ((25, 100), (50, 100), (75, 100), (90, 100), (99, 100))


@query(
    "agg_exact_quantiles_global",
    oracle=f"""
    WITH r AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (
               ORDER BY round(o_totalprice * 100), o_orderkey) AS rn
      FROM orders
    ),
    n AS (SELECT COUNT(*) AS c FROM orders),
    q AS (
      SELECT UNNEST([{','.join(str(qn) for qn, _ in _QUANTILES)}]) AS qn
    ),
    t AS (
      SELECT qn, (c * qn + 99) // 100 AS target, c
      FROM q CROSS JOIN n
    )
    SELECT t.qn / 100.0 AS quantile,
           CAST(t.target AS BIGINT) AS rank,
           CAST(t.c AS BIGINT) AS n_rows,
           round(r.cents / 100.0, 2) AS value
    FROM t JOIN r ON r.rn = t.target
    """,
)
def agg_exact_quantiles_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles (P25/P50/P75/P90/P99) of order value by
    the inverse-CDF (type-1) definition — value at rank ⌈q·n⌉ under the
    (cents, orderkey) total order. approx_percentile trades error
    bounds for one pass; this is the exact tier, and unlike a
    partitionless window it runs on the range-partitioned total-order
    kernel (functions/total_order.py): one range shuffle, a broadcast
    of 5 target ranks, no single-task stage anywhere.

    The target rank is pure integer arithmetic ((n·qn + 99) div 100),
    never ceil of a float — 0.9·n in binary floats rounds
    unpredictably at ulp boundaries and would shift the selected rank
    by one on exact multiples."""
    o = table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    ranked = attach_global_order(
        o.select(cents.alias("cents"), "o_orderkey"),
        [F.asc("cents"), F.asc("o_orderkey")],
        rn="rn",
        # total row count from the kernel's partition-totals frame —
        # a separate count() here costs a full extra pass over the
        # cached frame plus its own broadcast (plan audit r14)
        total_count="c",
    )
    qs = spark.createDataFrame([(qn,) for qn, _ in _QUANTILES], "qn int")
    return (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rn") == F.expr("(c * qn + 99) div 100"))
        .select(
            (F.col("qn") / 100.0).alias("quantile"),
            F.col("rn").cast("bigint").alias("rank"),
            F.col("c").cast("bigint").alias("n_rows"),
            F.round(F.col("cents") / 100.0, 2).alias("value"),
        )
    )


#: Matryoshka truncation depths (embedding dim is 64 across fixtures)
_MATRYOSHKA_KS = (8, 16, 32)


def _slice_dot_sql(k: int) -> str:
    return (
        f"(SELECT SUM(embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE)"
        f" FROM range({k}) t(i))"
    )


@query(
    "embedding_matryoshka_quality",
    oracle=f"""
    WITH per_vec AS (
      SELECT label,
             {_slice_dot_sql(64)} AS dotf,
             {_slice_dot_sql(8)} AS dot8,
             {_slice_dot_sql(16)} AS dot16,
             {_slice_dot_sql(32)} AS dot32
      FROM embeddings
    ),
    r AS (
      SELECT label,
             round(sqrt(dot8 / nullif(dotf, 0)), 9) AS r8,
             round(sqrt(dot16 / nullif(dotf, 0)), 9) AS r16,
             round(sqrt(dot32 / nullif(dotf, 0)), 9) AS r32
      FROM per_vec
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           COUNT(r8) AS n_scored,
           round(CAST(SUM(CAST(r8 AS DECIMAL(28,9))) AS DOUBLE)
                 / COUNT(r8), 6) AS avg_retention_8,
           round(CAST(SUM(CAST(r16 AS DECIMAL(28,9))) AS DOUBLE)
                 / COUNT(r16), 6) AS avg_retention_16,
           round(CAST(SUM(CAST(r32 AS DECIMAL(28,9))) AS DOUBLE)
                 / COUNT(r32), 6) AS avg_retention_32
    FROM r GROUP BY label
    """,
)
def embedding_matryoshka_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation quality: how much of each embedding's norm
    survives truncation to the first k ∈ {8, 16, 32} of 64 dims —
    ‖v[:k]‖ / ‖v‖, the norm-retention statistic behind
    Matryoshka-representation rollouts (truncate stored vectors to cut
    ANN index cost; ship only if retention stays high per label).

    Parity: the sliced self-dots are index-ordered folds mirrored
    textually (same convention the similarity tier verified); retention
    is one mirrored divide + sqrt rounded to 9 dp per vector BEFORE the
    per-label mean, which routes through DECIMAL(28,9) so the sum is
    association-free; zero vectors yield NULL retention via nullif (the
    embedding_int8_quantize lesson) and drop out of COUNT/AVG on both
    engines identically. Scale: map-side per-vector arithmetic + one
    partial-agg shuffle on the tiny label key."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dotf = _dot(v, v)
    cols = [F.col("label")]
    for k in _MATRYOSHKA_KS:
        vk = F.slice(v, 1, k)
        cols.append(
            F.round(
                F.sqrt(_dot(vk, vk) / F.nullif(dotf, F.lit(0.0))), 9
            ).alias(f"r{k}")
        )
    r = e.select(*cols)
    aggs = [
        F.count(F.lit(1)).alias("n_vectors"),
        F.count("r8").alias("n_scored"),
    ]
    for k in _MATRYOSHKA_KS:
        aggs.append(
            F.round(
                F.sum(F.col(f"r{k}").cast("decimal(28,9)")).cast("double")
                / F.count(f"r{k}"),
                6,
            ).alias(f"avg_retention_{k}")
        )
    return r.groupBy("label").agg(*aggs)


#: raw-URL synthesis — {idiv} is the integer-division token ('//' in
#: DuckDB, 'div' in Spark SQL) and {str_t} the unsized string type
#: ('VARCHAR' / 'STRING'); everything else is dialect-shared
_RAW_URL_TMPL = """
      'http' || CASE WHEN doc_id % 2 = 0 THEN 's' ELSE 'S' END || '://'
      || CASE doc_id % 3 WHEN 0 THEN 'WWW.corpus.example'
                         WHEN 1 THEN 'www.Corpus.Example'
                         ELSE 'corpus.example' END
      || '/docs/' || CAST(doc_id {idiv} 8 AS {str_t})
      || CASE doc_id % 4 WHEN 0 THEN ''
                         WHEN 1 THEN '/'
                         WHEN 2 THEN '?utm_source=feed'
                         ELSE '#ref' END
"""
_RAW_URL_SQL = _RAW_URL_TMPL.format(idiv="//", str_t="VARCHAR")


@query(
    "dedup_url_canonicalize",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, {_RAW_URL_SQL} AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(
               replace(
                 split_part(split_part(lower(url), '?', 1), '#', 1),
                 '://www.', '://'),
               '/$', '') AS curl
      FROM raw
    )
    SELECT curl AS canonical_url,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT url) AS n_raw_variants,
           MIN(doc_id) AS keeper_doc_id
    FROM canon GROUP BY curl
    """,
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the first dedup stage of every
    web-scale corpus pipeline: scheme/host case-folding, www-stripping,
    tracking-query and fragment removal, trailing-slash normalization,
    then exact grouping on the canonical form with a min-id keeper.

    The synthetic raw URLs vary scheme case, host case, www prefix,
    and suffix per doc while every 8 consecutive doc_ids share one
    canonical page, so the groups genuinely exercise each rule (the
    raw-variant count per group proves the inputs differed). The
    canonicalizer runs on the URL STRING in both engines — lower +
    split at ?/# + www-strip + trailing-slash regex — not re-derived
    from doc features, so a rule regression breaks the hash. Scale:
    map-side string ops + one groupBy(canonical) shuffle; 32-byte-ish
    keys, never documents."""
    d = table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.expr(_RAW_URL_TMPL.format(idiv="div", str_t="STRING")).alias("url"),
    )
    curl = F.regexp_replace(
        F.expr(
            "replace(split_part(split_part(lower(url), '?', 1), '#', 1),"
            " '://www.', '://')"
        ),
        "/$",
        "",
    )
    return (
        raw.select("doc_id", "url", curl.alias("curl"))
        .groupBy(F.col("curl").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url").alias("n_raw_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH tok AS (
      SELECT d.doc_id, d.lang, t.tk AS token, t.pos
      FROM documents d,
           LATERAL (
             SELECT UNNEST(string_split_regex(lower(d.text), '\\s+')) AS tk,
                    UNNEST(range(len(string_split_regex(lower(d.text), '\\s+'))))
                      AS pos
           ) t
      WHERE t.tk <> ''
    ),
    tri AS (
      SELECT DISTINCT doc_id, lang,
             token || ' '
               || lead(token, 1) OVER w || ' '
               || lead(token, 2) OVER w AS tg
      FROM tok
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(token, 2) OVER w IS NOT NULL
    ),
    first_seen AS (
      SELECT tg, MIN(doc_id) AS first_doc FROM tri GROUP BY tg
    ),
    per_doc AS (
      SELECT t.doc_id, t.lang,
             COUNT(*) AS n_tri,
             COUNT(CASE WHEN f.first_doc = t.doc_id THEN 1 END) AS n_novel
      FROM tri t JOIN first_seen f ON f.tg = t.tg
      GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tri) AS BIGINT) AS n_trigrams,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           round(SUM(n_novel) / CAST(SUM(n_tri) AS DOUBLE), 6)
             AS novelty_rate
    FROM per_doc GROUP BY lang
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty: per language, the fraction of each document's
    DISTINCT word trigrams whose corpus-wide first occurrence (minimum
    doc_id) is that document — the memorization/near-duplication health
    metric LM-data pipelines track (novelty collapsing toward 0 means
    the crawl is re-reading itself; trigram attribution by first
    occurrence is the standard formulation).

    Determinism: everything is exact integer counting up to one
    mirrored float division rounded 6 dp.

    Scale (r14 reshape, guide §2.4): the per-doc DISTINCT-trigram set
    is a pure function of the document, so it materializes map-side —
    tokens → trigram array (``transform`` over positions; adjacency in
    the empties-filtered array is exactly the old window's
    ``lead``-over-``pos`` adjacency) → ``array_distinct`` — with ZERO
    shuffle, replacing the old doc-partitioned window + 3-column
    ``.distinct()``. First-occurrence attribution is then the ONE
    data-sized shuffle left: groupBy(tg) with a partial-agg min. Each
    doc's novel-count comes from the tiny first_seen frame regrouped
    by its exemplar doc (novelty of doc d = #trigrams whose corpus min
    is d — the same inner-join-on-tg count, without re-shuffling the
    trigram frame), joined back onto the map-side per-doc stats. The
    novel frame is doc-cardinality in the worst case (every doc owns
    ≥1 novel trigram), so the join strategy is left to the planner/AQE
    — a forced broadcast hint would bypass size thresholds and OOM at
    the 100 TB posture (ADVICE r14). Net: 4 data-sized exchanges +
    window sort → 1."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    docs = d.select("doc_id", "lang", toks.alias("t")).filter(F.size("t") >= 3)
    tgs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.slice("t", i, 3)),
        )
    )
    per_doc = docs.select("doc_id", "lang", F.size(tgs).alias("n_tri"))
    exploded = docs.select("doc_id", F.explode(tgs).alias("tg"))
    first_seen = exploded.groupBy("tg").agg(F.min("doc_id").alias("first_doc"))
    novel = first_seen.groupBy("first_doc").agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    joined = per_doc.join(
        novel,
        per_doc["doc_id"] == novel["first_doc"],
        "left",
    ).select(
        "lang",
        "n_tri",
        F.coalesce(F.col("n_novel"), F.lit(0).cast("bigint")).alias("n_novel"),
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tri").cast("bigint").alias("n_trigrams"),
        F.sum("n_novel").cast("bigint").alias("n_novel"),
        F.round(
            F.sum("n_novel") / F.sum("n_tri").cast("double"), 6
        ).alias("novelty_rate"),
    )


#: as-of staleness tolerance: a click older than this is too stale to
#: credit (the point-in-time feature-join contract — serving a feature
#: computed too long before the request is a correctness bug)
_ASOF_TOL_S = 24 * 3600


@query(
    "join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN c.ts IS NOT NULL
                 AND date_diff('second', c.ts, p.ts) <= {_ASOF_TOL_S}
                THEN c.ts END AS click_ts_within,
           CASE WHEN c.ts IS NOT NULL
                 AND date_diff('second', c.ts, p.ts) <= {_ASOF_TOL_S}
                THEN 1 ELSE 0 END AS matched
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH STALENESS TOLERANCE: each purchase matched to
    the user's latest click at-or-before it, but only credited when
    that click is at most 24 h old — the point-in-time feature-join
    contract (a feature computed long before the request must not be
    served as fresh). Purchases whose nearest click is older keep a
    NULL match and matched = 0, so the tolerance actually filters.

    The oracle is DuckDB's NATIVE ASOF JOIN plus the tolerance CASE —
    the strongest available cross-check for Spark's emulation (union
    the streams, last(click_ts, ignorenulls) over a user-partitioned
    (ts, side) window, then the same tolerance gate). One shuffle on
    user_id; no per-row subquery; a user's history sorts within one
    task — the standard as-of contract."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    fresh = (
        F.col("last_click_ts").isNotNull()
        & (
            F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts")
            <= _ASOF_TOL_S
        )
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(fresh, F.col("last_click_ts")).alias("click_ts_within"),
        F.when(fresh, F.lit(1)).otherwise(F.lit(0)).alias("matched"),
    )


@query(
    "events_bounce_rate",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_idx
      FROM marked
    ), sessions AS (
      SELECT user_id, session_idx, MIN(ts) AS session_start,
             COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, session_idx
    )
    SELECT CAST(CAST(session_start AS DATE) AS TIMESTAMP) AS day,
           COUNT(*) AS n_sessions,
           COUNT(CASE WHEN n_events = 1 THEN 1 END) AS n_bounces,
           round(COUNT(CASE WHEN n_events = 1 THEN 1 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
    FROM sessions GROUP BY CAST(session_start AS DATE)
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-min-gap sessionization,
    identical to events_sessionize — whose session frame this REUSES)
    containing exactly one event, keyed by session-start day — the
    engagement-health headline every product dashboard carries.

    Determinism: session numbering inherits the (ts, event_id)
    tie-break law; the rate is one mirrored integer division rounded
    6 dp. Scale: the one user_id shuffle from sessionization, then a
    partial-agg rollup on ~30 day keys."""
    from python_etl_sample_spark.operators.scale_ops5 import events_sessionize

    sessions = events_sessionize(spark, sf_dir)
    bounce = F.when(F.col("n_events") == 1, 1)
    return (
        sessions.groupBy(
            F.to_date("session_start").cast("timestamp_ntz").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count(bounce).alias("n_bounces"),
            F.round(
                F.count(bounce) / F.count(F.lit(1)).cast("double"), 6
            ).alias("bounce_rate"),
        )
    )


#: synthetic resource-hold length for the interval-merge op (its own
#: constant — events_max_concurrent's 15-min sweep is a different query)
_IVL_HOLD_S = 10 * 60


@query(
    "fn_intervals_overlap_merge",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL {_IVL_HOLD_S} SECOND AS e,
             event_id
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS is_new
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS island
      FROM marked
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me, COUNT(*) AS n_raw
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_merged,
           CAST(SUM(n_raw) AS BIGINT) AS n_raw,
           CAST(SUM(date_diff('second', ms, me)) AS BIGINT) AS covered_s
    FROM merged GROUP BY user_id
    """,
)
def fn_intervals_overlap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per key (gaps-and-islands over RANGES): each
    event holds a resource for 10 minutes; overlapping holds merge, and
    the per-user report counts merged intervals and total covered
    seconds — the classic uptime/billing/utilization primitive that
    naive per-second expansion (600× blow-up) or a range self-join
    (O(n·k)) gets catastrophically wrong.

    The rewrite: an interval starts a new island iff the running MAX of
    previous interval ends (user-partitioned, (start, event_id) order)
    does not reach its start; islands number by running sum of the
    marks; coverage is Σ(island end − island start) in exact epoch
    seconds — both windows share the (start, event_id) TOTAL order (the
    engine tie-break law), so tied starts island identically in both
    engines. One user_id shuffle serves the mark window, the island
    numbering, and (partial-agg) both rollups."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {_IVL_HOLD_S} SECOND")).alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0)
        .otherwise(1)
        .alias("is_new"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.withColumn("island", F.sum("is_new").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"),
        F.max("e").alias("me"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.sum("n_raw").cast("bigint").alias("n_raw"),
        F.sum(
            F.unix_timestamp("me") - F.unix_timestamp("ms")
        ).cast("bigint").alias("covered_s"),
    )


#: referential-integrity edges: (child table, fk column, parent table,
#: pk column) — the star schema's declared-but-unenforced constraints
_RI_EDGES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "dq_referential_integrity",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{child}.{fk}' AS fk_edge,
           (SELECT COUNT(*) FROM {child}) AS n_child_rows,
           (SELECT COUNT(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{fk})) AS n_orphans,
           (SELECT COUNT(DISTINCT c.{fk}) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{fk})) AS n_missing_keys
    """
        for child, fk, parent, pk in _RI_EDGES
    ),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep: for every foreign-key edge of the
    star schema, the orphan count (child rows whose key has no parent)
    and the distinct missing-key count — the data-quality audit that
    runs after every backfill, because distributed stores declare
    constraints but never enforce them.

    Shape per edge: one LEFT ANTI join (broadcast for the small
    parents, shuffle for orders⋈lineitem) + counts; the six per-edge
    1-row results union. On healthy fixtures every orphan count is 0 —
    the hash pins the HEALTH, and any loader regression that drops
    parent rows or mangles keys flips it."""
    # r14 probe note: a single-pass LEFT JOIN + conditional-agg rewrite
    # was measured SLOWER here (1.21 → 1.34 s floor): the healthy
    # fixture has zero orphans, so the anti-join leaves COUNT DISTINCT
    # an empty input, while the one-pass form pays the distinct-agg
    # Expand over every child row. The two-scan shape stays.
    results = None
    for child, fk, parent, pk in _RI_EDGES:
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("__pk"))
        orphans = c.join(
            F.broadcast(p) if parent != "orders" else p,
            c[fk] == F.col("__pk"),
            "left_anti",
        )
        row = orphans.agg(
            F.count(F.lit(1)).alias("n_orphans"),
            F.countDistinct(fk).alias("n_missing_keys"),
        ).crossJoin(
            F.broadcast(c.agg(F.count(F.lit(1)).alias("n_child_rows")))
        ).select(
            F.lit(f"{child}.{fk}").alias("fk_edge"),
            "n_child_rows",
            "n_orphans",
            "n_missing_keys",
        )
        results = row if results is None else results.unionByName(row)
    return results


@query(
    "etl_gdpr_delete_propagation",
    oracle="""
    WITH keyset AS (
      SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
    ),
    del_orders AS (
      SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM keyset)
    )
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM customer) AS n_rows,
           (SELECT COUNT(*) FROM keyset) AS n_deleted
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM del_orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
    UNION ALL
    SELECT 'events',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(*) FROM events
             WHERE user_id IN (SELECT k FROM keyset))
    """,
)
def etl_gdpr_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact report: a deletion keyset (every 97th
    customer key — deterministic stand-in for the day's GDPR requests)
    cascades through the schema's ownership edges
    (customer → orders → lineitem, customer → events), and the report
    counts rows each table would lose — the blast-radius audit run
    BEFORE the actual delete job.

    Shape: the keyset is a broadcast semi-join filter at every edge;
    the orders keyset (the only derived set) is itself broadcastable
    (|orders|/97). Nothing scans twice at the same depth; the real
    delete job is these same semi-joins feeding an overwrite (see
    etl_partition_overwrite / etl_merge_upsert for the write side)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")
    keyset = cust.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("k")
    )
    del_orders = orders.join(
        F.broadcast(keyset), orders.o_custkey == F.col("k"), "left_semi"
    ).select("o_orderkey")

    def row(name: str, base: DataFrame, deleted: DataFrame) -> DataFrame:
        return (
            base.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(
                F.broadcast(
                    deleted.agg(F.count(F.lit(1)).alias("n_deleted"))
                )
            )
            .select(F.lit(name).alias("table_name"), "n_rows", "n_deleted")
        )

    out = row("customer", cust, keyset)
    out = out.unionByName(row("orders", orders, del_orders))
    out = out.unionByName(
        row(
            "lineitem",
            li,
            li.join(
                F.broadcast(del_orders),
                li.l_orderkey == del_orders.o_orderkey,
                "left_semi",
            ),
        )
    )
    out = out.unionByName(
        row(
            "events",
            ev,
            ev.join(F.broadcast(keyset), ev.user_id == F.col("k"), "left_semi"),
        )
    )
    return out


#: recursive-CTE hierarchy walk — {idiv} is '//' (DuckDB) / 'div'
#: (Spark SQL); the synthetic forest is parent(k) = k div 7 for k ≥ 7
#: (keys < 7 are roots — the explicit k ≥ 7 recursion guard matters:
#: key 0 would otherwise be its own parent, an infinite cycle BOTH
#: engines faithfully looped on when first written). parent(k) < k for
#: every recursing k, so depth is bounded by log7(max key) and the
#: recursion provably terminates.
_RECURSIVE_TMPL = """
    WITH RECURSIVE chain AS (
      SELECT p_partkey AS node, 0 AS depth
      FROM part WHERE p_partkey < 7
      UNION ALL
      SELECT p.p_partkey AS node, c.depth + 1 AS depth
      FROM part p JOIN chain c ON p.p_partkey {idiv} 7 = c.node
      WHERE p.p_partkey >= 7
    )
    SELECT depth,
           COUNT(*) AS n_parts,
           MIN(node) AS min_key,
           MAX(node) AS max_key,
           CAST(SUM(node) AS BIGINT) AS key_sum
    FROM chain GROUP BY depth
"""


@query(
    "api_sql_recursive_cte",
    oracle=_RECURSIVE_TMPL.format(idiv="//"),
)
def api_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE — new in Spark 4): transitive
    closure over a synthetic assembly forest (parent(k) = k div 7, the
    bill-of-materials / org-chart shape), rolled up as parts per depth
    with key checksums so the hash pins EVERY node's depth, not just
    counts. The same query text runs on both engines modulo the
    integer-division token — checking Spark's brand-new recursion
    operator against DuckDB's mature one.

    Termination is structural (parent key strictly decreases), not a
    row-limit guard. Scale: each recursion step is one equi-join of the
    frontier against the part scan + union — the same per-level
    frontier shape as graph_bfs_hops, planned by Catalyst's
    UnionLoop; depth is logarithmic in the key domain (≤8 levels at
    10^7 parts)."""
    from python_etl_sample_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_TMPL.format(idiv="div"))


#: k-anonymity thresholds to report (the privacy-review standard asks)
_KANON_KS = (2, 5, 10)


@query(
    "anon_k_anonymity_report",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS bal_band,
             COUNT(*) AS cnt
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, CAST(FLOOR(c_acctbal / 100) AS BIGINT)
    ),
    ks AS (SELECT UNNEST([{", ".join(map(str, _KANON_KS))}]) AS k)
    SELECT k AS k_threshold,
           (SELECT COUNT(*) FROM classes) AS n_classes,
           (SELECT MIN(cnt) FROM classes) AS min_class_size,
           COUNT(CASE WHEN cnt < k THEN 1 END) AS n_classes_below,
           COALESCE(CAST(SUM(CASE WHEN cnt < k THEN cnt END) AS BIGINT), 0)
             AS n_rows_at_risk
    FROM ks CROSS JOIN classes
    GROUP BY k
    """,
)
def anon_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: equivalence classes over the quasi-identifier
    tuple (nation, market segment, account-balance band of 100) and,
    per privacy threshold k ∈ {2, 5, 10}, how many classes fall below k
    and how many ROWS sit in them — the re-identification risk report a
    privacy review demands before any dataset release (a row alone in
    its QI class is linkable by anyone holding those attributes).

    Everything is exact integer counting; the balance band floors a
    2-dp value at integer-safe distance from band edges. Scale: one
    partial-agg shuffle on the QI tuple, then a 3-row broadcast of the
    thresholds over the (bounded: |nations|·|segments|·|bands|) class
    frame."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    totals = classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("cnt").alias("min_class_size"),
    )
    ks = spark.createDataFrame([(k,) for k in _KANON_KS], "k int")
    return (
        F.broadcast(ks)
        .crossJoin(classes)
        .groupBy(F.col("k").alias("k_threshold"))
        .agg(
            F.count(F.when(F.col("cnt") < F.col("k"), 1)).alias(
                "n_classes_below"
            ),
            F.coalesce(
                F.sum(F.when(F.col("cnt") < F.col("k"), F.col("cnt"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_rows_at_risk"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "k_threshold",
            "n_classes",
            "min_class_size",
            "n_classes_below",
            "n_rows_at_risk",
        )
    )


@query(
    "graph_jaccard_link_prediction",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src),
    common AS (
      SELECT a.src AS x, b.src AS y, COUNT(*) AS c
      FROM sym a JOIN sym b ON a.dst = b.dst AND a.src < b.src
      GROUP BY a.src, b.src
    ),
    cand AS (
      SELECT cm.x, cm.y, cm.c, dx.deg AS degx, dy.deg AS degy
      FROM common cm
      JOIN deg dx ON dx.node = cm.x
      JOIN deg dy ON dy.node = cm.y
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.u = cm.x AND e.v = cm.y)
    )
    SELECT x AS part_a, y AS part_b,
           CAST(c AS BIGINT) AS n_common,
           round(c / CAST(degx + degy - c AS DOUBLE), 6) AS jaccard
    FROM cand
    ORDER BY jaccard DESC, x, y
    LIMIT 20
    """,
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard: for every NON-adjacent
    part pair sharing at least one co-purchase neighbor,
    |Γ(a)∩Γ(b)| / |Γ(a)∪Γ(b)| — the classic "customers who bought
    these also bought..." candidate generator — reported as the top-20
    under the unique (jaccard, a, b) order.

    Shape: common-neighbor counting is one self-equi-join of the
    symmetrized edge list on the shared endpoint + a partial-agg
    count; existing edges leave via an anti join; top-20 fuses to
    TakeOrderedAndProject. The wedge fan-out is Σ deg(n)² over hub
    nodes — the honest cost of EXACT common-neighbor counts; at 100 TB
    the standard mitigations are hub capping (drop neighbors past the
    top-K per node before the join) or neighborhood MinHash (estimate
    Jaccard from signatures — see dedup_near_minhash for the kernel),
    both of which keep this plan's shape.

    r14 note: the wedge join was deliberately NOT rewritten to the
    groupBy + collect_set pair explode that replaced the bounded pair
    expansions (_copurchase_edges, triangle wedges): neighborhoods here
    are hub-unbounded, and the join form stays AQE-skew-splittable
    while a per-node collect_set would concentrate each hub's whole
    deg² expansion in one task."""
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    a, b = sym.alias("a"), sym.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(F.col("a.src").alias("x"), F.col("b.src").alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cand = (
        common.join(
            edges,
            (common.x == edges.u) & (common.y == edges.v),
            "left_anti",
        )
        .join(deg.select(F.col("node").alias("x"), F.col("deg").alias("degx")), "x")
        .join(deg.select(F.col("node").alias("y"), F.col("deg").alias("degy")), "y")
    )
    return (
        cand.select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("c").cast("bigint").alias("n_common"),
            F.round(
                F.col("c")
                / (F.col("degx") + F.col("degy") - F.col("c")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )
