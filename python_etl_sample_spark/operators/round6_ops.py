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
    )
    n = ranked.agg(F.count(F.lit(1)).alias("c"))
    targets = (
        spark.createDataFrame(
            [(qn,) for qn, _ in _QUANTILES], "qn int"
        )
        .crossJoin(F.broadcast(n))
        .select(
            "qn",
            F.expr("(c * qn + 99) div 100").alias("target"),
            "c",
        )
    )
    return (
        ranked.join(
            F.broadcast(targets), ranked.rn == targets.target
        ).select(
            (F.col("qn") / 100.0).alias("quantile"),
            F.col("target").cast("bigint").alias("rank"),
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
    mirrored float division rounded 6 dp. Scale: tokenize is map-only;
    the trigram frame shuffles once on the trigram key for first-
    occurrence attribution (partial-agg min) and once per doc for the
    distinct — both keyed shuffles of 24-byte-ish strings, never
    documents; the per-doc window is PARTITIONED by doc (no global
    order anywhere)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        tok.select(
            "doc_id",
            "lang",
            F.concat_ws(
                " ",
                F.col("token"),
                F.lead("token", 1).over(w),
                F.lead("token", 2).over(w),
            ).alias("tg"),
            F.lead("token", 2).over(w).alias("__t2"),
        )
        .filter(F.col("__t2").isNotNull())
        .select("doc_id", "lang", "tg")
        .distinct()
    )
    first_seen = tri.groupBy("tg").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        tri.join(first_seen, "tg")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.count(
                F.when(F.col("first_doc") == F.col("doc_id"), 1)
            ).alias("n_novel"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tri").cast("bigint").alias("n_trigrams"),
        F.sum("n_novel").cast("bigint").alias("n_novel"),
        F.round(
            F.sum("n_novel") / F.sum("n_tri").cast("double"), 6
        ).alias("novelty_rate"),
    )
