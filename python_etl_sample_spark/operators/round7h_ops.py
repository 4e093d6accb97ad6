"""Round-7 batch 8 — LM-based quality scoring, exact substring-span
dedup, ordered-attribute t-closeness, and the ACF diagnostic:

- ``text_bigram_lm_perplexity``: per-document cross-entropy and
  perplexity under a corpus-trained add-one-smoothed BIGRAM language
  model — the fluency filter one tier above the unigram scorer
  (text_unigram_lm_score), sensitive to scrambled word ORDER that
  unigram statistics cannot see.
- ``dedup_substring_spans``: exact duplicated word-8-gram spans
  appearing in ≥ 2 distinct documents — the exact-substring layer of
  training-data dedup (the Lee et al. 2022 "Deduplicating Training
  Data" shape re-expressed relationally), which catches shared
  boilerplate/quotes that whole-document and near-dup detectors miss.
- ``anon_t_closeness``: t-closeness audit (Li et al. 2007) of the
  account-balance distribution inside each quasi-identifier class via
  the ordered-attribute Earth-Mover's Distance — the release gate one
  step past k-anonymity (anon_k_anonymity_report) and l-diversity
  (anon_l_diversity): a class can be k-anonymous and diverse yet still
  leak because its sensitive DISTRIBUTION diverges from the global one.
- ``ts_autocorrelation``: the Box-Jenkins autocorrelation function of
  daily event revenue at lags 1..7 with the white-noise band and the
  Ljung-Box portmanteau Q — the first diagnostic every forecasting
  pass runs before model choice (and the residual check after).

Determinism: LM log-probs are log10 of exact-count ratios rounded at
9 dp and summed in decimal; span counts are exact integers; t-closeness
is one division of exact 38-digit-decimal integer sums; ACF moments are
decimal-exact sums cast to double once and combined with mirrored
parenthesization, with the Ljung-Box terms rounded at 12 dp before an
exact decimal sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_VCENTS = "CAST(round(value * 100) AS BIGINT)"
_DEC38 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# text_bigram_lm_perplexity
# ---------------------------------------------------------------------------

#: ordinality-preserving tokens (doc_id, pos, token) — the collocations
#: frame without the stopword filter (an LM must see function words)
_ORD_TOK_SQL = r"""
      SELECT doc_id, words[i] AS token, i AS pos
      FROM (SELECT doc_id, generate_subscripts(words, 1) AS i, words
            FROM (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS words
                  FROM documents))
      WHERE words[i] <> ''
"""


@query(
    "text_bigram_lm_perplexity",
    oracle=f"""
    WITH tok AS ({_ORD_TOK_SQL}),
    bg AS (
      SELECT doc_id, token AS w1,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    bgn AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
    cnt AS (SELECT w1, w2, COUNT(*) AS c12 FROM bgn GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c12) AS c1 FROM cnt GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
    terms AS (
      SELECT b.doc_id,
             CAST(round(log10((c.c12 + 1.0) / (x.c1 + vocab.v)), 9)
                  AS DECIMAL(28,12)) AS lp
      FROM bgn b
      JOIN cnt c ON c.w1 = b.w1 AND c.w2 = b.w2
      JOIN ctx x ON x.w1 = b.w1
      CROSS JOIN vocab
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS cross_entropy,
           round(power(10, -CAST(SUM(lp) AS DOUBLE) / COUNT(*)), 2)
             AS perplexity
    FROM terms GROUP BY doc_id
    """,
)
def text_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score: train an add-one-smoothed bigram model
    on the corpus itself (p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V)), then
    score every document with its cross-entropy H = −mean log10 p and
    perplexity 10^H. The order-sensitive quality gate: a document of
    common words in garbled ORDER scores fluent under the unigram LM
    (text_unigram_lm_score) but blows up here — the same reason
    production pipelines (CCNet-style) filter on an n-gram LM, not
    unigram frequencies.

    Plan: one doc_id-partitioned lead() builds adjacent pairs (one
    shuffle, no position self-join), one (w1,w2) groupBy trains the
    model, context totals derive from the bigram counts themselves
    (so probabilities sum to 1 per context), and scoring joins pairs
    back on (w1,w2). At 100 TB the model table is Zipf-compact
    relative to the corpus; the scoring join shuffles (w1,w2) keys and
    AQE splits the hot function-word contexts.

    Determinism: each log-prob is log10 of one IEEE division of exact
    longs, rounded 9 dp and summed as decimal(28,12) (exact, order-free
    — the unigram scorer's dsum pattern); H is one double division;
    perplexity is power(10, H) of the identical double on both engines
    (≤1 ulp), rounded 2 dp."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgn = (
        tok.withColumn("w2", F.lead("token").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("token").alias("w1"), "w2")
    )
    cnt = bgn.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = cnt.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = tok.agg(F.countDistinct("token").alias("v"))
    terms = (
        bgn.join(cnt, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log10((F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))), 9
            )
            .cast("decimal(28,12)")
            .alias("lp"),
        )
    )
    slp = F.sum("lp").cast("double")
    n = F.count(F.lit(1))
    return terms.groupBy("doc_id").agg(
        n.alias("n_bigrams"),
        F.round(-slp / n, 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(10.0), -slp / n), 2).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# dedup_substring_spans
# ---------------------------------------------------------------------------

#: span width in words — long enough that natural re-use is rare and a
#: hit means actual copied text (the substring-dedup literature uses
#: 50 BPE tokens at web scale; 8 words is the fixture-scale analogue)
_SPAN_K = 8


@query(
    "dedup_substring_spans",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sp AS (
      SELECT doc_id, array_to_string(t[i:i + {_SPAN_K - 1}], ' ') AS span
      FROM w, UNNEST(generate_series(1, len(t) - {_SPAN_K - 1})) AS u(i)
      WHERE len(t) >= {_SPAN_K}
    )
    SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS first_doc
    FROM sp GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated substrings: every word-8-gram span that
    appears in ≥ 2 distinct documents, with document reach, total
    occurrences, and the earliest exemplar. The exact-substring layer
    of training-data dedup — whole-document hashing misses a shared
    paragraph inside otherwise-distinct pages, near-dup detectors
    score it below threshold, while span-level matching (the
    "Deduplicating Training Data Makes Language Models Better" recipe)
    finds precisely the copied run so a pipeline can cut it.

    Plan: spans materialize per document with array built-ins
    (filter/sequence/slice/concat_ws — map-only, whole-stage codegen,
    zero Python), then ONE groupBy(span) with map-side combine. At
    100 TB the grouping key would be the span's 8-byte xxhash64 with
    min-by exemplar carrying the text — same plan shape, 8-byte
    shuffle; the fixture-scale query groups on the span text itself so
    the report (and the oracle hash) shows the actual strings.

    Determinism: pure integer counting over exact string keys."""
    d = table(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
    )
    docs = d.select("doc_id", arr.alias("t")).filter(
        F.size("t") >= _SPAN_K
    )
    spans = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (_SPAN_K - 1)),
                lambda i: F.concat_ws(" ", F.slice("t", i, _SPAN_K)),
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# anon_t_closeness
# ---------------------------------------------------------------------------


@query(
    "anon_t_closeness",
    oracle="""
    WITH base AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS b
      FROM customer
    ),
    cb AS (
      SELECT c_nationkey, c_mktsegment, b, COUNT(*) AS cc
      FROM base GROUP BY 1, 2, 3
    ),
    cls AS (
      SELECT c_nationkey, c_mktsegment, SUM(cc) AS n_c
      FROM cb GROUP BY 1, 2
    ),
    gb AS (SELECT b, SUM(cc) AS g FROM cb GROUP BY b),
    tot AS (SELECT CAST(SUM(g) AS BIGINT) AS n,
                   COUNT(*) AS m FROM gb),
    grid AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.n_c, gb.b, gb.g,
             COALESCE(cb.cc, 0) AS cc
      FROM cls CROSS JOIN gb
      LEFT JOIN cb ON cb.c_nationkey = cls.c_nationkey
                  AND cb.c_mktsegment = cls.c_mktsegment
                  AND cb.b = gb.b
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, n_c,
             SUM(CAST(cc AS DECIMAL(38,0)) * (SELECT n FROM tot)
                 - CAST(g AS DECIMAL(38,0)) * n_c)
               OVER (PARTITION BY c_nationkey, c_mktsegment
                     ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumdiff
      FROM grid
    )
    SELECT c_nationkey, c_mktsegment, CAST(MAX(n_c) AS BIGINT) AS n_rows,
           round(CAST(SUM(ABS(cumdiff)) AS DOUBLE)
                 / CAST((CAST((SELECT m FROM tot) - 1 AS DECIMAL(38,0)))
                        * MAX(n_c) * (SELECT n FROM tot) AS DOUBLE),
                 6) AS t_closeness
    FROM cum GROUP BY c_nationkey, c_mktsegment
    """,
)
def anon_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit: per quasi-identifier class (nation, market
    segment), the Earth-Mover's Distance between the class's
    account-balance distribution and the GLOBAL one over the m ordered
    1000-unit balance bands — Li et al.'s ordered-attribute EMD,
    t = (1/(m-1)) * sum_i |sum_{j<=i} (p_j - q_j)|. The disclosure a class
    with t near 1 makes is exactly what k-anonymity and l-diversity
    certify nothing about: an attacker learns the class's skewed
    balance profile even without re-identifying anyone.

    Exactness: multiply the cumulative differences through by n_c·n so
    every term is an integer — cum_i = sum_{j<=i} (cc_j*n - g_j*n_c) in
    38-digit decimals (int64-unsafe beyond ~10^9 rows, so the wide
    accumulator from the start), and t = Σ|cum_i| / ((m−1)·n_c·n) is
    ONE division of exact integers, rounded 6 dp.

    Scale: one groupBy on (QI, band) — the only data-sized shuffle —
    then everything operates on the bounded classes×bands grid
    (|nations|·|segments|·m rows) with broadcast band totals; the
    per-class cumulative window partitions on the class key."""
    c = table(spark, sf_dir, "customer")
    base = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("b"),
    )
    cb = base.groupBy("c_nationkey", "c_mktsegment", "b").agg(
        F.count(F.lit(1)).alias("cc")
    )
    cls = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cc").alias("n_c")
    )
    gb = cb.groupBy("b").agg(F.sum("cc").alias("g"))
    tot = gb.agg(
        F.sum("g").cast("long").alias("n"), F.count(F.lit(1)).alias("m")
    )
    grid = (
        cls.crossJoin(F.broadcast(gb))
        .join(cb, ["c_nationkey", "c_mktsegment", "b"], "left")
        .withColumn("cc", F.coalesce("cc", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.withColumn(
        "cumdiff",
        F.sum(
            F.col("cc").cast(_DEC38) * F.col("n")
            - F.col("g").cast(_DEC38) * F.col("n_c")
        ).over(w),
    )
    return cum.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("n_c").cast("long").alias("n_rows"),
        F.round(
            F.sum(F.abs("cumdiff")).cast("double")
            / (
                (F.max("m") - 1).cast(_DEC38)
                * F.max("n_c")
                * F.max("n")
            ).cast("double"),
            6,
        ).alias("t_closeness"),
    )


# ---------------------------------------------------------------------------
# ts_autocorrelation
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 4, 5, 6, 7)


@query(
    "ts_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, SUM({_VCENTS}) AS v
      FROM events GROUP BY 1
    ),
    gmom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DOUBLE) AS ssq
      FROM daily
    ),
    lags AS (SELECT UNNEST([{", ".join(map(str, _ACF_LAGS))}]) AS lag),
    pairs AS (
      SELECT l.lag, a.v AS av, b.v AS bv
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + CAST(l.lag || ' days' AS INTERVAL)
    ),
    m AS (
      SELECT lag, COUNT(*) AS n_pairs,
             CAST(SUM(CAST(av AS DECIMAL(38,0)) * bv) AS DOUBLE) AS p,
             CAST(SUM(CAST(av AS DECIMAL(38,0))) AS DOUBLE) AS ta,
             CAST(SUM(CAST(bv AS DECIMAL(38,0))) AS DOUBLE) AS tb
      FROM pairs GROUP BY lag
    ),
    r AS (
      SELECT m.lag, m.n_pairs, g.n,
             (m.p - (g.s / g.n) * m.ta - (g.s / g.n) * m.tb
              + m.n_pairs * (g.s / g.n) * (g.s / g.n))
             / (g.ssq - g.s * (g.s / g.n)) AS rr
      FROM m CROSS JOIN gmom g
    )
    SELECT a.lag, CAST(a.n_pairs AS BIGINT) AS n_pairs,
           round(a.rr, 6) AS acf,
           round(1.96 / sqrt(a.n), 6) AS wn_band,
           round(a.n * (a.n + 2.0)
                 * CAST(SUM(CAST(round(b.rr * b.rr / (a.n - b.lag), 12)
                                 AS DECIMAL(28,14))) AS DOUBLE),
                 6) AS ljung_box_q
    FROM r a JOIN r b ON b.lag <= a.lag
    GROUP BY a.lag, a.n_pairs, a.rr, a.n
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-Jenkins ACF of daily event revenue at lags 1..7:
    r_k = sum(x_t−x̄)(x_{t+k}−x̄) / sum(x_t−x̄)² with the GLOBAL mean and
    variance (the standard estimator — distinct from
    ts_cross_correlation's per-lag Pearson, which renormalizes at each
    lag), plus the ±1.96/√n white-noise band and the Ljung-Box
    portmanteau Q_k = n(n+2) sum_{j<=k} r_j²/(n−j) — the seasonality /
    model-adequacy diagnostic a forecasting pipeline runs first, and
    again on residuals.

    Lag alignment is by CALENDAR day (x_{t+k} joins on day+k), so a
    missing day drops its pairs rather than silently shifting the
    series — and n_pairs reports exactly how many survived per lag.

    Determinism: the five moment quantities are exact integer-cents
    sums in 38-digit decimals cast to double ONCE; each r_k combines
    them with mirrored parenthesization (bit-identical doubles), and
    the Ljung-Box accumulation rounds each term at 12 dp into an exact
    decimal sum so the ≤7-term float addition order
    cannot flip the 6-dp hash.

    Scale: one groupBy(day) over events (map-side combined), then the
    7-row lag frame broadcast against the compact daily
    series (an equi-join on day+lag), a 1-row global broadcast, and a
    ≤7² triangular self-join for the cumulative Q."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day")).agg(
        F.sum(F.expr(_VCENTS)).alias("v")
    )
    vd = F.col("v").cast(_DEC38)
    glob = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).cast("double").alias("s"),
        F.sum(vd * F.col("v")).cast("double").alias("ssq"),
    )
    lags = spark.createDataFrame([(k,) for k in _ACF_LAGS], "lag int")
    a = daily.select(F.col("day").alias("day_a"), F.col("v").alias("av"))
    b = daily.select(F.col("day").alias("day_b"), F.col("v").alias("bv"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("day_b") == F.date_add(F.col("day_a"), F.col("lag")))
    )
    avd = F.col("av").cast(_DEC38)
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(avd * F.col("bv")).cast("double").alias("p"),
        F.sum(avd).cast("double").alias("ta"),
        F.sum(F.col("bv").cast(_DEC38)).cast("double").alias("tb"),
    )
    xbar = F.col("s") / F.col("n")
    r = m.crossJoin(F.broadcast(glob)).select(
        "lag",
        "n_pairs",
        "n",
        (
            (
                F.col("p")
                - xbar * F.col("ta")
                - xbar * F.col("tb")
                + F.col("n_pairs") * xbar * xbar
            )
            / (F.col("ssq") - F.col("s") * xbar)
        ).alias("rr"),
    )
    ra = r.select(
        F.col("lag").alias("lag_a"),
        F.col("n_pairs"),
        F.col("n"),
        F.col("rr").alias("rr_a"),
    )
    rb = r.select(F.col("lag").alias("lag_b"), F.col("rr").alias("rr_b"))
    return (
        ra.join(F.broadcast(rb), F.col("lag_b") <= F.col("lag_a"))
        .groupBy(
            F.col("lag_a").alias("lag"),
            F.col("n_pairs"),
            F.col("rr_a"),
            F.col("n"),
        )
        .agg(
            F.round(
                F.col("n")
                * (F.col("n") + 2.0)
                * F.sum(
                    F.round(
                        F.col("rr_b")
                        * F.col("rr_b")
                        / (F.col("n") - F.col("lag_b")),
                        12,
                    ).cast("decimal(28,14)")
                )
                .cast("double"),
                6,
            ).alias("ljung_box_q"),
        )
        .select(
            "lag",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("rr_a"), 6).alias("acf"),
            F.round(1.96 / F.sqrt(F.col("n")), 6).alias("wn_band"),
            "ljung_box_q",
        )
    )
