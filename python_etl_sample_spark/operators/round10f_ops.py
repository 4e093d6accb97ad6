"""Round-10f — ``corpus_apportion_budget``: largest-remainder
apportionment of a sampling budget.

``corpus_temperature_mix`` (round10c_ops) produces fractional sampling
weights; an epoch builder needs INTEGER document counts that sum to the
budget EXACTLY — fractional quotas rounded independently over- or
under-shoot by up to |domains|/2. The classical fix is Hamilton's
largest-remainder method: every domain gets ⌊quota⌋, and the leftover
seats go to the largest remainders (deterministic tie-break). The
apportionment property Σ alloc = budget is structural, not approximate
— and the oracle proves it as data.

Parity: the quota is one mirrored double expression rounded at 9 dp
(so ⌊·⌋ and the remainder are engine-identical); everything after is
exact integer arithmetic and an exact-rank cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_BUDGET = 10_000  # documents to draw next epoch


@query(
    "corpus_apportion_budget",
    oracle=f"""
    WITH per AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang, source
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM per),
    sq AS (
      SELECT p.lang, p.source, p.n_docs,
             round(sqrt(CAST(p.n_chars AS DOUBLE)
                        / CAST(t.total_chars AS DOUBLE)), 9) AS sq9
      FROM per p CROSS JOIN tot t
    ),
    z AS (
      SELECT CAST(SUM(CAST(sq9 AS DECIMAL(28, 12))) AS DOUBLE) AS z FROM sq
    ),
    quota AS (
      SELECT s.lang, s.source, s.n_docs,
             round({_BUDGET} * (s.sq9 / z.z), 9) AS q
      FROM sq s CROSS JOIN z
    ),
    base AS (
      SELECT lang, source, n_docs, q,
             CAST(floor(q) AS BIGINT) AS b,
             round(q - floor(q), 9) AS rem
      FROM quota
    ),
    d AS (
      SELECT CAST({_BUDGET} - SUM(b) AS BIGINT) AS deficit FROM base
    ),
    ranked AS (
      SELECT lang, source, n_docs, q, b, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rr
      FROM base
    )
    SELECT r.lang, r.source, r.n_docs,
           round(r.q, 6) AS quota,
           CAST(r.rr AS BIGINT) AS remainder_rank,
           r.b + CASE WHEN r.rr <= d.deficit THEN 1 ELSE 0 END AS alloc
    FROM ranked r CROSS JOIN d
    """,
)
def corpus_apportion_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a 10000-doc
    epoch budget across (lang, source) domains under the square-root
    temperature weights of corpus_temperature_mix: each domain draws
    ⌊budget·w⌋ documents, and the budget − Σ⌊·⌋ leftover goes to the
    largest fractional remainders (ties broken by (lang, source)).
    Unlike independent rounding, Σ alloc = budget EXACTLY — the
    property an epoch manifest needs before sampling starts — and each
    alloc differs from its real-valued quota by < 1 (Hamilton's
    staying-within-the-quota guarantee).

    Scale: one map-side-combined groupBy to ~domains rows; everything
    after runs on the domain frame. The remainder rank is a window over
    that frame —
    # bounded-window: the ORDER BY rem frame is the (lang, source)
    # domain table (~100 rows at ANY corpus size), not data-sized.

    Determinism: sqrt-temperature weights as in corpus_temperature_mix
    (IEEE-guaranteed sqrt, decimal normalizer); the quota rounds at
    9 dp so floor/remainder are engine-identical; allocation is exact
    integer arithmetic over an exact rank."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = per.agg(F.sum("n_chars").alias("total_chars"))
    p_share = F.col("n_chars").cast("double") / F.col("total_chars").cast(
        "double"
    )
    sq = per.crossJoin(F.broadcast(tot)).select(
        "lang", "source", "n_docs", F.round(F.sqrt(p_share), 9).alias("sq9")
    )
    z = sq.agg(
        F.sum(F.col("sq9").cast("decimal(28,12)")).cast("double").alias("z")
    )
    base = sq.crossJoin(F.broadcast(z)).select(
        "lang",
        "source",
        "n_docs",
        F.round(F.lit(_BUDGET) * (F.col("sq9") / F.col("z")), 9).alias("q"),
    ).select(
        "lang",
        "source",
        "n_docs",
        "q",
        F.floor("q").cast("long").alias("b"),
        F.round(F.col("q") - F.floor("q"), 9).alias("rem"),
    )
    deficit = base.agg(
        (F.lit(_BUDGET) - F.sum("b")).cast("long").alias("deficit")
    )
    # bounded-window: the remainder rank orders the (lang, source)
    # domain frame (~100 rows at ANY corpus size), not data-sized rows
    wr = Window.orderBy(F.desc("rem"), F.asc("lang"), F.asc("source"))
    return (
        base.withColumn("rr", F.row_number().over(wr))
        .crossJoin(F.broadcast(deficit))
        .select(
            "lang",
            "source",
            "n_docs",
            F.round(F.col("q"), 6).alias("quota"),
            F.col("rr").cast("long").alias("remainder_rank"),
            (
                F.col("b")
                + F.when(F.col("rr") <= F.col("deficit"), 1).otherwise(0)
            ).alias("alloc"),
        )
    )


# --------------------------------------------------------------------------
# ml_auc_delong_ci
# --------------------------------------------------------------------------

_SCENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_YPOS = "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"


@query(
    "ml_auc_delong_ci",
    oracle=f"""
    WITH base AS (
      SELECT {_SCENTS} AS score, {_YPOS} AS y FROM orders
    ),
    h AS (
      SELECT score, COUNT(*) AS cnt, SUM(y) AS pos,
             COUNT(*) - SUM(y) AS neg
      FROM base GROUP BY score
    ),
    r AS (
      SELECT cnt, pos, neg,
             SUM(cnt) OVER w AS cumcnt,
             SUM(pos) OVER w AS cumpos
      FROM h
      WINDOW w AS (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n1,
             CAST(SUM(neg) AS BIGINT) AS n0
      FROM h
    ),
    pl AS (
      SELECT r.pos, r.neg,
             2 * (r.cumcnt - r.cumpos - r.neg) + r.neg AS p2,
             2 * (t.n1 - r.cumpos) + r.pos AS q2,
             t.n1, t.n0
      FROM r CROSS JOIN tot t
    ),
    a AS (
      SELECT CAST(SUM(CAST(pos AS DECIMAL(38,0)) * p2) AS DOUBLE)
               / (CAST(2 AS DOUBLE) * n0 * n1) AS araw,
             n1, n0
      FROM pl GROUP BY n1, n0
    ),
    v AS (
      SELECT a.n1, a.n0, a.araw,
             CAST(SUM(CAST(round(round((p2 / (2.0 * pl.n0) - a.araw)
                                       * (p2 / (2.0 * pl.n0) - a.araw), 12)
                                 * pl.pos, 9)
                           AS DECIMAL(28,12))) AS DOUBLE) AS s10,
             CAST(SUM(CAST(round(round((q2 / (2.0 * pl.n1) - a.araw)
                                       * (q2 / (2.0 * pl.n1) - a.araw), 12)
                                 * pl.neg, 9)
                           AS DECIMAL(28,12))) AS DOUBLE) AS s01
      FROM pl CROSS JOIN a
      GROUP BY a.n1, a.n0, a.araw
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           round(araw, 6) AS auc,
           round(sqrt(s10 / ((n1 - 1.0) * n1) + s01 / ((n0 - 1.0) * n0)), 6)
             AS se_delong,
           round(GREATEST(round(araw, 6)
                 - 1.96 * round(sqrt(s10 / ((n1 - 1.0) * n1)
                                     + s01 / ((n0 - 1.0) * n0)), 6), 0.0), 6)
             AS ci95_lo,
           round(LEAST(round(araw, 6)
                 + 1.96 * round(sqrt(s10 / ((n1 - 1.0) * n1)
                                     + s01 / ((n0 - 1.0) * n0)), 6), 1.0), 6)
             AS ci95_hi
    FROM v
    """,
)
def ml_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong standard error and 95% CI for the exact ROC-AUC —
    the uncertainty ml_roc_auc's point estimate needs before two
    models can be compared: SE² = var(V10)/n1 + var(V01)/n0 over the
    placement values (V10_i = fraction of negatives each positive
    outranks, ties at ½; V01_j symmetric), the standard nonparametric
    AUC inference (DeLong et al. 1988, the sklearn/pROC route).

    Everything runs on the score HISTOGRAM: placements collapse to one
    expression per distinct score — doubled-placement numerators
    p2 = 2·neg_below + neg_ties and q2 = 2·pos_above + pos_ties are
    EXACT INTEGERS from the kernel's cumulative counts, weighted by
    the tie counts — so the whole computation is O(distinct values)
    regardless of row count (ml_roc_auc's scale shape; the AUC itself
    is reproduced from Σ pos·p2 / (2·n0·n1), algebraically equal to
    the Mann-Whitney identity).

    Determinism: placement deviations square through a 12-dp round;
    the WEIGHTED term dev·count is computed in double and rounded at
    9 dp BEFORE the decimal(28,12) cast (the ml_brier pattern — a
    decimal·bigint product would hit Spark's precision cap and degrade
    to decimal(38,6), r10 ADVICE), so the summands are bit-identical
    in both engines and the decimal sum is order-independent; AUC, SE
    and the clamped CI bounds round at 6 dp, with the CI computed FROM
    the 6-dp-rounded AUC and SE so every reported digit replays."""
    o = table(spark, sf_dir, "orders")
    base = o.select(F.expr(_SCENTS).alias("score"), F.expr(_YPOS).alias("y"))
    # persist the score histogram: it feeds both the prefix-sum kernel
    # and the n1/n0 totals — without a barrier the orders scan +
    # groupBy evaluates twice (r14 plan audit)
    h = base.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    ).persist()
    from python_etl_sample_spark.functions.total_order import (
        attach_global_order,
    )

    r = attach_global_order(
        h,
        [F.asc("score")],
        cumsums=[("cnt", "cumcnt"), ("pos", "cumpos")],
    )
    tot = h.agg(
        F.sum("pos").cast("long").alias("n1"),
        F.sum("neg").cast("long").alias("n0"),
    )
    pl = r.crossJoin(F.broadcast(tot)).select(
        "pos",
        "neg",
        (2 * (F.col("cumcnt") - F.col("cumpos") - F.col("neg")) + F.col("neg"))
        .alias("p2"),
        (2 * (F.col("n1") - F.col("cumpos")) + F.col("pos")).alias("q2"),
        "n1",
        "n0",
    )
    a = pl.groupBy("n1", "n0").agg(
        (
            F.sum(F.col("pos").cast("decimal(38,0)") * F.col("p2")).cast(
                "double"
            )
            / (F.lit(2.0) * F.col("n0") * F.col("n1"))
        ).alias("araw")
    )
    v10 = F.col("p2") / (F.lit(2.0) * F.col("n0"))
    v01 = F.col("q2") / (F.lit(2.0) * F.col("n1"))
    dev10 = F.round((v10 - F.col("araw")) * (v10 - F.col("araw")), 12)
    dev01 = F.round((v01 - F.col("araw")) * (v01 - F.col("araw")), 12)
    v = (
        pl.crossJoin(F.broadcast(a.select("araw")))
        .groupBy()
        .agg(
            F.first("n1").alias("n1"),
            F.first("n0").alias("n0"),
            F.first("araw").alias("araw"),
            # weighted term computed in double and rounded BEFORE the
            # decimal cast (r10 ADVICE): dev·pos can reach ~1e3, and a
            # decimal(28,14)·bigint product hits Spark's precision cap
            # and silently degrades to decimal(38,6) — rounding the
            # identical double product at 9 dp in both engines makes
            # the summands bit-identical by construction (the ml_brier
            # pattern), then the decimal sum is order-independent
            F.sum(F.round(dev10 * F.col("pos"), 9).cast("decimal(28,12)"))
            .cast("double")
            .alias("s10"),
            F.sum(F.round(dev01 * F.col("neg"), 9).cast("decimal(28,12)"))
            .cast("double")
            .alias("s01"),
        )
    )
    se = F.round(
        F.sqrt(
            F.col("s10") / ((F.col("n1") - 1.0) * F.col("n1"))
            + F.col("s01") / ((F.col("n0") - 1.0) * F.col("n0"))
        ),
        6,
    )
    auc6 = F.round(F.col("araw"), 6)
    return v.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        auc6.alias("auc"),
        se.alias("se_delong"),
        F.round(F.greatest(auc6 - 1.96 * se, F.lit(0.0)), 6).alias("ci95_lo"),
        F.round(F.least(auc6 + 1.96 * se, F.lit(1.0)), 6).alias("ci95_hi"),
    )
