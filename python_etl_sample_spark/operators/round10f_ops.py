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
    """Hamilton (largest-remainder) apportionment of a {_BUDGET}-doc
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
