"""ML feature engineering: the hashing trick over document tokens —
fixed-dimensional bag-of-words features WITHOUT a vocabulary, the
featurization that works at 100 TB because it needs no global
dictionary build, no broadcast, and no second pass.

Engine parity: the bucket hash is the first 6 hex digits of sha256
(identical lowercase hex in both engines) parsed to an integer —
Spark's ``conv(..., 16, 10)`` and DuckDB's ``CAST('0x…' AS BIGINT)``
agree exactly on that domain (< 16^6) — then modulo the dimension.
Everything hashed is integers; no float reaches the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: feature dimension — deliberately small so hash collisions are
#: OBSERVABLE in the report (the trick's accuracy trade)
_DIM = 128


@query(
    "features_hashing_trick",
    oracle=f"""
    WITH tok AS (
      SELECT t.token
      FROM documents,
           unnest(string_split_regex(lower(text), '\\s+')) AS t(token)
      WHERE t.token <> ''
    ),
    b AS (
      SELECT CAST(('0x' || substr(sha256(token), 1, 6)) AS BIGINT) % {_DIM}
               AS bucket,
             token
      FROM tok
    )
    SELECT bucket,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT token) AS n_distinct_tokens,
           CASE WHEN COUNT(DISTINCT token) > 1 THEN 1 ELSE 0 END
             AS has_collision
    FROM b GROUP BY bucket
    """,
)
def features_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization audit: every corpus token is hashed
    into one of {_DIM} fixed buckets (sha256-prefix mod dim); the
    report shows per-bucket mass and how many distinct tokens collided
    there — the information a feature-engineering pipeline uses to size
    the dimension before training.

    Why this shape scales: feature hashing replaces the vocabulary —
    a global, unbounded, broadcast-hostile artifact — with a stateless
    per-row function, so featurization is a map-only pass and this
    audit is one (bucket)-keyed partial aggregation; the reducer state
    is {_DIM} rows plus a distinct-set bounded by bucket vocabulary.
    The same bucket expression would emit (doc_id, bucket, count)
    training vectors; the audit aggregates globally instead so the
    result is hash-checkable and dimension-sized."""
    tok = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    bucket = F.expr(
        f"CAST(conv(substr(sha2(token, 256), 1, 6), 16, 10) AS BIGINT) % {_DIM}"
    )
    return (
        tok.select(bucket.alias("bucket"), "token")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("token").alias("n_distinct_tokens"),
            F.when(F.countDistinct("token") > 1, F.lit(1))
            .otherwise(F.lit(0))
            .alias("has_collision"),
        )
    )
