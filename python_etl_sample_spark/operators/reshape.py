"""Relational reshape operators round 4: wide→long UNPIVOT/MELT and
lateral array explosion with ordinality (posexplode).

Both are Catalyst-native Generate/Expand plans — map-side row
multiplication with zero shuffle — so they cost only output volume at
any scale. The reshape family completes the §2 surface's pivot with its
inverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum, dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "unpivot_metrics",
    oracle=f"""
    WITH wide AS (
      SELECT l_returnflag,
             {dsum_sql('l_quantity')} AS sum_qty,
             {dsum_sql('l_extendedprice')} AS sum_price,
             {dsum_sql('l_discount')} AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): a wide per-flag aggregate rotated into tidy
    (flag, metric, value) rows — the inverse of the ``pivot`` operator
    and the standard prep step for metric-agnostic sinks (dashboards,
    long-format ML feature tables).

    Plan shape: the aggregate shuffles once; the unpivot itself is an
    Expand node — each aggregated row fans into 3 rows map-side, no
    extra shuffle. At 100 TB wide→long on RAW rows multiplies scan
    output by the metric count, so melt AFTER aggregation, as here."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "value"
    )


@query(
    "explode_token_positions",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), e AS (
      SELECT doc_id, words, generate_subscripts(words, 1) AS i FROM w
    )
    SELECT doc_id, i - 1 AS pos, words[i] AS token
    FROM e WHERE i <= 8
    """,
)
def explode_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode WITH ordinality: each document's first 8 tokens
    as (doc_id, pos, token) rows via ``posexplode`` — position-aware
    tokenization, the front half of every prefix-dedup / leading-context
    pipeline.

    posexplode is a Generate node: rows multiply map-side inside the
    scan stage, the position is generated (not re-derived by a window),
    and the prefix cap is pushed into the generator's output filter.
    The oracle reconstructs ordinality with generate_subscripts since
    DuckDB 1.0 lacks UNNEST WITH ORDINALITY."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
        )
        .filter(F.col("pos") < 8)
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")
    )
