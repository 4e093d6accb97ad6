"""Multimodal columns — SURVEY.md §2.10 op #66 plus the binary-payload
pipeline a training-data system needs (decode/feature-extract plumbing).

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake behind the real Spark plumbing:
binary column + typed metadata, Arrow-batched mapInPandas with an
explicit output schema, partition-preserving batch shape. Swapping the
fake for PIL/ffmpeg changes one function body, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.operators.similarity import _dot, _dot_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "multimodal_join",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars,
           len(string_split_regex(lower(d.text), '\\s+')) AS n_tokens,
           len(e.embedding) AS n_dims,
           e.label,
           round(sqrt({_dot_sql('e.embedding', 'e.embedding')}), 9) AS vec_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#66 documents⋈embeddings: text stats + vector stats in one row
    (inner join — semantics stable across sf where table sizes differ,
    FIXTURES.md)."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
        F.size("embedding").alias("n_dims"),
        "label",
        F.round(F.sqrt(_dot(v, v)), 9).alias("vec_norm"),
    )


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB decode kernel (no codec libs in this container): a real
    deployment replaces this body with PIL/libjpeg. Returns
    (width, height, channels) deterministically from the payload bytes
    so the pipeline is testable end-to-end."""
    if payload is None or len(payload) < 4:
        raise NotImplementedError(
            "real image decoding requires PIL/libjpeg — not available here"
        )
    # deterministic fake: dimensions derived from leading payload bytes
    return (64 + payload[0] % 192, 64 + payload[1] % 192, 3)


@query("multimodal_decode", oracle=None)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline (rows-only: the payload synthesis
    and Arrow UDF are not SQL-expressible).

    Builds an opaque binary payload column (as an image store would
    hold) + typed metadata, then runs an Arrow-batched mapInPandas
    "decode" that emits per-item features. The Spark-side contract —
    schema, batch iteration, column pruning into the UDF — is the real
    100 TB shape; only the codec is faked (see decode_image)."""
    d = table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id",
        "lang",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
    )

    schema = "doc_id bigint, lang string, mime string, width int, height int, channels int, n_bytes bigint"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(decode_image)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "mime": pdf["mime"],
                    "width": dims.map(lambda t: t[0]),
                    "height": dims.map(lambda t: t[1]),
                    "channels": dims.map(lambda t: t[2]),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return with_payload.mapInPandas(decode_batches, schema)
