"""Embedding-column transforms round 4: int8 quantization and
matryoshka truncation energy — the storage/bandwidth levers of a
100 TB vector corpus.

Both are map-only JVM plans: higher-order array functions
(``transform`` / ``aggregate`` / ``slice``) run inside whole-stage
codegen over the ``array<float>`` column — no Python workers, no
shuffle except the final small per-label rollup.

Determinism rules for float arrays (shared with
embeddings_class_separation): element arithmetic (cast float→double,
multiply, abs, divide by a scalar) is bitwise-identical across engines;
any SUM over elements or rows goes through decimal(28,6); any emitted
ratio is computed in double from those exact sums and rounded to 6 dp;
int8 codes use explicit TRUNCATION (Spark's double→int cast semantics,
``trunc()`` spelled out in the oracle) because the engines' ROUND
conventions differ at half-way points but their trunc cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import DEC
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "embedding_int8_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             nullif(list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))), 0.0) / 127.0 AS scale
      FROM embeddings
    ), codes AS (
      SELECT e.vec_id, e.label, q.scale,
             list_transform(e.embedding,
                 x -> CAST(trunc(CAST(x AS DOUBLE) / q.scale) AS BIGINT)) AS code
      FROM embeddings e JOIN q ON e.vec_id = q.vec_id
    )
    SELECT vec_id, label,
           CAST(list_sum(code) AS BIGINT) AS code_sum,
           CAST(list_max(list_transform(code, c -> abs(c))) AS BIGINT)
             AS code_max_abs
    FROM codes
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127, code
    = trunc(x/scale) ∈ [-127, 127] — the standard 4× compression for
    ANN serving tiers. Emits integer per-vector summaries (code sum and
    max |code|) that pin the whole code vector's correctness.

    Plan: pure map — two higher-order array passes (max-abs, then the
    quantize transform) fused into the scan's codegen stage. At 100 TB
    this runs at I/O speed; codes would be written back as
    array<tinyint> for a 4× footprint cut. Truncation (not rounding) is
    deliberate: both engines truncate identically, and the ≤0.5-code
    accuracy cost is irrelevant next to cross-engine half-way-rounding
    divergence."""
    e = table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    # nullif guards the all-zero vector: 0/0 would be NaN, and Spark's
    # non-ANSI NaN→bigint cast (0) diverges from DuckDB's error. With a
    # NULL scale both engines emit NULL codes identically.
    scale = F.nullif(max_abs, F.lit(0.0)) / 127.0
    code = F.transform("embedding", lambda x: (xd(x) / scale).cast("bigint"))
    return e.select(
        "vec_id",
        "label",
        F.aggregate(code, F.lit(0).cast("bigint"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        F.array_max(F.transform(code, lambda c: F.abs(c))).alias("code_max_abs"),
    )


@query(
    "embedding_matryoshka_energy",
    oracle=f"""
    WITH e AS (
      SELECT label,
             CAST(list_sum(list_transform(embedding,
                  x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                       AS DECIMAL(28,6)))) AS DECIMAL(28,6)) AS e64,
             CAST(list_sum(list_transform(embedding[1:16],
                  x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                       AS DECIMAL(28,6)))) AS DECIMAL(28,6)) AS e16
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(e16) AS DOUBLE) / CAST(SUM(e64) AS DOUBLE), 6)
             AS retained_energy_16
    FROM e GROUP BY label
    """,
)
def embedding_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation check: the fraction of L2 energy the first
    16 of 64 dimensions retain, per label — the number that decides
    whether a cheap 16-dim prefix index is good enough for first-stage
    retrieval (matryoshka representation learning's core claim).

    Element squares are bit-identical doubles cast to decimal(28,6), so
    every sum (within a vector AND across vectors) is exact and
    order-free; one double division at the end, rounded. Plan: map-side
    per-vector energies, one tiny groupBy(label) rollup — the 100 TB
    cost is the scan."""
    e = table(spark, sf_dir, "embeddings")
    sq_dec = lambda x: (x.cast("double") * x.cast("double")).cast(DEC)  # noqa: E731
    zero = F.lit(0).cast(DEC)
    # re-cast each partial sum: Spark widens decimal(28,6)+decimal(28,6)
    # to (29,6), which would no longer match the accumulator's type
    add_dec = lambda a, x: (a + x).cast(DEC)  # noqa: E731
    e64 = F.aggregate(F.transform("embedding", sq_dec), zero, add_dec)
    e16 = F.aggregate(
        F.transform(F.slice("embedding", 1, 16), sq_dec), zero, add_dec
    )
    per_vec = e.select("label", e64.alias("e64"), e16.alias("e16"))
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum("e16").cast("double") / F.sum("e64").cast("double"), 6
        ).alias("retained_energy_16"),
    )
