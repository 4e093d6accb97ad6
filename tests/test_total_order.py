"""functions/total_order.py — the range-partitioned exact total order
(VERDICT r5 item 2). Property: for ANY partition count, the kernel's
global rank / running sum / ntile must equal the single-window answer
bit-for-bit, because offsets are exact counts independent of where the
sampled range boundaries land."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.total_order import (
    attach_global_order,
    ntile_from_rank,
)


def _fixture(spark, n=1000):
    # deterministic pseudo-random values with heavy ties on v; (v, k)
    # is the unique total order
    rows = [Row(k=i, v=(i * 2654435761) % 97, w=(i * 40503) % 1000) for i in range(n)]
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("nparts", [1, 3, 8, 64])
def test_rank_and_cumsum_match_single_window(spark, nparts):
    df = _fixture(spark)
    got = attach_global_order(
        df,
        [F.asc("v"), F.asc("k")],
        rn="rn",
        cumsums=[("w", "cw")],
        num_partitions=nparts,
    )
    w = Window.orderBy("v", "k")
    want = df.select(
        "k",
        F.row_number().over(w).alias("rn"),
        F.sum("w")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
    )
    g = {r["k"]: (r["rn"], r["cw"]) for r in got.select("k", "rn", "cw").collect()}
    e = {r["k"]: (r["rn"], r["cw"]) for r in want.collect()}
    assert g == e


def test_descending_and_null_ordering(spark):
    rows = [Row(k=i, v=None if i % 7 == 0 else float(i % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = attach_global_order(
        df, [F.desc_nulls_last("v"), F.asc("k")], rn="rn", num_partitions=8
    )
    w = Window.orderBy(F.desc_nulls_last("v"), F.asc("k"))
    want = df.select("k", F.row_number().over(w).alias("rn"))
    assert {(r["k"], r["rn"]) for r in got.select("k", "rn").collect()} == {
        (r["k"], r["rn"]) for r in want.collect()
    }


def test_fewer_rows_than_partitions(spark):
    df = spark.createDataFrame([Row(k=i) for i in range(3)])
    got = attach_global_order(df, [F.asc("k")], rn="rn", num_partitions=32)
    assert sorted((r["k"], r["rn"]) for r in got.collect()) == [
        (0, 1),
        (1, 2),
        (2, 3),
    ]


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (17, 5), (100, 8), (99, 8)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    df = spark.createDataFrame([Row(i=i) for i in range(1, n + 1)])
    w = Window.orderBy("i")
    want = {r["i"]: r["t"] for r in df.select("i", F.ntile(k).over(w).alias("t")).collect()}
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", ntile_from_rank(F.col("i"), F.lit(n), k).alias("t")
        ).collect()
    }
    assert got == want


def test_rank_survives_pruned_passenger_columns(spark):
    """Round-10 regression pin: a passenger column consumed by only ONE
    of the kernel's two internal branches used to defeat ReuseExchange
    (column pruning made the two range exchanges canonically different),
    so local ranks and offsets composed across two independently-sampled
    boundary sets — duplicate global ranks, wrong order (caught via a
    wrong Theil–Sen median). The kernel now pins one materialization;
    this input reproduces the old failure shape: a wide-ish frame built
    from an exploded array with a passenger column the offsets branch
    never needs."""
    from pyspark.sql import functions as F

    n = 5000
    base = spark.range(1).select(
        F.lit(12345).alias("passenger"),
        F.sequence(F.lit(0), F.lit(n - 1)).alias("a"),
    )
    df = base.select(
        "passenger", F.explode("a").alias("k")
    ).select(
        "passenger",
        "k",
        ((F.col("k") * 2654435761) % 1000003).cast("double").alias("v"),
    )
    got = attach_global_order(df, [F.asc("v"), F.asc("k")], rn="rn", total_count="m")
    w = Window.orderBy("v", "k")
    want = df.select("k", F.row_number().over(w).alias("rn"))
    g = {r["k"]: r["rn"] for r in got.select("k", "rn").collect()}
    e = {r["k"]: r["rn"] for r in want.collect()}
    assert g == e
    ms = got.select("m").distinct().collect()
    assert len(ms) == 1 and ms[0]["m"] == n
