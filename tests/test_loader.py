"""Loader/normalization checks (SURVEY.md §7 M0, FIXTURES.md schemas)."""

from __future__ import annotations

from python_etl_sample_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"

EXPECTED_ROWS = {
    "region": 5,
    "nation": 25,
    "customer": 150,
    "supplier": 10,
    "part": 200,
    "orders": 1500,
    "lineitem": 6000,
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}


def test_row_counts(spark):
    tables = load_tables(spark, SF_DIR)
    for name, expected in EXPECTED_ROWS.items():
        assert tables[name].count() == expected, name


def test_events_ts_normalized(spark):
    ev = load_tables(spark, SF_DIR)["events"]
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    row = ev.orderBy("event_id").first()
    assert str(row["ts"]) == "2024-01-01 00:09:58.778549"


def test_date_columns_are_ntz(spark):
    tables = load_tables(spark, SF_DIR)
    assert dict(tables["orders"].dtypes)["o_orderdate"] == "timestamp_ntz"
    assert dict(tables["lineitem"].dtypes)["l_shipdate"] == "timestamp_ntz"


def test_embeddings_dim(spark):
    from pyspark.sql import functions as F

    emb = load_tables(spark, SF_DIR)["embeddings"]
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]
