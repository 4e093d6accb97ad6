"""Parquet table loader + normalization layer (SURVEY.md §7 M0).

The one semantic normalization this engine needs at load time
(FIXTURES.md): ``events.ts`` must come out as ``timestamp_ntz``
whatever physical unit the fixture generation used. The driver has
shipped the column both as timestamp[ns] (rounds 1-3 — Spark reads it
as bigint nanos under ``nanosAsLong=true``; convert via
**integer-division** microseconds ``ts div 1000``, value-exact against
DuckDB) and as timestamp[us] (round 4+ — Spark reads it natively as
TIMESTAMP_NTZ; no conversion). The loader branches on the LOADED type,
not on an assumption about the file, so either vintage of fixture
works unmodified.

Scale note: loading is purely lazy — each table is a parquet scan plan,
so Catalyst column-pruning/predicate-pushdown reach the scan. No
caching or materialization happens here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from python_etl_sample_spark.session import ensure_session_configs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a lazy DataFrame, normalized."""
    ensure_session_configs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        if isinstance(df.schema["ts"].dataType, LongType):
            # timestamp[ns] fixture read as bigint nanos (nanosAsLong)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all ten fixture tables; keys per FIXTURES.md."""
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views for the SQL path."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
