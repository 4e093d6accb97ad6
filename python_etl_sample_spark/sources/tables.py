"""Parquet table loader + normalization layer (SURVEY.md §7 M0).

The one semantic normalization this engine needs at load time
(FIXTURES.md): ``events.ts`` arrives as bigint nanoseconds (because
Spark reads timestamp[ns] parquet as long under
``nanosAsLong=true``) and is converted to ``timestamp_ntz`` via
**integer-division** microseconds — ``ts div 1000`` — which is
value-exact against DuckDB's native read of the same column (verified;
plain ``/`` would round through double and drift at ns scale).

Scale note: loading is purely lazy — each table is a parquet scan plan,
so Catalyst column-pruning/predicate-pushdown reach the scan. No
caching or materialization happens here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
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
