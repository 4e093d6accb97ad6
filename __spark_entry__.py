"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``python_etl_sample_spark`` package; each
operator registers itself (with its oracle SQL) in
``python_etl_sample_spark.registry`` — see SURVEY.md §2 for the
inventory.
"""

from __future__ import annotations

from python_etl_sample_spark.api import entry, oracle_sql, queries

__all__ = ["entry", "queries", "oracle_sql"]
