"""Query registry — the single source of truth for the engine surface.

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator with its name, the Spark implementation
``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry, so an operator is
"declared" to the driver iff it is registered here.

Contract (driver, __spark_entry__.py docstring): the driver compares
Spark output vs oracle output by row-count + schema + order-insensitive
value-hash with columns sorted by name — so every computed column is
aliased identically on both sides, floats that feed the hash are
rounded identically on both sides, and no query relies on row order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registration side effects run."""
    import python_etl_sample_spark.operators  # noqa: F401
    import python_etl_sample_spark.functions  # noqa: F401
    import python_etl_sample_spark.streaming  # noqa: F401
