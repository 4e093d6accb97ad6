"""Operator inventory (SURVEY.md §2) — importing a module registers its queries."""

from python_etl_sample_spark.operators import (  # noqa: F401
    analytics,
    aggregates,
    dedup,
    event_sequences,
    graph,
    joins,
    multimodal,
    profiling,
    projections,
    reshape,
    scans,
    setops,
    sql_extras,
    subqueries,
    similarity,
    sorts,
    statistics,
    text_analysis,
    udfs,
    windows,
)
