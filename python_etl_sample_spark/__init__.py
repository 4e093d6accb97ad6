"""python_etl_sample_spark — a PySpark-native analytics engine.

A ground-up, Spark-first engine providing the query and data-processing
capabilities of the reference repo ``joeletness/Python-ETL-Sample``
(an ETL/pipeline sample; the checkout at /root/reference is empty — see
SURVEY.md §0 — so capability scope is taken from SURVEY.md §2 and the
driver contract in BASELINE.json), plus LLM-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis), all
designed for 100 TB scale on a real cluster:

- declarative DataFrame/SQL plans → Catalyst picks physical strategies
- broadcast hints on small dimension tables, AQE on for skew/coalesce
- no driver-side collect loops anywhere in the data path
- Python only crosses the JVM boundary for Arrow-batched pandas UDFs
"""

from python_etl_sample_spark.api import entry, oracle_sql, queries

__all__ = ["entry", "queries", "oracle_sql"]
