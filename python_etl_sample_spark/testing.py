"""Shift-left parity harness (SURVEY.md §5.4).

Replicates the driver's t2 check locally: run a registered query on
Spark and its oracle SQL on DuckDB over the same parquet fixtures, then
compare row-count + column names + order-insensitive values (columns
sorted by name, rows sorted by all columns). Exact equality is the
default — the driver hashes values, so "close" is not good enough.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

try:
    import duckdb
except ImportError:  # pragma: no cover
    duckdb = None

from python_etl_sample_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str):
    """A DuckDB connection with the ten fixture views registered, as the
    driver registers them (FIXTURES.md 'Oracle registration')."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for col in pdf.columns:
        dt = pdf[col].dtype
        if pd.api.types.is_datetime64_any_dtype(dt):
            pdf[col] = pdf[col].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(dt):
            pdf[col] = pdf[col].astype("float64")
        elif pd.api.types.is_integer_dtype(dt):
            pdf[col] = pdf[col].astype("int64")
        elif dt == object:
            # decimals / lists: stringify for stable comparison
            head = pdf[col].dropna()
            if len(head) and not isinstance(head.iloc[0], str):
                pdf[col] = pdf[col].map(lambda v: str(v))
    sort_cols = list(pdf.columns)
    if sort_cols:
        pdf = pdf.sort_values(by=sort_cols, kind="mergesort").reset_index(drop=True)
    return pdf


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "?") -> None:
    """Assert the two results are equivalent under the driver's rules."""
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(s.columns) == list(d.columns), (
        f"[{name}] column mismatch: spark={list(s.columns)} duck={list(d.columns)}"
    )
    assert len(s) == len(d), f"[{name}] row count: spark={len(s)} duck={len(d)}"
    for col in s.columns:
        assert s[col].dtype == d[col].dtype, (
            f"[{name}] dtype mismatch in {col!r}: spark={s[col].dtype} "
            f"duck={d[col].dtype} (e.g. DuckDB SUM(int)->HUGEINT needs CAST AS BIGINT)"
        )
    for col in s.columns:
        both_na = (s[col].isna() & d[col].isna()).to_numpy()
        sv, dv = s[col].to_numpy(), d[col].to_numpy()
        with np.errstate(invalid="ignore"):
            eq = (sv == dv) | both_na
        if not np.all(eq):
            bad = np.nonzero(~eq)[0][:5]
            raise AssertionError(
                f"[{name}] value mismatch in column {col!r} at sorted rows "
                f"{bad.tolist()}: spark={sv[bad].tolist()} duck={dv[bad].tolist()}"
            )


def run_parity(spark, sf_dir: str, spec) -> int:
    """Run one QuerySpec on both engines and compare. Returns row count."""
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0
        return len(spark_pdf)
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(spec.oracle).df()
    finally:
        con.close()
    compare_frames(spark_pdf, duck_pdf, name=spec.name)
    return len(spark_pdf)
