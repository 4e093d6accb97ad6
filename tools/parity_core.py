"""The parity checker itself — shared by tools/drive_contract.py and
tests/test_harness_sensitivity.py.

Both sides of every parity check (the Spark query and its DuckDB
oracle) are authored in this repo, so a systematic normalization bug
could make a WRONG pair hash-match twice.  Factoring the exact
normalize/hash/compare code here lets the mutation test
(tests/test_harness_sensitivity.py, VERDICT r13 item 2) feed
deliberately-wrong results through the SAME code path the driver-mimic
runs and assert each perturbation is flagged in the right dimension —
proving the checker can fail, not just that it passed.
"""
from __future__ import annotations

import hashlib

import pandas as pd


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    """Engine-neutral canonical form: column-name order, unified dtypes
    (us-timestamps, float64, int64, str), total row order."""
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c].dtype):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c].dtype):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c].dtype):
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    return pdf


def vhash(pdf: pd.DataFrame) -> str:
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def compare(spdf: pd.DataFrame, dpdf: pd.DataFrame) -> dict:
    """One CORRECTNESS_r{N}.json row: rows/schema/value-hash match."""
    return {
        "rows_match": len(spdf) == len(dpdf),
        "schema_match": sorted(spdf.columns) == sorted(dpdf.columns),
        "hash_match": vhash(norm(spdf)) == vhash(norm(dpdf)),
        "spark_rows": len(spdf),
        "oracle_rows": len(dpdf),
        "err": None,
    }
