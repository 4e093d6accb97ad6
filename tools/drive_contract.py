"""Mimic the driver: plain session, import __spark_entry__, smoke + oracle compare."""
import os, sys, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb, pandas as pd

spark = SparkSession.builder.master("local[8]").appName("driver-mimic").getOrCreate()  # NO special configs
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print("entry rows:", len(rows), "schema:", df.schema.simpleString()[:120])
assert len(rows) > 0

qs, osql = E.queries(), E.oracle_sql()
print("declared:", len(qs), "with oracle:", len(osql))

def norm(pdf):
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c].dtype): pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c].dtype): pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c].dtype): pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == object: pdf[c] = pdf[c].map(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf

def vhash(pdf):
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()

sf = __import__("os").environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

only = __import__("os").environ.get("PARITY_ONLY")
names = sorted(qs) if not only else [n for n in sorted(qs) if n in set(only.split(","))]
ok = bad = 0
results = {}
for name in names:
    spdf = qs[name](spark, sf).toPandas()
    if name not in osql:
        print(f"  {name}: rows-only, {len(spdf)} rows")
        results[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                         "spark_rows": len(spdf), "oracle_rows": None, "err": "no_oracle"}
        continue
    dpdf = con.execute(osql[name]).df()
    hs, hd = vhash(norm(spdf)), vhash(norm(dpdf))
    status = "MATCH" if hs == hd else "MISMATCH"
    ok += hs == hd; bad += hs != hd
    print(f"  {name}: {status} ({len(spdf)} rows)")
    results[name] = {"rows_match": len(spdf) == len(dpdf),
                     "schema_match": sorted(spdf.columns) == sorted(dpdf.columns),
                     "hash_match": hs == hd,
                     "spark_rows": len(spdf), "oracle_rows": len(dpdf), "err": None}
print(f"hash-match {ok}, mismatch {bad}")
# full-coverage artifact in the driver's CORRECTNESS format (the driver's
# own artifact caps at 50 entries; this records every query, same check)
out = __import__("os").environ.get("PARITY_OUT")
if out and not only:
    import json
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)
spark.stop()
sys.exit(1 if bad else 0)
