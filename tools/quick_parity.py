"""Quick single-query parity check: python tools/quick_parity.py name1,name2 [sf_dir]"""
import os, sys, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb, pandas as pd

names = sys.argv[1].split(",")
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

spark = SparkSession.builder.master("local[8]").appName("quick-parity").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
qs, osql = E.queries(), E.oracle_sql()

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(pdf):
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c].dtype): pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c].dtype): pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c].dtype): pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == object: pdf[c] = pdf[c].map(str)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)

vhash = lambda p: hashlib.md5(p.to_csv(index=False).encode()).hexdigest()

for name in names:
    spdf = qs[name](spark, sf).toPandas()
    if name not in osql:
        print(f"{name}: rows-only, {len(spdf)} rows"); continue
    dpdf = con.execute(osql[name]).df()
    a, b = norm(spdf), norm(dpdf)
    ok = vhash(a) == vhash(b)
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} spark={len(spdf)} duck={len(dpdf)}")
    if not ok:
        print("spark:\n", a.head(8).to_string())
        print("duck:\n", b.head(8).to_string())
        print("spark dtypes:", dict(a.dtypes.astype(str)))
        print("duck  dtypes:", dict(b.dtypes.astype(str)))
