"""Run the driver_sim compare for a named subset of registry queries:
`python tools/check_subset.py q1 q2 ...` — same sf0.01 data, same
valhash (sorted columns, floats 9dp, timestamps ms) as driver_sim."""
import sys, hashlib
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from sparkstreaming_spark.session import get_spark

spark = get_spark("subset-check")
con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def valhash(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    import pandas as pd
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.floor("ms")
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(9)
    rows = sorted(tuple(str(v) for v in r) for r in pdf.itertuples(index=False))
    return hashlib.sha256(str(rows).encode()).hexdigest()[:16]


qs, oracles = e.queries(), e.oracle_sql()
fails = 0
for name in sys.argv[1:]:
    if name not in qs:
        print(f"MISSING {name}")
        fails += 1
        continue
    spdf = qs[name](spark, SF).toPandas()
    if name in oracles:
        dpdf = con.sql(oracles[name]).df()
        cnt = len(spdf) == len(dpdf)
        cols = sorted(spdf.columns) == sorted(dpdf.columns)
        h = valhash(spdf) == valhash(dpdf)
        status = "OK " if (cnt and cols and h) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status} {name}: rows {len(spdf)}/{len(dpdf)} cols={cols} hash={h}")
    else:
        print(f"rows-only {name}: {len(spdf)} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
