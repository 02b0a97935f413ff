"""Drive the driver contract exactly as the driver does: entry() smoke,
then each queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01."""
import sys, time, duckdb, pandas as pd
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pfaedle_spark.session import get_spark

import os
SF = os.environ.get("SF", "/root/testdata/sf0.01")
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]

spark = get_spark(cores=8); spark.sparkContext.setLogLevel("ERROR")
df = E.entry(spark)
n = df.count()
print(f"entry(): {n} rows, schema: {[f.name for f in df.schema.fields]}")
assert n >= 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)

qs, osql = E.queries(), E.oracle_sql()
only = [a for a in sys.argv[1:] if not a.startswith("-")]
if only:
    qs = {k: v for k, v in qs.items() if k in only}
for name, fn in qs.items():
    t0 = time.time()
    got = norm(fn(spark, SF).toPandas())
    # the driver's value hash is dtype-sensitive: a Spark DECIMAL column
    # arrives as object-dtype Decimal and hash-fails vs DuckDB DOUBLE
    # even when values are equal — surface that locally.
    import decimal
    for c in got.columns:
        if got[c].dtype == object and got[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
            print(f"    DTYPE-HAZARD col {c}: decimal.Decimal (Spark DECIMAL inference)")
    if name not in osql:
        print(f"  {name}: {len(got)} rows (rows-only, no oracle)"); continue
    want = norm(con.execute(osql[name]).fetchdf())
    ok_cols = list(got.columns) == list(want.columns)
    ok_rows = len(got) == len(want)
    ok_vals = True
    if ok_cols and ok_rows:
        for c in got.columns:
            g, w = got[c], want[c]
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                import numpy as np
                if not np.allclose(g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True):
                    ok_vals = False; print(f"    MISMATCH col {c}")
            elif g.astype(str).tolist() != w.astype(str).tolist():
                ok_vals = False; print(f"    MISMATCH col {c}")
    verdict = "MATCH" if (ok_cols and ok_rows and ok_vals) else f"FAIL cols={ok_cols} rows={len(got)}/{len(want)} vals={ok_vals}"
    print(f"  {name}: {len(got)} rows [{time.time()-t0:.1f}s] -> {verdict}")
spark.stop()
