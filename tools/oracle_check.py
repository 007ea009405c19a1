#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL
in DuckDB over the sf parquet tables, compare rows/schema/values against
the Verify parquet dump (columns sorted by name, rows sorted by all cols)."""
import duckdb, json, sys, glob
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

sql = json.load(open(f"{out}/oracle_sql.json"))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
fails = []
for name, q in sorted(sql.items()):
    if only and name not in only:
        continue
    try:
        oracle = con.execute(q).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails.append(name); continue
    spark = pq.read_table(glob.glob(f"{out}/{name}/*.parquet")[0]).to_pandas()
    o = oracle.reindex(sorted(oracle.columns), axis=1)
    s = spark.reindex(sorted(spark.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs oracle {list(o.columns)}")
        fails.append(name); continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows {len(s)} vs oracle {len(o)}")
        fails.append(name); continue
    o2 = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(o2, s2, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(s)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: values differ: {str(e).splitlines()[-1][:200]}")
        fails.append(name)
print("----")
print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
