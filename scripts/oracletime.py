#!/usr/bin/env python3
"""Time each oracle statement from a Verify dump's oracle_sql.json in DuckDB.

Usage: oracletime.py <sfDir> <verifyOutDir> [threads]
Prints per-query wall seconds sorted descending, then the total.
"""
import sys, json, glob, os, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
threads = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()
if threads:
    con.execute(f"SET threads={threads}")
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
times = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchdf()
        times[name] = time.time() - t0
    except Exception as e:
        times[name] = time.time() - t0
        print(f"ERROR {name}: {e}", flush=True)
    print(f"{times[name]:8.2f}  {name}", flush=True)
print("---- sorted ----")
for name, s in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"{s:8.2f}  {name}")
print(f"TOTAL {sum(times.values()):.1f}s over {len(times)} oracles")
