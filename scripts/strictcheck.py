#!/usr/bin/env python3
"""Dev-only STRICT self-check emulating the driver's hash compare lens:
Spark parquet read via pandas/pyarrow, oracle via duckdb .fetchdf(),
columns sorted by name, values compared by exact str() equality.

The only tolerated representation diffs are the ones the driver's r2
results proved it normalizes: python date vs pandas Timestamp (same day)
and the NULL spellings (None/NaT/nan vs nan).

Usage: strictcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, datetime
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def norm(v):
    if v is None or v is pd.NaT:
        return "nan"
    if isinstance(v, float) and v != v:
        return "nan"
    if isinstance(v, pd.Timestamp):
        return str(v.to_pydatetime())
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return str(datetime.datetime(v.year, v.month, v.day))
    return str(v)

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    got = pd.read_parquet(res_dir)
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    bad = None
    for c in got.columns:
        gv, ev = list(got[c]), list(exp[c])
        for i, (a, b) in enumerate(zip(gv, ev)):
            if norm(a) != norm(b):
                bad = (c, i, a, type(a).__name__, b, type(b).__name__); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r}({bad[3]}) oracle={bad[4]!r}({bad[5]})"); fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
