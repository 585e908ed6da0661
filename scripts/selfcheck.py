#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB-oracle compare.

Usage: selfcheck.py <sfDir> <verifyOutDir>
Loads each <outDir>/<name> parquet (Spark result), runs the matching SQL
from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts columns by
name, and compares row count, column names, and values.
"""
import sys, json, glob, os, math
import duckdb
from decimal import Decimal

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
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
            if isinstance(a, float) and isinstance(b, float):
                ok = (math.isnan(a) and math.isnan(b)) or a == b
            elif isinstance(a, Decimal) or isinstance(b, Decimal):
                ok = Decimal(str(a)) == Decimal(str(b))
            else:
                ok = str(a) == str(b)
            if not ok:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}"); fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
# a Verify SUBSET dump rewrites oracle_sql.json with only the filtered
# queries; result dirs not covered by the oracle mean this check is NOT
# validating everything sitting in outDir — say so loudly
extra = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)) and d not in oracle)
if extra:
    print(f"NOTE: {len(extra)} result dirs not in oracle_sql.json "
          f"(rows-only queries are expected here; MANY names means a "
          f"subset dump was reused): {', '.join(extra[:5])}"
          + (" ..." if len(extra) > 5 else ""))
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
