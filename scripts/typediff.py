#!/usr/bin/env python3
"""Dev-only: diff the ARROW schema of Spark's parquet output vs the DuckDB
oracle result, per query. A hash compare that stringifies typed values is
sensitive to exactly these divergences (tz-aware vs naive timestamps,
int64 vs hugeint, decimal scale), which value-tolerant compares miss.

Usage: typediff.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); continue
    spark_schema = pq.read_table(files[0]).schema
    try:
        exp = con.execute(sql).arrow()
    except Exception as e:
        print(f"{name}: oracle error {e}"); continue
    sp = {f.name: str(f.type) for f in spark_schema}
    ora = {f.name: str(f.type) for f in exp.schema}
    diffs = []
    for c in sorted(set(sp) | set(ora)):
        a, b = sp.get(c, "<absent>"), ora.get(c, "<absent>")
        if a != b:
            diffs.append(f"  {c}: spark={a} oracle={b}")
    if diffs:
        print(f"DIFF {name}:")
        print("\n".join(diffs))
    else:
        print(f"same {name}")
