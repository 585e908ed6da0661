#!/usr/bin/env python3
"""Dev-only: find WHICH read-lens combination reproduces the driver's
hash-mismatch set. For each query, compare stringified values under:
  A: spark via pandas.read_parquet  vs oracle via duckdb .fetchdf()
  B: spark via duckdb read_parquet .fetchdf()  vs oracle .fetchdf()
  C: spark via pandas.read_parquet  vs oracle via duckdb .fetchall()
  D: spark via duckdb .fetchall()   vs oracle via duckdb .fetchall()
Prints a FAIL matrix; the column matching CORRECTNESS_r02's false set
identifies the driver's compare.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def df_strs(df):
    df = df[sorted(df.columns)]
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)]

def rows_strs(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(str(r[i]) for i in order) for r in rows]

driver_false = {"q_amount_mismatch","q_fact_enrich","q_hourly_metrics","q_merge_hourly",
  "q_nested_roundtrip","q_orders_no_lineitem","q_revenue_trend","q_session_stats","q_top_products"}

print(f"{'query':28s} A B C D  driver")
for name, sql in sorted(oracle.items()):
    res_glob = f"{outdir}/{name}/*.parquet"
    spark_pd = pd.read_parquet(glob.glob(f"{outdir}/{name}")[0])
    spark_duck_df = con.execute(f"SELECT * FROM read_parquet('{res_glob}')").fetchdf()
    cur = con.execute(f"SELECT * FROM read_parquet('{res_glob}')")
    spark_cols = [d[0] for d in cur.description]; spark_rows = cur.fetchall()
    ora_df = con.execute(sql).fetchdf()
    cur = con.execute(sql)
    ora_cols = [d[0] for d in cur.description]; ora_rows = cur.fetchall()

    a = df_strs(spark_pd) == df_strs(ora_df)
    b = df_strs(spark_duck_df) == df_strs(ora_df)
    c = df_strs(spark_pd) == rows_strs(ora_cols, ora_rows)
    d = rows_strs(spark_cols, spark_rows) == rows_strs(ora_cols, ora_rows)
    mark = lambda ok: "." if ok else "F"
    print(f"{name:28s} {mark(a)} {mark(b)} {mark(c)} {mark(d)}  {'FALSE' if name in driver_false else 'true'}")
