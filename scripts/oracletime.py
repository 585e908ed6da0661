#!/usr/bin/env python3
"""Time each oracle statement from a Verify dump's oracle_sql.json in DuckDB,
and ENFORCE the oracle budget (the r12 empty-gate regression guard).

Usage: oracletime.py <sfDir> <verifyOutDir> [threads]
Prints per-query wall seconds sorted descending, then the total, then exits
NONZERO if any single statement exceeds PER_STATEMENT_CEILING_S or the total
exceeds TOTAL_CEILING_S (or any statement errors).

Why ceilings: the r12 correctness gate came back EMPTY ({}) because the full
Verify+DuckDB pipeline had quietly outgrown the driver's wall budget
(~27 min). r13 fixed the then-current suite (heaviest 8.9 s, total 66 s)
but nothing stopped a future query from re-crossing the line — this script
is that stop. Run it (sf0.01 dump) before ending a round, next to PlanAudit;
a new oracle that trips it must be restructured (AS MATERIALIZED fences,
smaller fixed slice, fewer unrolled rounds), not waved through.
"""
import sys, json, glob, os, time
import duckdb

PER_STATEMENT_CEILING_S = 10.0
TOTAL_CEILING_S = 150.0

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
errors = 0
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchdf()
        times[name] = time.time() - t0
        # min-of-2 ONLY for a statement whose first rep breaches the
        # ceiling: the first touch pays page-cache/IO noise that is a
        # property of the box, not the statement (Bench's min-of-reps
        # discipline). A statement that breaches on BOTH reps is a real
        # budget violation; re-running everything would double the
        # guard's wall for nothing.
        if times[name] > PER_STATEMENT_CEILING_S:
            # own try: a rep-2 failure must fall back to the rep-1
            # measurement (the statement DID succeed once — it may fail
            # the ceiling, but it is not an errored oracle)
            try:
                t1 = time.time()
                con.execute(sql).fetchdf()
                times[name] = min(times[name], time.time() - t1)
            except Exception:
                pass
    except Exception as e:
        # an errored statement is excluded from times[] entirely: its
        # elapsed wall would otherwise also trip the per-statement and
        # total ceilings, stacking overlapping violations on one root
        # cause (the errors counter already fails the run on its own)
        errors += 1
        print(f"ERROR {name}: {e} ({time.time() - t0:.2f}s elapsed)", flush=True)
        continue
    print(f"{times[name]:8.2f}  {name}", flush=True)
print("---- sorted ----")
for name, s in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"{s:8.2f}  {name}")
total = sum(times.values())
print(f"TOTAL {total:.1f}s over {len(times)} timed oracles ({errors} errored, untimed)")

# --- budget enforcement (nonzero exit so CI/checklists fail loudly) ---
over = {n: s for n, s in times.items() if s > PER_STATEMENT_CEILING_S}
violations = []
if over:
    for n, s in sorted(over.items(), key=lambda kv: -kv[1]):
        violations.append(
            f"per-statement ceiling {PER_STATEMENT_CEILING_S:.0f}s exceeded: "
            f"{n} took {s:.1f}s")
if total > TOTAL_CEILING_S:
    violations.append(
        f"total ceiling {TOTAL_CEILING_S:.0f}s exceeded: suite took {total:.1f}s")
if errors:
    violations.append(f"{errors} oracle statement(s) errored")
if violations:
    print("BUDGET FAIL")
    for v in violations:
        print(f"  {v}")
    sys.exit(1)
print(f"BUDGET OK (per-statement <= {PER_STATEMENT_CEILING_S:.0f}s, "
      f"total <= {TOTAL_CEILING_S:.0f}s)")
