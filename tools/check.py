#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify (sbt) at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare strictly (columns sorted by name, rows sorted,
values compared exactly — floats bitwise — to be at least as strict as
the driver's hash compare).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# iterate over the DECLARED query list (queries.json), not just the
# directories present — a query that failed before writing anything
# must show as MISSING, not silently shrink the denominator
declared_path = f"{outdir}/queries.json"
if os.path.exists(declared_path):
    declared = json.load(open(declared_path))
else:
    declared = [os.path.basename(d.rstrip("/"))
                for d in sorted(glob.glob(f"{outdir}/*/"))]
results = {}
for name in sorted(declared):
    name_dir = f"{outdir}/{name}"
    if not os.path.isdir(name_dir):
        results[name] = "MISSING"
        continue
    files = glob.glob(f"{name_dir}/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"
        continue
    got = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        results[name] = f"ROWS_ONLY({len(got)})"
        if len(got) == 0:
            results[name] = "ROWS_ONLY_EMPTY!"
        continue
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        results[name] = f"SCHEMA: got {list(g.columns)} want {list(w.columns)}"
        continue
    if len(g) != len(w):
        results[name] = f"ROWCOUNT: got {len(g)} want {len(w)}"
        continue
    # strict compare; show first diff
    mismatch = None
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a != b and not (pd.isna(a) and pd.isna(b)):
                mismatch = f"COL {c} row {i}: got {a!r} want {b!r}"
                break
        if mismatch:
            break
    results[name] = mismatch or f"OK({len(g)})"

bad = {k: v for k, v in results.items()
       if not (v.startswith("OK") or v.startswith("ROWS_ONLY("))}
# a filtered Verify run writes a marker; a partial artifact set must
# never read as a clean full gate
if os.path.exists(f"{outdir}/filtered.json"):
    print("WARNING: filtered run (filtered.json present) — "
          "NOT a full gate result")
for k in sorted(results):
    print(f"{results[k]:<50} {k}")
print(f"\n{len(results)-len(bad)}/{len(results)} pass")
sys.exit(1 if bad else 0)
