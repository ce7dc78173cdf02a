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

def type_sig(series):
    """Normalized type signature for a column. Integer widths collapse
    (int32 == int64) and float widths collapse (float32 == float64),
    but int vs float vs bool vs object are DISTINCT — the driver hashes
    typed values, so a DuckDB HUGEINT (object/float in pandas) against a
    Spark long must fail here the way it fails there."""
    import pandas.api.types as pt
    if pt.is_bool_dtype(series):
        return "bool"
    if pt.is_integer_dtype(series):
        return "int"
    if pt.is_float_dtype(series):
        return "float"
    if pt.is_datetime64_any_dtype(series):
        return "timestamp"
    # object column: classify by first non-null element
    for v in series:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            # python int objects: HUGEINT lands here — distinct from int64
            return "pyint-object"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "str"
        return type(v).__name__
    return "all-null"

def compare(g, w):
    """Strict compare of two canon()'d frames; returns None if equal or a
    first-difference message. Types are compared per column before values."""
    if list(g.columns) != list(w.columns):
        return f"SCHEMA: got {list(g.columns)} want {list(w.columns)}"
    if len(g) != len(w):
        return f"ROWCOUNT: got {len(g)} want {len(w)}"
    for c in g.columns:
        gs, ws = type_sig(g[c]), type_sig(w[c])
        if gs != ws and "all-null" not in (gs, ws):
            return f"TYPE COL {c}: got {gs} ({g[c].dtype}) want {ws} ({w[c].dtype})"
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a != b and not (pd.isna(a) and pd.isna(b)):
                return f"COL {c} row {i}: got {a!r} want {b!r}"
    return None

def selftest():
    """The class of bug this gate exists to catch: an un-cast DuckDB
    HUGEINT (sum of integers) against Spark's int64. Must FAIL here."""
    c = duckdb.connect()
    huge = c.execute(
        "SELECT sum(x) AS s FROM (VALUES (1),(2)) t(x)").fetchdf()
    spark_like = pd.DataFrame({"s": pd.array([3], dtype="int64")})
    diff = compare(canon(spark_like), canon(huge))
    assert diff is not None and diff.startswith("TYPE"), \
        f"selftest: HUGEINT vs int64 must be a TYPE failure, got {diff!r}"
    ok = c.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1),(2)) t(x)"
    ).fetchdf()
    assert compare(canon(spark_like), canon(ok)) is None, \
        "selftest: cast BIGINT oracle must pass"
    # float-vs-int sneaks through Python == (5 == 5.0); types must not
    f = pd.DataFrame({"s": pd.array([3.0], dtype="float64")})
    diff2 = compare(canon(spark_like), canon(f))
    assert diff2 is not None and diff2.startswith("TYPE"), \
        f"selftest: float vs int must be a TYPE failure, got {diff2!r}"
    print("selftest OK: HUGEINT/float oracles fail against int64")

if "--selftest" in sys.argv:
    selftest()
    sys.exit(0)

con = duckdb.connect()
for t in TABLES:
    # driver SFs are single files; ScaleUp-written SFs (e.g. tmp/sf1)
    # are Spark part-file directories — glob those
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

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
    mismatch = compare(canon(got), canon(want))
    results[name] = mismatch or f"OK({len(got)})"

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
