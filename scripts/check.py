#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify on an sf
dir, then compare each query's parquet against its DuckDB oracle (columns
sorted by name, rows sorted, exact values). Usage:
    python3 scripts/check.py [sfdir] [--skip-verify]
"""
import json, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = "/root/repo/target/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
    if r.returncode != 0:
        print("VERIFY FAILED:\n", tail); sys.exit(1)
    print("verify ran.")
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails, passes, rows_only = [], [], []
# Verify catches per-query errors and keeps going, so an erroring query
# simply has no output dir — surface those as hard FAILs (a fixture-schema
# refresh once silently dropped 18 event queries this way).
written = {p.name for p in Path(OUT).iterdir() if p.is_dir()}
for q in sorted(set(oracle) - written):
    fails.append(q)
    print(f"{q:24s} MISSING (query errored during Verify — see its stderr)")
for name in sorted(Path(OUT).iterdir()):
    if not name.is_dir():
        continue
    q = name.name
    spark_df = pd.read_parquet(name)
    if q not in oracle:
        status = "ROWS-ONLY"
        (rows_only if len(spark_df) > 0 else fails).append(q)
        print(f"{q:24s} {status} rows={len(spark_df)}" + (" !! EMPTY" if len(spark_df) == 0 else ""))
        continue
    try:
        duck_df = con.sql(oracle[q]).df()
    except Exception as e:
        fails.append(q); print(f"{q:24s} ORACLE-SQL-ERROR {e}"); continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        fails.append(q)
        print(f"{q:24s} SCHEMA-MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
        continue
    if len(s) != len(d):
        fails.append(q); print(f"{q:24s} ROWCOUNT spark={len(s)} duck={len(d)}"); continue
    # exact compare with dtype tolerance (int64 vs int32 etc.)
    diffs = []
    for c in s.columns:
        a, b = s[c], d[c]
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                eq = (a.fillna(-1e308) == b.fillna(-1e308))
            else:
                eq = (a.astype(str).fillna("\0") == b.astype(str).fillna("\0"))
            if not eq.all():
                idx = (~eq).idxmax()
                diffs.append((c, a[idx], b[idx], int((~eq).sum())))
        except Exception as e:
            diffs.append((c, "cmp-error", str(e), -1))
    if diffs:
        fails.append(q)
        print(f"{q:24s} VALUE-DIFF {diffs[:3]}")
    else:
        passes.append(q)
        print(f"{q:24s} OK rows={len(s)}")

print(f"\n== {len(passes)} ok, {len(rows_only)} rows-only, {len(fails)} FAIL: {fails}")
sys.exit(1 if fails else 0)
