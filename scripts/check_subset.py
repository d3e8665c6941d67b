#!/usr/bin/env python3
"""Fast subset mirror of check.py for optimization iteration: run
graft.Verify (via scripts/run_main, no sbt lock) with a name-prefix filter,
then oracle-compare ONLY the queries that were written. Usage:
    python3 scripts/check_subset.py <sfdir> <prefix1,prefix2,...>
"""
import json, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1]
PREFIXES = sys.argv[2]
OUT = "/root/repo/target/verify_subset"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

subprocess.run(["rm", "-rf", OUT], check=True)
r = subprocess.run(
    ["scripts/run_main", "graft.Verify", SF, OUT, PREFIXES],
    cwd="/root/repo", capture_output=True, text=True, timeout=1800)
if r.returncode != 0:
    print("VERIFY FAILED:\n", "\n".join((r.stdout + r.stderr).splitlines()[-25:]))
    sys.exit(1)
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

wanted = [q for q in sorted(oracle)
          if any(q.startswith(p) for p in PREFIXES.split(","))]
fails, passes, rows_only = [], [], []
for q in wanted:
    d = Path(OUT) / q
    if not d.is_dir():
        fails.append(q); print(f"{q:26s} MISSING"); continue
    spark_df = pd.read_parquet(d)
    try:
        duck_df = con.sql(oracle[q]).df()
    except Exception as e:
        fails.append(q); print(f"{q:26s} ORACLE ERROR {e}"); continue
    a, b = canon(spark_df), canon(duck_df)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        passes.append(q); print(f"{q:26s} OK rows={len(a)}")
    except AssertionError as e:
        fails.append(q)
        print(f"{q:26s} FAIL rows spark={len(a)} duck={len(b)}")
        print("  " + str(e).splitlines()[-1])
print(f"== {len(passes)} ok, {len(fails)} FAIL: {fails}")
sys.exit(1 if fails else 0)
