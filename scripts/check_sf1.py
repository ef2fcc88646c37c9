#!/usr/bin/env python3
"""check.py's sf1 twin (VERDICT r13 #1: "oracle-green where the oracle
fits in DuckDB at sf1").

Differences from scripts/check.py:
  - fixture tables may be Spark-written DIRECTORIES (the sf1 derivation)
    — registered via a glob;
  - every oracle runs in its own subprocess under a per-query TIMEOUT:
    an oracle that cannot finish at sf1 (the O(n²) list-arithmetic pair
    oracles, DuckDB's recursive reach at sf1 density) is recorded as
    SKIP (oracle does not fit), never as a pass or a fail.

Usage: python3 scripts/check_sf1.py [sfDir] [outDir] [timeoutSec]
Worker mode (internal): --one <name> <sfDir> <outDir>
"""
import json, math, os, subprocess, sys
from pathlib import Path

def table_path(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def rows_eq(a, b):
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y): continue
            if x != y: return False          # exact: decimal-routed policy
        elif x != y:
            return False
    return True

def run_one(name, sf_dir, out_dir):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())[name]
    res_dir = Path(out_dir) / name
    if not res_dir.exists():
        print(f"FAIL {name}: no spark output dir"); return 1
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        got_cols, got_rows = got.columns, got.fetchall()
        want = con.sql(sql)
        want_cols, want_rows = want.columns, want.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); return 1
    errs = []
    if sorted(got_cols) != sorted(want_cols):
        errs.append(f"cols {got_cols} != {want_cols}")
    elif len(got_rows) != len(want_rows):
        errs.append(f"rows {len(got_rows)} != {len(want_rows)}")
    else:
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        wperm = [want_cols.index(c) for c in sorted(want_cols)]
        for i, (gr, wr) in enumerate(zip(got_rows, want_rows)):
            g = [gr[j] for j in gperm]; w = [wr[j] for j in wperm]
            if not rows_eq(g, w):
                errs.append(f"row {i}: {g} != {w}")
                if len(errs) > 3: break
    if errs:
        print(f"FAIL {name}: " + "; ".join(errs[:4])); return 1
    print(f"PASS {name} ({len(got_rows)} rows)"); return 0

def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], sys.argv[3], sys.argv[4]))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "target/sf1_rehearsal"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
    tmo = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", name, sf_dir, out_dir],
                timeout=tmo)
            if r.returncode == 0: n_pass += 1
            else: n_fail += 1
        except subprocess.TimeoutExpired:
            print(f"SKIP {name}: oracle exceeds {tmo}s at sf1 "
                  "(does not fit in DuckDB at this scale)")
            n_skip += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip (oracle too "
          "heavy at sf1)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
