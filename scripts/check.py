#!/usr/bin/env python3
"""Local mirror of the driver's t2 oracle gate (dev tool only — the shipped
library is pure Scala/Spark; this uses the same driver-side DuckDB the real
gate uses).

Usage: python3 scripts/check.py [sfDir] [outDir]
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run;
  2. registers each fixture parquet as a DuckDB view;
  3. runs every oracle_sql.json statement;
  4. compares row count, column names, and values against the Spark parquet
     dump (exact for non-floats; floats must match to full repr — the policy
     is that decimal-routed aggregates are bitwise equal).
"""
import json, math, sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT_DIR / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = OUT_DIR / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols, got_rows = got.columns, got.fetchall()
            want = con.sql(sql)
            want_cols, want_rows = want.columns, want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        errs = []
        if sorted(got_cols) != sorted(want_cols):
            errs.append(f"cols {got_cols} != {want_cols}")
        elif len(got_rows) != len(want_rows):
            errs.append(f"rows {len(got_rows)} != {len(want_rows)}")
        else:
            # compare by column name (driver sorts columns by name)
            gperm = [got_cols.index(c) for c in sorted(got_cols)]
            wperm = [want_cols.index(c) for c in sorted(want_cols)]
            for i, (gr, wr) in enumerate(zip(got_rows, want_rows)):
                g = [gr[j] for j in gperm]; w = [wr[j] for j in wperm]
                if not rows_eq(g, w):
                    errs.append(f"row {i}: {g} != {w}")
                    if len(errs) > 3: break
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def rows_eq(a, b):
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y): continue
            if x != y: return False          # exact: decimal-routed policy
        elif x != y:
            return False
    return True

if __name__ == "__main__":
    main()
