#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet under <outDir>, executes the matching
oracle SQL from oracle_sql.json in DuckDB (views over the same test
parquet tables), sorts columns by name, and compares values exactly
(strict: no hash, full value-by-value diff with row order).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. GenData output)
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1
            continue
        # exact value compare, column by column
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                gn, en = pd.isna(g), pd.isna(e)
                eq = (gn & en) | (~gn & ~en
                      & (g.astype(object).where(~gn, None)
                         == e.astype(object).where(~en, None)))
            except Exception:
                eq = pd.Series([False] * len(g))
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}[row {i}]: {g.iloc[i]!r} != {e.iloc[i]!r} "
                           f"(dtypes {g.dtype}/{e.dtype})")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
