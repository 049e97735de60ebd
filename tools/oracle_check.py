#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet under <outDir>, executes the matching
oracle SQL from oracle_sql.json in DuckDB (views over the same test
parquet tables), sorts columns by name, and compares values exactly
(strict: no hash, full value-by-value diff with row order).

Usage: python3 tools/oracle_check.py <sfDir> <outDir> \
           [--timeout SECS] [--only q185,q192] [--temp-cap GiB]

--timeout runs each oracle in its own process and reports TIMEOUT
rows separately from FAILs: at gen-corpus scale a few oracle
DEFINITIONS (recursive/all-pairs SQL) exceed what single-node DuckDB
can evaluate in reasonable time — that is an oracle-side bound, not
an engine error, and the scale pins record it as such. --temp-cap
bounds DuckDB's spill directory so a runaway oracle errors loudly
instead of filling the disk (a gen10 run was observed at 66 GB of
spill before the cap existed).
"""
import argparse, json, glob, os, sys
import multiprocessing as mp


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir, temp_cap_gib):
    import duckdb
    con = duckdb.connect()
    con.sql(f"SET temp_directory='{os.path.abspath('.oracle_tmp')}'")
    con.sql(f"SET max_temp_directory_size='{temp_cap_gib}GiB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. GenData output)
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{p}')")
    return con


def norm(df):
    return df[sorted(df.columns)].reset_index(drop=True)


def run_oracle(sf_dir, sql, temp_cap_gib, q):
    """Child-process entry: evaluate one oracle, ship the frame back."""
    import duckdb
    try:
        con = connect(sf_dir, temp_cap_gib)
        q.put(("ok", norm(con.sql(sql).df())))
    except duckdb.OutOfMemoryException as e:
        # the TYPE the spill cap raises (max_temp_directory_size /
        # failed-to-offload land here), not a substring of arbitrary
        # errors: an unrelated DuckDB failure whose message happens to
        # mention those strings stays a FAIL
        q.put(("capped", f"{type(e).__name__}: {e}"))
    except Exception as e:
        q.put(("err", f"{type(e).__name__}: {e}"))


def oracle_df(sf_dir, sql, timeout, temp_cap_gib, shared_con):
    """Evaluate an oracle, optionally in a killable child process."""
    if not timeout:
        return "ok", norm(shared_con.sql(sql).df())
    q = mp.Queue()
    proc = mp.Process(target=run_oracle, args=(sf_dir, sql, temp_cap_gib, q))
    proc.start()
    try:
        kind, payload = q.get(timeout=timeout)
        proc.join(5)
        return kind, payload
    except Exception:
        proc.terminate()
        proc.join(5)
        return "timeout", None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--timeout", type=float, default=None,
                    help="per-oracle seconds; exceeded -> TIMEOUT row")
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name prefixes")
    ap.add_argument("--temp-cap", type=float, default=30.0,
                    help="DuckDB spill cap in GiB (default 30)")
    args = ap.parse_args()

    import pandas as pd
    shared_con = None if args.timeout else connect(args.sf_dir, args.temp_cap)
    oracle = json.load(open(f"{args.out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    if args.only:
        prefixes = args.only.split(",")
        names = [n for n in names if any(n.startswith(p) for p in prefixes)]
    n_pass = n_fail = n_timeout = 0
    for name in names:
        res_dir = f"{args.out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet", flush=True)
            n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            n_fail += 1
            continue
        kind, exp = oracle_df(args.sf_dir, oracle[name], args.timeout,
                              args.temp_cap, shared_con)
        if kind == "timeout":
            print(f"TIMEOUT {name}: oracle exceeded {args.timeout}s "
                  "(oracle-side bound, engine result was produced)",
                  flush=True)
            n_timeout += 1
            continue
        if kind == "capped":
            # the spill cap (duckdb.OutOfMemoryException), not a wrong
            # answer: the oracle's own definition exceeds single-node
            # evaluation at this scale — same class as TIMEOUT
            print(f"TIMEOUT {name}: oracle hit the spill cap "
                  "(oracle-side bound, engine result was produced)",
                  flush=True)
            n_timeout += 1
            continue
        if kind == "err":
            print(f"FAIL {name}: {exp}", flush=True)
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs "
                  f"{list(exp.columns)}", flush=True)
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}", flush=True)
            n_fail += 1
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
            print(f"FAIL {name}: " + "; ".join(bad[:3]), flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} timeout")
    # distinct exit codes so sweeps can't read a bounded run as fully
    # green: 0 = every oracle evaluated and passed; 1 = at least one
    # FAIL; 2 = no FAILs but TIMEOUT/spill-cap rows were present
    if n_fail:
        return 1
    return 2 if n_timeout else 0


if __name__ == "__main__":
    sys.exit(main())
