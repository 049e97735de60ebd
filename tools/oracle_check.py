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
import argparse, json, glob, os, re, sys
import multiprocessing as mp


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# ---------------------------------------------------------------------
# Staged (semi-naive) evaluation for the recursion-bound oracles.
#
# Seven oracle DEFINITIONS (q81/q93/q110/q113/q117/q118/q128) share a
# pair-mining chain followed by either a recursive transitive-closure
# (reach/lab min-reachable-id labeling) or an unrolled PageRank whose
# CTE re-evaluation re-mines the pair set per reference. Single-shot
# DuckDB blows the 600 s / 30 GiB bounds on those at gen10 — an
# oracle-side bound, not an engine error. The staged path makes the
# same definitions evaluable: materialize the mined pair set ONCE as a
# temp table, compute the closure labels by SEMI-NAIVE iteration in
# the harness (one bounded DuckDB pass per round over the shrinking
# frontier — exactly the fixpoint the recursive CTE declares, without
# enumerating every (node, reachable-id) pair), then run the original
# tail SQL against the materialized tables. No oracle semantics
# change: the mining SQL is executed verbatim, and min-label
# propagation over symmetric edges converges to min(reachable id) =
# the recursive CTE's min(r) per node.
# ---------------------------------------------------------------------

# `edges AS (SELECT id_a AS src, id_b AS dst FROM X UNION ALL ...)` —
# the symmetric-edge CTE both oracle families build from their mined
# pair CTE (jp for the shingle pipeline, pairs for the embedding one)
EDGES_DEF = re.compile(
    r"edges AS \(SELECT id_a AS src, id_b AS dst FROM (\w+)"
    r"\s+UNION ALL SELECT id_b, id_a FROM \1\)")
# the recursive reach/lab block (byte-identical across the closure
# oracles — both are emitted from one shared CTE template)
REACH_BLOCK = re.compile(
    r"reach\(id, r\) AS \(\s*SELECT DISTINCT src, src FROM edges\s*"
    r"UNION\s*SELECT e\.src, reach\.r FROM reach JOIN edges e"
    r" ON e\.dst = reach\.id\),\s*"
    r"lab AS \(SELECT id AS doc_id, min\(r\) AS cluster_id"
    r" FROM reach GROUP BY id\)")


def staged_closure(sql):
    """Decompose a closure-pattern oracle into (pair-mining SQL,
    pair CTE name, needs_closure, final SQL over the materialized
    tables). Returns None when the SQL doesn't match the pattern."""
    m = EDGES_DEF.search(sql)
    if not m:
        return None
    base = m.group(1)
    prefix = sql[:m.start()].rstrip().rstrip(",")
    prefix = prefix.replace("WITH RECURSIVE", "WITH", 1)
    mine = f"{prefix}\nSELECT id_a, id_b FROM {base}"
    tail = sql[m.end():]  # starts with ",\n<next cte>" or the SELECT
    final = (f"WITH {base} AS (SELECT id_a, id_b FROM pairs_t),\n"
             f"edges AS (SELECT src, dst FROM edges_t){tail}")
    needs_closure = REACH_BLOCK.search(final) is not None
    if needs_closure:
        final = REACH_BLOCK.sub(
            "lab AS (SELECT id AS doc_id, r AS cluster_id FROM lab_t)",
            final, count=1)
    return mine, needs_closure, final


def run_closure_labels(con, max_rounds=1000):
    """Semi-naive min-label propagation over edges_t -> lab_t(id, r):
    each round is one bounded join of the FRONTIER (labels that
    improved last round) against the edge table; converged when the
    frontier is empty. Equivalent to the recursive CTE's
    min(reachable id) per node on the symmetric edge set."""
    con.sql("CREATE OR REPLACE TEMP TABLE lab_t AS "
            "SELECT src AS id, src AS r FROM edges_t GROUP BY src")
    con.sql("CREATE OR REPLACE TEMP TABLE frontier AS "
            "SELECT id, r FROM lab_t")
    for _ in range(max_rounds):
        con.sql("""CREATE OR REPLACE TEMP TABLE improved AS
            SELECT c.id, c.mn AS r FROM (
              SELECT e.src AS id, min(f.r) AS mn
              FROM edges_t e JOIN frontier f ON f.id = e.dst
              GROUP BY e.src) c
            JOIN lab_t l ON l.id = c.id WHERE c.mn < l.r""")
        n = con.sql("SELECT count(*) FROM improved").fetchone()[0]
        if n == 0:
            return
        con.sql("""CREATE OR REPLACE TEMP TABLE lab_t AS
            SELECT l.id, least(l.r, coalesce(i.r, l.r)) AS r
            FROM lab_t l LEFT JOIN improved i ON i.id = l.id""")
        con.sql("CREATE OR REPLACE TEMP TABLE frontier AS "
                "SELECT id, r FROM improved")
    raise RuntimeError(f"closure did not converge in {max_rounds} rounds")


# ---------------------------------------------------------------------
# Sampled (decomposed) evaluation for the banded-similarity oracle.
#
# q224's oracle replays the 16x4 banded-LSH rewrite: the signature
# CTE is |vectors| x 4096 rows, which single-shot DuckDB cannot
# evaluate at gen100 (200k vectors) inside the time bound — an
# oracle-side bound, not an engine error. The decomposition relies on
# banding being PER-VECTOR: a vector's signature/bands depend only on
# that vector, so for any vec_id sample S,
#     full_result ∩ (S × S)  ==  result of the same SQL over S only
# (a sampled pair collides in the full run iff it collides in the
# sample-only run, and the exact-cosine gate is per-pair). Replaying
# the oracle over a deterministic 1/41 vec_id sample and comparing
# against the engine rows where BOTH ids are in the sample is
# therefore an EXACT equality check on the restricted set — a
# decomposed oracle, not an approximation. O((n/41)^2) per band
# bucket keeps DuckDB inside the bound.
# ---------------------------------------------------------------------

SAMPLED_ORACLES = {
    "q224_simjoin_sql_large": {
        "sub": ("FROM embeddings)", "FROM embeddings WHERE vec_id % 41 = 0)"),
        "got_filter": "id_a % 41 == 0 and id_b % 41 == 0",
        "note": "sampled decomposed oracle: 1/41 vec_ids, exact on subset",
    },
    # same per-vector banding argument, wide (216-bit) geometry
    "q225_simjoin_wide_band": {
        "sub": ("FROM embeddings)", "FROM embeddings WHERE vec_id % 41 = 0)"),
        "got_filter": "id_a % 41 == 0 and id_b % 41 == 0",
        "note": "sampled decomposed oracle: 1/41 vec_ids, exact on subset",
    },
}


def sampled_rewrite(name, sql):
    """Rewrite `sql` to its deterministic-sample form, or None when
    the query has no registered decomposition (or the pattern no
    longer matches — fail loudly via None -> original TIMEOUT)."""
    spec = SAMPLED_ORACLES.get(name)
    if spec is None:
        return None
    old, new = spec["sub"]
    if sql.count(old) != 1:
        return None
    return sql.replace(old, new, 1)


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


def run_oracle(sf_dir, sql, temp_cap_gib, q, staged=False):
    """Child-process entry: evaluate one oracle, ship the frame back.
    staged=True takes the semi-naive decomposition path instead of
    handing the whole statement to DuckDB in one shot."""
    import duckdb
    try:
        con = connect(sf_dir, temp_cap_gib)
        if staged:
            mine, needs_closure, final = staged_closure(sql)
            con.sql(f"CREATE OR REPLACE TEMP TABLE pairs_t AS {mine}")
            con.sql("CREATE OR REPLACE TEMP TABLE edges_t AS "
                    "SELECT id_a AS src, id_b AS dst FROM pairs_t "
                    "UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs_t")
            if needs_closure:
                run_closure_labels(con)
            q.put(("ok", norm(con.sql(final).df())))
        else:
            q.put(("ok", norm(con.sql(sql).df())))
    except duckdb.OutOfMemoryException as e:
        # the TYPE the spill cap raises (max_temp_directory_size /
        # failed-to-offload land here), not a substring of arbitrary
        # errors: an unrelated DuckDB failure whose message happens to
        # mention those strings stays a FAIL
        q.put(("capped", f"{type(e).__name__}: {e}"))
    except Exception as e:
        q.put(("err", f"{type(e).__name__}: {e}"))


def child_eval(sf_dir, sql, timeout, temp_cap_gib, staged):
    q = mp.Queue()
    proc = mp.Process(target=run_oracle,
                      args=(sf_dir, sql, temp_cap_gib, q, staged))
    proc.start()
    try:
        kind, payload = q.get(timeout=timeout)
        proc.join(5)
        return kind, payload
    except Exception:
        proc.terminate()
        proc.join(5)
        return "timeout", None


def oracle_df(sf_dir, sql, timeout, temp_cap_gib, shared_con,
              iter_timeout=None, name=None):
    """Evaluate an oracle, optionally in a killable child process.
    When the single-shot evaluation exceeds the time/spill bound,
    retry on the staged semi-naive path (closure-pattern oracles) or
    the sampled decomposition (SAMPLED_ORACLES), each with its own,
    more generous timeout: the bound is a property of single-shot
    evaluation, not of the oracle's semantics."""
    if not timeout:
        return "ok", norm(shared_con.sql(sql).df())
    kind, payload = child_eval(sf_dir, sql, timeout, temp_cap_gib, False)
    if kind in ("timeout", "capped"):
        if staged_closure(sql) is not None:
            kind2, payload2 = child_eval(sf_dir, sql,
                                         iter_timeout or timeout,
                                         temp_cap_gib, True)
            if kind2 == "ok":
                return "ok_iter", payload2
            return kind, payload  # report the original bound
        sampled = sampled_rewrite(name, sql)
        if sampled is not None:
            kind2, payload2 = child_eval(sf_dir, sampled,
                                         iter_timeout or timeout,
                                         temp_cap_gib, False)
            if kind2 == "ok":
                return "ok_sampled", payload2
            return kind, payload  # report the original bound
    return kind, payload


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
    ap.add_argument("--iter-timeout", type=float, default=1800.0,
                    help="per-oracle seconds for the staged semi-naive "
                         "retry of closure-pattern oracles (default 1800)")
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
                              args.temp_cap, shared_con, args.iter_timeout,
                              name)
        iter_note = ""
        if kind == "ok_iter":
            kind, iter_note = "ok", " [staged semi-naive oracle]"
        if kind == "ok_sampled":
            # exact compare restricted to the deterministic sample:
            # keep only engine rows where every id is in-sample
            spec = SAMPLED_ORACLES[name]
            got = got.query(spec["got_filter"]).reset_index(drop=True)
            kind, iter_note = "ok", f" [{spec['note']}]"
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
            print(f"PASS {name} ({len(got)} rows){iter_note}", flush=True)
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
