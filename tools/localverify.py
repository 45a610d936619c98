#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: tools/localverify.py <sfDir> <outDir> [--timeout N] [query ...]

--timeout N caps each DuckDB oracle at N seconds (duckbench's interrupt
pattern) and reports the statement as TIMEOUT instead of blocking the
sweep — for scale fixtures (10x/30x) where a handful of oracles are
infeasible in DuckDB; those rows are "not comparable", not failures.

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs + <outDir>/oracle_sql.json. Runs each oracle
SQL in DuckDB against the sfDir parquet tables and compares row count,
sorted-by-name schema, and a canonical hash of the values.
"""
import sys, json, glob, hashlib, threading, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    # pandas frame -> canonical text: columns sorted by name, rows sorted
    import pandas as pd
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None or v != v: return "NULL"
        if isinstance(v, float):
            return repr(round(v, 4))
        return str(v)
    rows = ["\t".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest(), len(rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    cap = None
    if rest and rest[0] == "--timeout":
        cap = float(rest[1]); rest = rest[2:]
    only = set(rest)
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written directory of part files
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    timeouts = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        hit = []
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            # per-oracle CURSOR (own connection, shared catalog): a timer
            # that fires in the race window after statement completion
            # interrupts only this abandoned cursor, never the next
            # statement — the done-flag alone narrowed but could not
            # close that window (ADVICE r12)
            cur = con.cursor()
            timer = None
            done = []
            if cap:
                timer = threading.Timer(
                    cap, lambda: None if done else (hit.append(1), cur.interrupt()))
                timer.start()
            try:
                want = cur.sql(oracle[name]).df()
            finally:
                done.append(1)
                if timer: timer.cancel()
                cur.close()
        except Exception as e:
            if hit:
                print(f"TIMEOUT {name}: oracle exceeded {cap:.0f}s (not comparable)")
                timeouts += 1
                continue
            print(f"FAIL {name}: {e}"); fails += 1; continue
        gs = sorted(zip(got.columns, [str(t) for t in got.dtypes]))
        ws = sorted(zip(want.columns, [str(t) for t in want.dtypes]))
        gh, gn = canon(got); wh, wn = canon(want)
        ok = gh == wh and gs == ws
        if not ok:
            fails += 1
            print(f"FAIL {name}: rows {gn} vs {wn}, schema_eq={gs==ws}, hash_eq={gh==wh}")
            if gs != ws:
                print(f"  spark:  {gs}\n  duckdb: {ws}")
            if gn and wn and gs == ws:
                import pandas as pd
                g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
                w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
                if len(g) == len(w):
                    diff = (g != w) & ~(g.isna() & w.isna())
                    bad = diff.any(axis=1)
                    print("  first diffs:")
                    print(pd.concat([g[bad].head(3), w[bad].head(3)], keys=["spark","duckdb"]))
        else:
            print(f"OK   {name}: rows={gn}")
    tail = f" ({timeouts} oracle timeouts, not comparable)" if timeouts else ""
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}{tail}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
