#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL on the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Dev-only tool (the shipped library is pure Scala); mirrors what the driver
does so oracle-SQL mistakes are caught before the round gate runs.
"""
import json, os, sys, glob
import duckdb

def norm(df):
    # sort columns by name, then rows by all values — order-insensitive compare
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failed = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            status = f"rows-only: {len(got)} rows"
            if len(got) == 0:
                failed.append(name); status += "  EMPTY!"
            print(f"[{name}] {status}")
            continue
        exp = con.sql(oracle[name]).df()
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            failed.append(name)
            print(f"[{name}] SCHEMA MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
            continue
        if len(g) != len(e):
            failed.append(name)
            print(f"[{name}] ROWCOUNT MISMATCH spark={len(g)} duck={len(e)}")
            continue
        if not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            failed.append(name)
            print(f"[{name}] VALUE MISMATCH in {int(bad.sum())}/{len(g)} rows")
            print("  spark:", g[bad].head(3).to_dict("records"))
            print("  duck :", e[bad].head(3).to_dict("records"))
            continue
        print(f"[{name}] OK ({len(g)} rows)")
    print("FAILED:" if failed else "ALL OK", failed if failed else "")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
