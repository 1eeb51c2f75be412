#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir under verifyOutDir (parquet written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sfDir tables,
then compares: row count, column names (sorted), and a hash of all values
with columns sorted by name and rows sorted canonically.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def h(df: pd.DataFrame) -> str:
    m = hashlib.sha256()
    for row in df.itertuples(index=False):
        m.update(("|".join(cell(v) for v in row) + "\n").encode())
    return m.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            bad += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: COLS spark={list(g.columns)} duck={list(e.columns)}")
            bad += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name}: ROWS spark={len(g)} duck={len(e)}")
            bad += 1
            continue
        if h(g) != h(e):
            print(f"✗ {name}: HASH mismatch")
            diff = (g.astype(str) != e.astype(str))
            idx = diff.any(axis=1)
            print("    spark:", g[idx].head(3).to_dict("records"))
            print("    duck :", e[idx].head(3).to_dict("records"))
            bad += 1
            continue
        print(f"✓ {name} rows={len(g)}")
        ok += 1
    print(f"== {ok} ok, {bad} bad ==")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
