#!/usr/bin/env python3
"""Differential oracle check: replay Verify's oracle_sql.json in DuckDB
against the same parquet tables and diff against the engine's dumps.

Usage: python3 dev/oracle_check.py <sfDir> <verifyOutDir>

(Dev-only tool — mirrors the driver's CORRECTNESS gate so builders can
self-check before a round ends. Uses the driver-side python/duckdb
stack, not the library's.)
"""
import sys, os, json
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            o = con.execute(sql).fetchdf()
            s = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            o = o.reindex(sorted(o.columns), axis=1)
            s = s.reindex(sorted(s.columns), axis=1)
            o = o.sort_values(list(o.columns)).reset_index(drop=True)
            s = s.sort_values(list(s.columns)).reset_index(drop=True)
            ok = o.shape == s.shape and list(o.columns) == list(s.columns)
            detail = f"{o.shape} vs {s.shape}"
            if ok:
                for c in o.columns:
                    if o[c].dtype.kind == "f" or s[c].dtype.kind == "f":
                        good = np.allclose(o[c].astype(float), s[c].astype(float),
                                           rtol=1e-9, atol=1e-9, equal_nan=True)
                    else:
                        good = (o[c].astype(str) == s[c].astype(str)).all()
                    if not good:
                        ok, detail = False, f"col {c}"
                        break
            if not ok:
                fails.append((name, detail))
        except Exception as e:
            fails.append((name, "ERR " + str(e)[:160]))
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".json") and name not in oracle:
            n = duckdb.connect().execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"rows-only: {name} {n}")
    for f in fails:
        print("FAIL:", f)
    print("FAILS:", len(fails), "| oracles:", len(oracle))
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
