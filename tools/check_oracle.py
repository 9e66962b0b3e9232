#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read graft.Verify output
(parquet per query + oracle_sql.json), run each oracle in DuckDB over the
same sf dir, canonicalize (columns sorted by name), and diff.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        mine = mine.reindex(sorted(mine.columns), axis=1)
        ref = ref.reindex(sorted(ref.columns), axis=1)
        problems = []
        if list(mine.columns) != list(ref.columns):
            problems.append(f"schema: mine={list(mine.columns)} ref={list(ref.columns)}")
        elif len(mine) != len(ref):
            problems.append(f"rows: mine={len(mine)} ref={len(ref)}")
        else:
            if str(mine.dtypes.to_dict()) != str(ref.dtypes.to_dict()):
                dt = {c: (str(mine.dtypes[c]), str(ref.dtypes[c]))
                      for c in mine.columns if str(mine.dtypes[c]) != str(ref.dtypes[c])}
                problems.append(f"dtypes: {dt}")
            neq = (mine.astype(str).values != ref.astype(str).values)
            if neq.any():
                import numpy as np
                rows = sorted(set(np.argwhere(neq)[:, 0]))[:3]
                for r in rows:
                    problems.append(f"row {r}: mine={mine.iloc[r].to_dict()} ref={ref.iloc[r].to_dict()}")
        if problems:
            print(f"FAIL {name} ({len(ref)} ref rows)")
            for p in problems:
                print(f"  {p}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(ref)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
