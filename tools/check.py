#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracles on the same sf dir. Usage:
  python3 tools/check.py <sfdir> <verify_outdir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        mine_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(mine_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        mine = pq.read_table(files[0]).to_pandas()
        try:
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        # driver semantics: sort columns by name, then compare values
        mine = mine[sorted(mine.columns)]
        oracle = oracle[sorted(oracle.columns)]
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(oracle.columns)}")
            n_fail += 1; continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}"); n_fail += 1; continue
        ms = mine.sort_values(list(mine.columns)).reset_index(drop=True)
        os_ = oracle.sort_values(list(oracle.columns)).reset_index(drop=True)
        diff_cols = []
        for c in ms.columns:
            a, b = ms[c], os_[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                bad = (ms[c] != os_[c]) & ~(ms[c].isna() & os_[c].isna())
                print(f"  {c}: mine={ms[c][bad].head(3).tolist()} oracle={os_[c][bad].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
