#!/usr/bin/env python3
"""check.py with per-query wall-time and a hard per-oracle timeout (each
oracle runs in its own subprocess), for large-SF certification where a
handful of quadratic DuckDB twins are infeasible. Writes a JSON artifact.
Usage: check_timed.py <sfdir> <verify_outdir> <out.json> <timeout_sec> [query ...]
"""
import sys, json, glob, os, time
import multiprocessing as mp


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sfdir, outdir, name, sql, q):
    import duckdb
    import pyarrow.parquet as pq
    t0 = time.time()
    res = {"query": name, "rows": None, "match": False, "err": None, "sec": None}
    try:
        con = duckdb.connect()
        nthreads = os.environ.get("DUCKDB_THREADS")
        if nthreads:
            con.execute(f"SET threads={int(nthreads)}")
        memlim = os.environ.get("DUCKDB_MEM")
        if memlim:
            con.execute(f"SET memory_limit='{memlim}'")
            tmp = f"/tmp/duck_spill_{os.getpid()}"
            os.makedirs(tmp, exist_ok=True)
            con.execute(f"SET temp_directory='{tmp}'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            res["err"] = "no spark output"
            q.put(res); return
        mine = pq.read_table(files[0]).to_pandas()
        oracle = con.execute(sql).df()
        mine = mine[sorted(mine.columns)]
        oracle = oracle[sorted(oracle.columns)]
        res["rows"] = len(mine)
        if list(mine.columns) != list(oracle.columns):
            res["err"] = f"columns {list(mine.columns)} vs {list(oracle.columns)}"
        elif len(mine) != len(oracle):
            res["err"] = f"rows {len(mine)} vs {len(oracle)}"
        else:
            ms = mine.sort_values(list(mine.columns)).reset_index(drop=True)
            os_ = oracle.sort_values(list(oracle.columns)).reset_index(drop=True)
            bad = []
            for c in ms.columns:
                a, b = ms[c], os_[c]
                try:
                    eq = (a == b) | (a.isna() & b.isna())
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    bad.append(c)
            if bad:
                res["err"] = f"value mismatch in {bad}"
            else:
                res["match"] = True
    except Exception as e:
        res["err"] = f"{type(e).__name__}: {e}"
    res["sec"] = round(time.time() - t0, 1)
    q.put(res)


def main():
    sfdir, outdir, outjson, timeout = sys.argv[1], sys.argv[2], sys.argv[3], float(sys.argv[4])
    only = set(sys.argv[5:])
    oracle_json = os.environ.get("ORACLE_JSON",
                                 os.path.join(outdir, "oracle_sql.json"))
    oracles = json.load(open(oracle_json))
    results = []
    # resume: skip queries already recorded in outjson
    done = {}
    if os.path.exists(outjson):
        done = {r["query"]: r for r in json.load(open(outjson)).get("results", [])}
    # a subset re-run must not drop prior rows: seed results with done
    # entries the subset (or a shrunk oracle set) excludes from the loop
    for name, r in sorted(done.items()):
        if (only and name not in only) or name not in oracles:
            results.append(r)
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        if name in done and (done[name]["match"] or done[name].get("err") == "timeout"):
            results.append(done[name]); continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sfdir, outdir, name, sql, q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate(); p.join()
            res = {"query": name, "rows": None, "match": False,
                   "err": "timeout", "sec": round(time.time() - t0, 1)}
        else:
            res = q.get() if not q.empty() else {
                "query": name, "rows": None, "match": False,
                "err": "worker died", "sec": round(time.time() - t0, 1)}
        results.append(res)
        print(("PASS" if res["match"] else "FAIL"), name,
              res["sec"], "s", res["err"] or "")
        sys.stdout.flush()
        n_pass = sum(1 for r in results if r["match"])
        json.dump({"sfdir": sfdir, "n_pass": n_pass,
                   "n_fail": len(results) - n_pass, "results": results},
                  open(outjson, "w"), indent=1)
    n_pass = sum(1 for r in results if r["match"])
    print(f"== {n_pass} pass, {len(results) - n_pass} fail")


if __name__ == "__main__":
    main()
