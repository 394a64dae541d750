#!/usr/bin/env python3
"""Merge the per-batch check_timed artifacts of a large-SF certification
into one CORRECTNESS_SF1.json: per query the HIGHEST SF at which the
DuckDB twin matched, with wall time. Usage: merge_cert.py <out.json>"""
import json, sys, os

BATCHES = [  # (sf label, artifact) — later entries override earlier on match
    ("sf0.05", "/root/repo/.tmp/SF005_CHECK_D.json"),
    ("sf0.5", "/root/repo/.tmp/SF05_CHECK_G.json"),
    ("sf0.5", "/root/repo/.tmp/SF05_CHECK_C.json"),
    ("sf1", "/root/repo/.tmp/SF1_CHECK_A.json"),
    ("sf1", "/root/repo/.tmp/SF1_CHECK_G4.json"),
    ("sf1", "/root/repo/.tmp/SF1_CHECK_G4b.json"),
]

best = {}
fails = {}
for sf, path in BATCHES:
    if not os.path.exists(path):
        continue
    for r in json.load(open(path))["results"]:
        q = r["query"]
        if r["match"]:
            cur = best.get(q)
            if cur is None or float(sf[2:]) > float(cur["sf"][2:]):
                best[q] = {"sf": sf, "sec": r["sec"], "rows": r["rows"]}
        else:
            fails.setdefault(q, []).append({"sf": sf, "err": r["err"], "sec": r["sec"]})

out = {
    "n_queries_certified": len(best),
    "by_sf": {},
    "queries": dict(sorted(best.items())),
    "oracle_infeasible_attempts": {q: v for q, v in sorted(fails.items()) if q not in best
                                   or any(float(f["sf"][2:]) > float(best[q]["sf"][2:]) for f in v)},
}
for q, v in best.items():
    out["by_sf"][v["sf"]] = out["by_sf"].get(v["sf"], 0) + 1
json.dump(out, open(sys.argv[1], "w"), indent=1)
print("certified:", len(best), "by_sf:", out["by_sf"])
missing = set()
ora = json.load(open("/root/repo/.tmp/v_sf1/oracle_sql.json"))
missing = sorted(set(ora) - set(best))
print("not certified above sf0.01:", missing)
