#!/usr/bin/env python3
"""Merge the per-batch check_timed artifacts of a large-SF certification
into one CORRECTNESS_SF1.json: per query the HIGHEST SF at which the
DuckDB twin matched, with wall time. Batches are the committed copies
under cert/ (reproducible from a fresh clone), named
SF<label>_CHECK_*.json where <label> encodes the SF with the dot
removed (SF005 = sf0.05, SF05 = sf0.5, SF1 = sf1).
Usage: merge_cert.py <out.json> [batch_dir=cert] [oracle_sql.json]"""
import glob
import json
import os
import re
import sys

LABELS = {"SF001": "sf0.01", "SF005": "sf0.05", "SF01": "sf0.1",
          "SF05": "sf0.5", "SF1": "sf1"}

batch_dir = sys.argv[2] if len(sys.argv) > 2 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cert")
batches = []
for path in sorted(glob.glob(os.path.join(batch_dir, "SF*_CHECK_*.json"))):
    m = re.match(r"(SF\d+)_CHECK_", os.path.basename(path))
    if not m or m.group(1) not in LABELS:
        sys.exit(f"unrecognized batch name: {path}")
    batches.append((LABELS[m.group(1)], path))

best = {}
fails = {}
for sf, path in batches:
    for r in json.load(open(path))["results"]:
        q = r["query"]
        if r["match"]:
            cur = best.get(q)
            # >= : later batches (sorted filename order) override earlier
            # ones at the same SF, so re-graded queries carry the row
            # from the freshest engine
            if cur is None or float(sf[2:]) >= float(cur["sf"][2:]):
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
if len(sys.argv) > 3:
    ora = json.load(open(sys.argv[3]))
    print("not certified above the graded SF:", sorted(set(ora) - set(best)))
