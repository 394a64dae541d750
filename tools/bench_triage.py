#!/usr/bin/env python3
"""Cross-round bench outlier triage with mechanical canary
normalization (round 12 — closes the by-hand normalization VERDICT
r11 task 8 called out).

Usage: bench_triage.py <bench_a.json> <bench_b.json> [threshold=1.5] [min_sec=0.5]

For every query present in both artifacts prints the raw ratio b/a and
the CANARY-NORMALIZED ratio (b/a divided by the two runs' median-canary
ratio — the host-speed correction; each BENCH artifact records its
canary_sec samples). Queries with normalized ratio above the threshold
and b-cost above min_sec are flagged as movers that host speed does NOT
explain — the candidates for the TimeQueries isolated protocol.

Accepts either a BENCH_r*.json artifact or a line number into
BENCH_HISTORY.jsonl as "hist:<n>".
"""
import json
import statistics
import sys


def load(spec):
    if spec.startswith("hist:"):
        lines = open("BENCH_HISTORY.jsonl").read().splitlines()
        return json.loads(lines[int(spec[5:])])
    d = json.load(open(spec))
    # driver-written BENCH_r*.json wraps the bench line under "parsed"
    return d.get("parsed", d)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    min_sec = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    ca = statistics.median(a.get("canary_sec", [1.0]))
    cb = statistics.median(b.get("canary_sec", [1.0]))
    host = cb / ca
    print(f"canary medians: a={ca:.3f}s b={cb:.3f}s -> host factor {host:.3f} "
          f"(drift a={a.get('canary_drift')} b={b.get('canary_drift')}, "
          f"noisy a={a.get('noisy')} b={b.get('noisy')})")
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    rows = []
    for q in common:
        if qa[q] <= 0:
            continue
        raw = qb[q] / qa[q]
        rows.append((raw / host, raw, qa[q], qb[q], q))
    rows.sort(reverse=True)
    norm_ratios = [r[0] for r in rows if r[3] >= min_sec]
    med = f"{statistics.median(norm_ratios):.3f}" if norm_ratios else "n/a"
    print(f"{len(common)} common queries; median normalized ratio {med} "
          f"(over the {len(norm_ratios)} with b >= {min_sec}s)")
    flagged = [r for r in rows if r[0] > thr and r[3] >= min_sec]
    print(f"movers (normalized > {thr}, b >= {min_sec}s): {len(flagged)}")
    for norm, raw, sa, sb, q in flagged:
        print(f"  {q:32s} a={sa:8.3f}s b={sb:8.3f}s raw={raw:5.2f}x norm={norm:5.2f}x")


if __name__ == "__main__":
    main()
