#!/usr/bin/env python3
"""Compare two Verify output dirs (e.g. runs at different CPU counts)
for byte-equality per query. Usage: determinism.py <dirA> <dirB>"""
import sys, glob, os
import numpy as np
import pyarrow.parquet as pq

a_dir, b_dir = sys.argv[1], sys.argv[2]
bad = ok = 0
for d in sorted(os.listdir(a_dir)):
    pa = glob.glob(os.path.join(a_dir, d, "*.parquet"))
    pb = glob.glob(os.path.join(b_dir, d, "*.parquet"))
    if not pa or not pb:
        continue
    a = pq.read_table(pa[0]).to_pandas()
    b = pq.read_table(pb[0]).to_pandas()
    for df in (a, b):
        for c in df.columns:
            if len(df) and isinstance(df[c].iloc[0], np.ndarray):
                df[c] = df[c].map(tuple)
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    if a.equals(b):
        ok += 1
    else:
        bad += 1
        print("DIFFERS:", d)
print(f"{ok} identical, {bad} differ")
sys.exit(1 if bad else 0)
