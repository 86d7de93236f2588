#!/usr/bin/env python3
"""Determinism gate: compare two Verify dump dirs (e.g. different thread
counts) cell-by-cell. Usage: python3 tools/compare_runs.py dirA dirB"""
import sys, glob, os
import pandas as pd, numpy as np

a_dir, b_dir = sys.argv[1], sys.argv[2]
# union of BOTH sides: a query present in only one dump is a failure, and
# an empty/typo'd dir must not pass vacuously
names = sorted(
    {os.path.basename(p) for p in glob.glob(f"{a_dir}/q_*")} |
    {os.path.basename(p) for p in glob.glob(f"{b_dir}/q_*")})
if not names:
    print(f"no query dumps found under {a_dir} or {b_dir}")
    sys.exit(1)
n_fail = 0
for name in names:
    # the try covers normalization/sort/compare too: mismatched column
    # sets (or any other per-query surprise) must record a DIFF for THAT
    # query and continue, not abort the whole gate
    try:
        a = pd.read_parquet(f"{a_dir}/{name}")
        b = pd.read_parquet(f"{b_dir}/{name}")
        for df in (a, b):
            for c in df.columns:
                # sniff ANY cell (not just row 0 — it may be null) for
                # list-typed values that need tuple conversion to sort/compare
                if any(isinstance(v, (list, np.ndarray)) for v in df[c]):
                    df[c] = df[c].apply(
                        lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if sorted(a.columns) != sorted(b.columns):
            print(f"DIFF {name}: columns {sorted(a.columns)} vs {sorted(b.columns)}")
            n_fail += 1
            continue
        a = a[sorted(a.columns)].sort_values(by=sorted(a.columns), ignore_index=True)
        b = b[sorted(b.columns)].sort_values(by=sorted(b.columns), ignore_index=True)
        if not a.equals(b):
            print(f"DIFF {name}: rows {len(a)} vs {len(b)}"); n_fail += 1
        else:
            print(f"OK   {name}: {len(a)} rows")
    except Exception as e:
        print(f"DIFF {name}: {type(e).__name__}: {e}"); n_fail += 1
print(f"\n{'ALL IDENTICAL' if n_fail == 0 else f'{n_fail} DIFFS'} / {len(names)} queries")
sys.exit(1 if n_fail else 0)
