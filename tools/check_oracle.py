#!/usr/bin/env python3
"""Local self-check: compare Verify.scala's parquet dumps against DuckDB
running SparkEntry.oracleSql — a stand-in for the driver's correctness gate.
Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# dev loop: Verify may have dumped a subset — its attempted.json manifest
# says which queries SHOULD have output. A query that was attempted but
# produced no parquet (it threw) stays in the check set and fails as MISS;
# only queries that were never attempted are skipped.
manifest = f"{outdir}/attempted.json"
if os.path.exists(manifest):
    attempted = set(json.load(open(manifest)))
    if attempted < set(oracle):
        print(f"[subset] checking {len(attempted)}/{len(oracle)} attempted queries")
        oracle = {n: oracle[n] for n in oracle if n in attempted}


def norm(df):
    df = df[sorted(df.columns)].copy()
    # make list columns sortable/comparable
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].apply(lambda v: tuple(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if np.isnan(a) and np.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = os.path.join(outdir, name)
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"MISS {name}: no spark output")
        n_fail += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        n_fail += 1
        continue
    s, d = norm(sdf), norm(ddf)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        n_fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        n_fail += 1
        continue
    # the driver's comparator hashes values as-typed: an int64 Spark column
    # vs a float64 DuckDB column (e.g. uncast SUM -> HUGEINT -> float64)
    # hash-mismatches even when values are numerically equal. Mirror that.
    kind_bad = [
        (c, s[c].dtype.kind, d[c].dtype.kind)
        for c in s.columns
        if {s[c].dtype.kind, d[c].dtype.kind} == {"i", "f"}
    ]
    if kind_bad:
        print(f"FAIL {name}: dtype kind mismatch (int vs float) {kind_bad}")
        n_fail += 1
        continue
    bad = []
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not cmp_cell(a, b):
                bad.append((c, i, a, b))
                if len(bad) >= 3:
                    break
        if len(bad) >= 3:
            break
    if bad:
        print(f"FAIL {name}: value diffs {bad}")
        n_fail += 1
    else:
        print(f"OK   {name}: {len(s)} rows")

print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if n_fail else 0)
