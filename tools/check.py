#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Runs nothing Spark-side itself — expects `sbt "runMain graft.Verify <sfDir> <outDir>"`
to have produced <outDir>/<name>/ parquet dirs + oracle_sql.json. Then runs each
oracle SQL in DuckDB against the sfDir parquet tables and compares values
(columns sorted by name, exact match after rounding; floats compared to 1e-9).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{OUT}/{name}"
    files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    bad = None
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == 'f' or e.dtype.kind == 'f':
            import numpy as np
            ga, ea = g.astype(float).to_numpy(), e.astype(float).to_numpy()
            ok = np.isclose(ga, ea, rtol=0, atol=1e-9, equal_nan=True).all()
            if not ok:
                bad = (c, 'float mismatch', (abs(ga-ea)).max())
                break
        else:
            if not g.astype(str).equals(e.astype(str)):
                idx = (g.astype(str) != e.astype(str)).idxmax()
                bad = (c, f'row {idx}', f"{g[idx]!r} vs {e[idx]!r}")
                break
    if bad:
        print(f"FAIL {name}: col {bad}"); fails += 1
    else:
        # dtype note (informational — driver may be stricter on schema)
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        note = f"  [dtype diff: {dt}]" if dt else ""
        print(f"OK   {name}: {len(got)} rows{note}")
print(f"{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
