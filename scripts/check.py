#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify output
parquet against DuckDB running oracle_sql.json on the same tables.
Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); print(f"FAIL {name}: no spark output"); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"error: {e}")); print(f"FAIL {name}: {e}"); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"cols {gc} vs {ec}")); print(f"FAIL {name}: cols {gc} vs {ec}"); continue
    got, exp = got[gc], exp[gc]
    if len(got) != len(exp):
        fails.append((name, f"rows {len(got)} vs {len(exp)}")); print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
    bad = None
    for c in gc:
        a, b = got[c].values, exp[c].values
        # driver's hash compare distinguishes 47 (int) from 47.0 (float):
        # DuckDB sum(BIGINT) returns HUGEINT -> pandas float64. Require
        # matching numeric kinds (cost 3 rounds of red arch_reagg_6h).
        if (a.dtype.kind in 'iu') != (b.dtype.kind in 'iu') and \
           (a.dtype.kind in 'iuf' and b.dtype.kind in 'iuf'):
            bad = f"col {c} dtype kind: spark={a.dtype} duck={b.dtype} " \
                  "(CAST the oracle sum to BIGINT?)"
            break
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            a = a.astype(float); b = b.astype(float)
            # bitwise equality: -0.0 vs 0.0 hash differently driver-side
            neq = ~((a.view(np.uint64) == b.view(np.uint64)) |
                    (np.isnan(a) & np.isnan(b)))
        else:
            an = pd.isna(got[c].values); bn = pd.isna(exp[c].values)
            neq = ~(((got[c].values == exp[c].values) & ~an & ~bn) | (an & bn))
        if neq.any():
            i = int(np.argmax(neq))
            bad = f"col {c} row {i}: spark={got[c].values[i]!r} duck={exp[c].values[i]!r} ({int(neq.sum())} diffs)"
            break
    if bad:
        fails.append((name, bad)); print(f"FAIL {name}: {bad}")
    else:
        print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
