#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [outDir] [sfDir] [onlyCsv]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran. For each
query parquet in outDir, runs the matching oracle SQL from oracle_sql.json in
DuckDB over the same testdata tables, sorts columns by name, sorts rows, and
compares cell-by-cell (exact for non-floats; floats must match to 1e-9 rel —
the driver hashes, so we flag ANY inexact float as a WARN and any mismatch as
FAIL). Numeric columns compare vectorized (sf1 outputs reach 10^5+ rows;
python per-cell loops took minutes per query); object/decimal columns keep
the per-cell path so mixed-type cells compare exactly as before.
"""
import json, sys, math
import numpy as np
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, warns = 0, 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}", flush=True); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}", flush=True); fails += 1; continue
    if sorted(exp.columns) != sorted(got.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}",
              flush=True)
        fails += 1; continue
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}", flush=True); fails += 1; continue
    bad = inexact = 0
    first_bad = None
    for c in exp.columns:
        ea, ga = exp[c], got[c]
        if ea.dtype.kind in "fiu" and ga.dtype.kind in "fiu" and (
                ea.dtype.kind == "f" or ga.dtype.kind == "f"):
            fa = ea.to_numpy(dtype=float)
            fb = ga.to_numpy(dtype=float)
            eq = (fa == fb) | (np.isnan(fa) & np.isnan(fb))
            ne = ~eq
            if ne.any():
                close = np.abs(fa - fb) <= 1e-9 * np.maximum(1.0, np.abs(fa))
                nbad = int((ne & ~close).sum())
                inexact += int((ne & close).sum())
                bad += nbad
                if nbad and first_bad is None:
                    i = int(np.argmax(ne & ~close))
                    first_bad = (c, i, fa[i], fb[i])
        elif ea.dtype.kind in "iu" and ga.dtype.kind in "iu":
            ne = ea.to_numpy() != ga.to_numpy()
            if ne.any():
                bad += int(ne.sum())
                if first_bad is None:
                    i = int(np.argmax(ne))
                    first_bad = (c, i, ea.iloc[i], ga.iloc[i])
        else:
            # object/decimal/string/mixed: per-cell, exactly the old contract
            for i in range(len(exp)):
                a, b = ea.iloc[i], ga.iloc[i]
                if isinstance(a, float) or isinstance(b, float):
                    fa, fb = float(a), float(b)
                    if math.isnan(fa) and math.isnan(fb):
                        continue
                    if fa != fb:
                        if abs(fa - fb) <= 1e-9 * max(1.0, abs(fa)):
                            inexact += 1
                        else:
                            bad += 1
                            if first_bad is None: first_bad = (c, i, a, b)
                else:
                    if str(a) != str(b):
                        bad += 1
                        if first_bad is None: first_bad = (c, i, a, b)
    if bad:
        print(f"FAIL {name}: {bad} mismatched cells, first={first_bad}", flush=True)
        fails += 1
    elif inexact:
        print(f"WARN {name}: {inexact} float cells differ in ulps (hash would mismatch)",
              flush=True)
        warns += 1
    else:
        print(f"OK   {name}: {len(exp)} rows exact", flush=True)
n = len(oracle) if only is None else len(only)
print(f"\n{n} queries: {n-fails-warns} exact, {warns} warn, {fails} fail", flush=True)
sys.exit(1 if fails else 0)
