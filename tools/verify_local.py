#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [outDir] [sfDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran. For each
query parquet in outDir, runs the matching oracle SQL from oracle_sql.json in
DuckDB over the same testdata tables, sorts columns by name, sorts rows, and
compares cell-by-cell (exact for non-floats; floats must match to 1e-9 rel —
the driver hashes, so we flag ANY inexact float as a WARN and any mismatch as
FAIL).
"""
import json, sys, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, warns = 0, 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}"); fails += 1; continue
    if sorted(exp.columns) != sorted(got.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
        fails += 1; continue
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    bad = inexact = 0
    first_bad = None
    for c in exp.columns:
        for i in range(len(exp)):
            a, b = exp[c].iloc[i], got[c].iloc[i]
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
        print(f"FAIL {name}: {bad} mismatched cells, first={first_bad}")
        fails += 1
    elif inexact:
        print(f"WARN {name}: {inexact} float cells differ in ulps (hash would mismatch)")
        warns += 1
    else:
        print(f"OK   {name}: {len(exp)} rows exact")
print(f"\n{len(oracle)} queries: {len(oracle)-fails-warns} exact, {warns} warn, {fails} fail")
sys.exit(1 if fails else 0)
