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

Single-threaded oracle recheck (round 12, found by the sf10 gate): DuckDB
1.0.0's PARALLEL window execution returns WRONG, memory-limit-dependent
results at sf10 volume (10M rows x 28.5k partitions: the islands oracle gave
three different totals at three memory limits, every one of them diverging
from a row-by-row Python replay, while `SET threads=1` matches the replay —
and the engine — exactly). Any mismatch is therefore re-checked against a
fresh threads=1 connection before being declared a FAIL; a recheck pass is
reported as OK with a marker so the artifact shows which rows leaned on it.
"""
import json, sys, math
import numpy as np
import duckdb

# The oracle contract (incl. the threads=1 recheck above) is calibrated
# against DuckDB 1.0.0 — see TESTDATA.md "Oracle instrument version".
ORACLE_DUCKDB_VERSION = "1.0.0"
if duckdb.__version__ != ORACLE_DUCKDB_VERSION:
    print(f"WARN: oracle calibrated for DuckDB {ORACLE_DUCKDB_VERSION}, "
          f"running {duckdb.__version__} — parallel-window recheck behavior "
          f"and collapse-query timings may differ", file=sys.stderr)

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def connect(threads=None):
    c = duckdb.connect()
    # GRAFT_DUCKDB_MEMLIMIT (e.g. "24GB"): bound the allocator so a heavy
    # oracle SPILLS instead of drawing the kernel OOM killer when the box
    # is shared (round 14: the sf10 leg at default 80%-of-RAM died at
    # 66 GB RSS next to a large probe JVM). Same knob as bench_duckdb.py.
    import os
    ml = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
    if ml:
        c.execute(f"SET memory_limit='{ml}'")
    if threads:
        c.execute(f"SET threads={threads}")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{sfdir}/{t}.parquet')")
    return c


def compare(exp, got):
    """Returns (status, detail): status in {'ok','warn','fail'}."""
    if sorted(exp.columns) != sorted(got.columns):
        return "fail", f"columns {sorted(got.columns)} != {sorted(exp.columns)}"
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        return "fail", f"rows {len(got)} != {len(exp)}"
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
        return "fail", f"{bad} mismatched cells, first={first_bad}"
    if inexact:
        return "warn", f"{inexact} float cells differ in ulps (hash would mismatch)"
    return "ok", f"{len(exp)} rows exact"


con = connect()
con1 = None  # lazy threads=1 connection for the recheck pass
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, warns, rechecks = 0, 0, 0
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
    st, detail = compare(exp, got)
    if st == "fail":
        # DuckDB 1.0 parallel-window artifact guard: re-run the oracle
        # single-threaded before declaring an engine mismatch
        try:
            if con1 is None:
                con1 = connect(threads=1)
            exp1 = con1.execute(sql).fetch_df()
            st1, detail1 = compare(exp1, got)
            if st1 != "fail":
                st, detail = st1, detail1 + " [single-threaded oracle recheck]"
                rechecks += 1
        except Exception as e:
            print(f"     {name}: recheck error: {e}", flush=True)
    if st == "fail":
        print(f"FAIL {name}: {detail}", flush=True); fails += 1
    elif st == "warn":
        print(f"WARN {name}: {detail}", flush=True); warns += 1
    else:
        print(f"OK   {name}: {detail}", flush=True)
n = len(oracle) if only is None else len(only)
tail = f", {rechecks} via single-threaded oracle recheck" if rechecks else ""
print(f"\n{n} queries: {n-fails-warns} exact, {warns} warn, {fails} fail{tail}",
      flush=True)
sys.exit(1 if fails else 0)
