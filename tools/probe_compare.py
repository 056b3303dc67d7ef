#!/usr/bin/env python3
"""Oracle side of the sf100 scale probe (round 14, VERDICT r13 #2).

For each probed query, computes the committed oracle's result in DuckDB at
the probe SF and compares against the ScaleProbe dump:

- direct queries (<outDir>/<name>/): exact frame compare, verify_local
  semantics (sorted by all columns, cell-exact, float ulp tolerance 1e-9
  flagged as WARN);
- invariant queries (<outDir>/<name>__inv/): the SAME one-row invariant
  frame is computed in SQL around the committed oracle — count(*), sum for
  integer columns, sum(floor(c * 2^20)) for doubles, sum(length) +
  count(distinct) for strings — and compared cell-exactly.

Each query runs under an optional wall cap (GRAFT_PROBE_TIMEOUT_SEC) via
con.interrupt(); a capped oracle is reported as CAPPED, not FAIL — the
caller falls back to the tiling invariants documented in sf100gate.md.

Usage: python3 tools/probe_compare.py <dumpDir> <sfDir> <name>[,name...]
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

dumpdir, sfdir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",")
cap = float(os.environ.get("GRAFT_PROBE_TIMEOUT_SEC", "0")) or None
memlimit = os.environ.get("GRAFT_PROBE_MEMLIMIT")

oracle = json.load(open(f"{dumpdir}/oracle_sql.json"))


def connect():
    con = duckdb.connect()
    if memlimit:
        con.execute(f"SET memory_limit='{memlimit}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    return con


def run_capped(con, sql):
    t0 = time.monotonic()
    if not cap:
        cur = con.execute(sql)
        return cur, time.monotonic() - t0, False
    done = threading.Event()

    def watchdog():
        if not done.wait(cap):
            con.interrupt()
    threading.Thread(target=watchdog, daemon=True).start()
    try:
        cur = con.execute(sql)
        return cur, time.monotonic() - t0, False
    except duckdb.InterruptException:
        return None, time.monotonic() - t0, True
    finally:
        done.set()


def invariant_sql(committed, schema):
    # schema: list of (name, kind) with kind in {int, float, str}, from the
    # Spark dump — both sides aggregate the same columns the same way
    parts = ["count(*) AS n"]
    for cname, kind in sorted(schema):
        if kind == "int":
            parts.append(f"sum(CAST({cname} AS BIGINT) % 1000003) AS s_{cname}")
            parts.append(f"bit_xor(CAST({cname} AS BIGINT)) AS x_{cname}")
        elif kind == "float":
            parts.append("sum(CAST(floor(CAST({c} AS DOUBLE) * 1048576.0) "
                         "AS BIGINT) % 1000003) AS s_{c}".format(c=cname))
        else:
            parts.append(f"sum(CAST(length({cname}) AS BIGINT)) AS s_{cname}")
            parts.append(f"count(DISTINCT {cname}) AS d_{cname}")
    return f"SELECT {', '.join(parts)} FROM ({committed}) __probe"


fails = capped_n = 0
for name in names:
    con = connect()  # fresh connection per query: caps leave clean state
    inv = os.path.isdir(f"{dumpdir}/{name}__inv")
    path = f"{dumpdir}/{name}__inv" if inv else f"{dumpdir}/{name}"
    got = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{path}/*.parquet')").fetch_df()
    if inv:
        # source-column kinds from ScaleProbe's sidecar — both sides build
        # the identical invariant aggregate list
        schema = [tuple(x) for x in
                  json.load(open(f"{dumpdir}/{name}.schema.json"))]
        sql = invariant_sql(oracle[name], schema)
    else:
        sql = oracle[name]
    try:
        cur, dt, was_capped = run_capped(con, sql)
    except Exception as e:
        # a spill-volume or memory failure is an ORACLE-capacity finding,
        # not a comparison failure — report and fall back like a cap
        print(f"CAPPED {name}: oracle error: {str(e).splitlines()[0]} "
              f"(fall back to tiling invariants)", flush=True)
        capped_n += 1
        continue
    if was_capped:
        print(f"CAPPED {name}: oracle exceeded {cap:.0f}s "
              f"(fall back to tiling invariants)", flush=True)
        capped_n += 1
        continue
    cols = [d[0] for d in cur.description]
    exp = cur.fetch_df()
    if sorted(cols) != sorted(got.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(cols)}")
        fails += 1
        continue
    exp = exp[sorted(exp.columns)].sort_values(
        by=sorted(exp.columns)).reset_index(drop=True)
    g = got[sorted(got.columns)].sort_values(
        by=sorted(got.columns)).reset_index(drop=True)
    if len(exp) != len(g):
        print(f"FAIL {name}: rows {len(g)} != {len(exp)}")
        fails += 1
        continue
    bad = 0
    first = None
    for c in exp.columns:
        for i in range(len(exp)):
            a, b = exp[c].iloc[i], g[c].iloc[i]
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if fa != fb and not (fa != fa and fb != fb) and \
                        abs(fa - fb) > 1e-9 * max(1.0, abs(fa)):
                    bad += 1
                    first = first or (c, i, a, b)
            elif str(a) != str(b):
                bad += 1
                first = first or (c, i, a, b)
    if bad:
        print(f"FAIL {name}: {bad} mismatched cells, first={first}")
        fails += 1
    else:
        tag = "inv " if inv else ""
        print(f"OK   {name}: {tag}{len(exp)} rows exact "
              f"(oracle {dt:.1f}s)", flush=True)
print(f"{len(names)} probed: {len(names)-fails-capped_n} ok, "
      f"{capped_n} capped, {fails} fail")
sys.exit(1 if fails else 0)
