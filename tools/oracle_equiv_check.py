#!/usr/bin/env python3
"""Machine-check that each committed scalable oracle is frame-equal to its
transparent all-pairs SEMANTIC definition (round 14, VERDICT r13 #1).

Driven by graft.queries.OracleEquivalenceSpec on every `sbt test`: the spec
dumps SparkEntry's (committed, semantic) pairs to a JSON file and invokes

    python3 tools/oracle_equiv_check.py <sfDir> <pairs.json> [names]

Each pair runs in DuckDB over <sfDir>'s parquet tables; columns must match
in order and name, rows must be cell-identical (both statements end in a
deterministic ORDER BY). Exit 0 iff every pair matches.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, pairs_path = sys.argv[1], sys.argv[2]
    pairs = json.load(open(pairs_path))
    names = sorted(pairs)
    if len(sys.argv) > 3:
        names = [n for n in names if n in set(sys.argv[3].split(","))]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    fails = 0
    for name in names:
        committed, semantic = pairs[name]["committed"], pairs[name]["semantic"]
        t0 = time.monotonic()
        cur = con.execute(committed)
        ccols = [d[0] for d in cur.description]
        crows = cur.fetchall()
        t1 = time.monotonic()
        cur = con.execute(semantic)
        scols = [d[0] for d in cur.description]
        srows = cur.fetchall()
        t2 = time.monotonic()
        if ccols != scols:
            print(f"FAIL {name}: columns committed={ccols} semantic={scols}")
            fails += 1
        elif crows != srows:
            bad = sum(1 for a, b in zip(crows, srows) if a != b) \
                + abs(len(crows) - len(srows))
            print(f"FAIL {name}: {bad} differing rows "
                  f"(committed {len(crows)}, semantic {len(srows)})")
            for a, b in list(zip(crows, srows))[:5]:
                if a != b:
                    print(f"  committed {a} != semantic {b}")
            fails += 1
        else:
            print(f"PASS {name}: {len(crows)} rows identical "
                  f"(committed {t1-t0:.2f}s, semantic {t2-t1:.2f}s)",
                  flush=True)
    print(f"{len(names) - fails}/{len(names)} equivalent at {sfdir}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
