#!/usr/bin/env python3
"""Round-14 oracle promotion (VERDICT r13 #1): derive SINGLE-STATEMENT
variants of the proven scalable oracles so they can live in the committed
`oracleSql` (the driver's runner gets one statement per query, the same
shape as every other committed oracle).

The staged forms in scalable_oracles.py materialize each contraction stage
through TEMP TABLES because DuckDB 1.0 re-evaluates plain CTEs at every
reference. DuckDB >= 0.10 has the standard fix inside one statement:
`WITH x AS MATERIALIZED (...)`. This tool converts each staged script
mechanically — every `CREATE OR REPLACE TEMP TABLE _x AS <body>;` becomes a
`x AS MATERIALIZED (<body>)` CTE, references `_x` -> `x`, and the final
statement's own WITH-list merges after them — then proves the result
cell-identical to the COMMITTED all-pairs SQL at the SFs where both run.

NOTE: prove/print need a PRE-promotion dump (oracle_sql.json carrying the
all-pairs forms — the cluster rewrite keys off scalable_oracles.COMP_ANCHOR,
which the promoted committed SQL no longer contains). Post-promotion, the
living machine-check is OracleEquivalenceSpec + tools/oracle_equiv_check.py
over the in-tree (committed, semantic) pairs; this tool documents the
derivation and reproduces the r14 promotion evidence from the r13 dumps.

Modes:
  python3 tools/promote_oracles.py print <name>          # show converted SQL
  python3 tools/promote_oracles.py prove <dumpDir> <sfDir> [names]
  python3 tools/promote_oracles.py time <dumpDir> <sfDir> [names]
      prove: converted vs committed SQL (exact frame compare)
      time:  run converted only (for sf>=1 where committed collapses)
"""
import json
import re
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo/tools")
import scalable_oracles as so


# Hand-written flat single-statement contraction prefix for the cluster
# family (q44/q61/q141/q174): same stages as scalable_oracles.CLUSTER_STAGES,
# each materialized once via AS MATERIALIZED instead of a temp table. Ends
# with `comp` so every committed downstream tail composes unchanged. The
# mechanical converter below cannot do this family (stripping `_comp`'s
# underscore would collide with the final statement's own `comp`).
CLUSTER_SINGLE_PREFIX = """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
grp AS MATERIALIZED (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
    count(*) OVER (PARTITION BY text) AS gsize,
    len(string_split(text, ' ')) AS ntok
  FROM documents),
rsh AS MATERIALIZED (
  SELECT sh.doc_id, sh.s FROM sh JOIN grp g ON sh.doc_id = g.doc_id
  WHERE g.doc_id = g.rep),
rsizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM rsh GROUP BY 1),
rp0 AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
  FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
rnd AS (
  SELECT da, db FROM rp0 JOIN rsizes na ON rp0.da = na.doc_id
                         JOIN rsizes nb ON rp0.db = nb.doc_id
  WHERE inter::DOUBLE / (na.n + nb.n - inter) >= 0.9),
redges AS MATERIALIZED (SELECT da AS src, db AS dst FROM rnd
  UNION SELECT db AS src, da AS dst FROM rnd),
reach(id, r) AS (
  SELECT src, src FROM redges
  UNION
  SELECT e.src, w.r FROM redges e JOIN reach w ON e.dst = w.id),
rcomp AS MATERIALIZED (SELECT id, min(r) AS component FROM reach GROUP BY 1),
comp AS MATERIALIZED (
  SELECT g.doc_id AS id, coalesce(rc.component, g.rep) AS component
  FROM grp g LEFT JOIN rcomp rc ON g.rep = rc.id
  WHERE rc.id IS NOT NULL OR (g.gsize >= 2 AND g.ntok >= 3))"""


def to_single_statement(script):
    stmts = [s.strip() for s in script.split(";") if s.strip()]
    ctes = []          # (name, body, recursive?)
    renames = {}
    final = None
    for i, st in enumerate(stmts):
        m = re.match(r"CREATE OR REPLACE TEMP TABLE (_\w+) AS\s+(.*)", st,
                     re.S)
        if m:
            tname, body = m.group(1), m.group(2)
            cname = tname.lstrip("_")
            renames[tname] = cname
            ctes.append((cname, body))
        else:
            assert i == len(stmts) - 1, f"non-final bare statement: {st[:80]}"
            final = st
    assert final is not None

    def rename(sql):
        for t, c in renames.items():
            sql = re.sub(rf"\b{t}\b", c, sql)
        return sql

    recursive = False
    parts = []
    for cname, body in ctes:
        body = rename(body)
        # a staged body that is itself `WITH [RECURSIVE] ... SELECT` nests
        # verbatim inside the CTE parens (legal DuckDB subquery form)
        if re.match(r"WITH\s+RECURSIVE", body):
            pass  # nested recursive WITH stays nested
        parts.append(f"{cname} AS MATERIALIZED (\n{body})")
    final = rename(final)
    m = re.match(r"WITH\s+(RECURSIVE\s+)?(.*)", final, re.S)
    if m:
        if m.group(1):
            recursive = True
        tail = m.group(2)
    else:
        tail = None
    head = "WITH RECURSIVE " if recursive else "WITH "
    if tail is not None:
        return head + ",\n".join(parts) + ",\n" + tail
    return head + ",\n".join(parts) + "\n" + final


def converted(name, committed):
    if name in so.CLUSTER_QUERIES:
        i = committed.find(so.COMP_ANCHOR)
        assert i >= 0, f"{name}: comp anchor missing"
        return CLUSTER_SINGLE_PREFIX + committed[i + len(so.COMP_ANCHOR):]
    return to_single_statement(so.scalable_sql(name, committed))


def main():
    mode = sys.argv[1]
    names = sorted(set(so.CLUSTER_QUERIES) | set(so.STANDALONE))
    if mode == "print":
        # committed SQL needed only for the cluster family's anchor split
        oracle = json.load(open("/tmp/graft_verify_ann/oracle_sql.json"))
        print(converted(sys.argv[2], oracle.get(sys.argv[2], "")))
        return
    dumpdir, sfdir = sys.argv[2], sys.argv[3]
    oracle = json.load(open(f"{dumpdir}/oracle_sql.json"))
    if len(sys.argv) > 4:
        names = [n for n in names if n in set(sys.argv[4].split(","))]
    con = so.connect(sfdir)
    fails = 0
    for name in names:
        if name not in oracle:
            print(f"SKIP {name}: not in oracle_sql.json")
            continue
        new_sql = converted(name, oracle[name])
        ncols, nrows, nt = so.run(con, new_sql)
        if mode == "time":
            print(f"TIME {name}: single-stmt {nt:.2f}s rows={len(nrows)}",
                  flush=True)
            continue
        ccols, crows, ct = so.run(con, oracle[name])
        if ccols != ncols:
            print(f"FAIL {name}: columns {ncols} != committed {ccols}")
            fails += 1
        elif crows == nrows:
            print(f"PASS {name}: {len(crows)} rows identical "
                  f"(committed {ct:.2f}s, single-stmt {nt:.2f}s)", flush=True)
        else:
            bad = sum(1 for a, b in zip(crows, nrows) if a != b) \
                + abs(len(crows) - len(nrows))
            print(f"FAIL {name}: {bad} differing rows "
                  f"(committed {len(crows)}, single-stmt {len(nrows)})")
            for a, b in list(zip(crows, nrows))[:5]:
                if a != b:
                    print(f"  committed {a} != single-stmt {b}")
            fails += 1
    print(f"{mode} {sfdir}: {len(names) - fails}/{len(names)} ok")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
