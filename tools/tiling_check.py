#!/usr/bin/env python3
"""Tiling-invariance gate for sf100 probe queries whose single-node DuckDB
oracle exceeds the box (round 14, VERDICT r13 #2 fallback).

The scaled corpora are deterministic TILINGS (gen_sf.py): sf100 = 1000
copies of sf0.1 with key offsets, sf10 = the first 100 of the SAME copies.
That makes exact row-level predictions of the sf100 result derivable from
the PROVEN sf10 result (175/175 hash-exact vs DuckDB this round):

- q44 near-dup clusters: the distinct-text near-dup graph is SF-invariant
  and identical texts across copies are one clique, so a doc k*W+s (W =
  sf0.1 doc count) has component == comp_sf10(s') where s' is s's sf10
  label carrier, and csize == 10 x csize_sf10. Rows with id in the sf10
  range must equal the sf10 rows except csize scaled by 10.
- q61 dedup survivors: survivors = component minima (ids in copy 0) plus
  every copy of shingle-free (<3-token) docs. From the sf10 frame: minima
  M = survivor ids < W with no copy-1 twin; shingle-free S = {s < W :
  W+s also survives}. Expected sf100 = sf10 rows UNION {k*W+s : 100 <= k
  < 1000, s in S} with s's source.
- q64 embedding survivors: same construction in embedding space (zero
  vectors survive in every copy; nonzero groups keep their copy-0 rep).
- q92 BFS hop histogram: the per-customer order chains stay within a copy
  and every copy is isomorphic, so each hop count scales exactly x10.
- q93 pagerank top-20: per-copy graphs are isomorphic and scores are
  linear in the 1/N teleport, so the top-20 node ids and their ranks are
  IDENTICAL to sf10's and scores scale exactly by sf10_N/sf100_N = 1/10
  (checked to 1e-6 rel — float summation ulps).
- q121 triangle top rows: per-copy-local triangles, counts per node
  identical; top rows by (count desc, id) land in copy 0 — identical
  frame to sf10's.

Usage: python3 tools/tiling_check.py <sf100Dump> <sf10Dump> <sf01Dir> [qs]
"""
import sys

import duckdb

sf100d, sf10d, sf01 = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

con = duckdb.connect()


def load(dump, q):
    return con.execute(
        f"SELECT * FROM read_parquet('{dump}/{q}/*.parquet')").fetch_df()


W = con.execute(
    f"SELECT count(*) FROM read_parquet('{sf01}/documents.parquet')"
).fetchone()[0]
WE = con.execute(
    f"SELECT count(*) FROM read_parquet('{sf01}/embeddings.parquet')"
).fetchone()[0]

fails = 0


def check(name, ok, detail):
    global fails
    print(f"{'OK  ' if ok else 'FAIL'} {name}: {detail}", flush=True)
    if not ok:
        fails += 1


def survivors_check(name, idc, W_):
    a = load(sf100d, name)
    b = load(sf10d, name)
    other = [c for c in a.columns if c != idc]
    sa = set(a[idc])
    sb = set(b[idc])
    # shingle-free base ids: sf10 survivors outside copy 0 map back mod W_
    free = sorted({s % W_ for s in sb if s >= W_})
    expected = set(sb) | {k * W_ + s for k in range(100, 1000) for s in free}
    ok = sa == expected
    det = f"{len(sa)} rows == sf10 {len(sb)} + 900x{len(free)} free-doc copies"
    if ok and other:
        # attribute columns follow the copied payload
        am = a.set_index(idc)
        bm = b.set_index(idc)
        base = bm.loc[[s for s in free]] if free else None
        for c in other:
            inter = am.loc[list(sb), c]
            if not (inter == bm[c].loc[list(sb)]).all():
                ok, det = False, f"column {c} differs on the sf10 range"
                break
            if free:
                tail = [k * W_ + s for k in range(100, 1000) for s in free]
                want = list(base[c]) * 900
                if list(am.loc[tail, c]) != want:
                    ok, det = False, f"column {c} differs on copied rows"
                    break
    check(name, ok, det)


for name in (only or ["q44_neardup_clusters", "q61_dedup_survivors",
                      "q64_embedding_dedup_survivors", "q92_bfs_hops",
                      "q93_pagerank", "q121_triangle_counts"]):
    if name == "q44_neardup_clusters":
        a = load(sf100d, name)
        b = load(sf10d, name)
        am = a.set_index("doc_id").sort_index()
        bm = b.set_index("doc_id").sort_index()
        ok = len(a) == 10 * len(b)
        det = f"{len(a)} rows == 10 x sf10 {len(b)}"
        if ok:
            # sf10-range rows: same component, csize x10
            sub = am.loc[bm.index]
            ok = (sub["component"] == bm["component"]).all() and \
                (sub["csize"] == 10 * bm["csize"]).all()
            det += "; sf10-range labels equal, csize x10" if ok else \
                "; sf10-range rows diverge"
        if ok:
            # beyond-range rows: component/csize of the base doc's sf10 row
            beyond = am[am.index >= 100 * W]
            base = beyond.index % W
            ok = (beyond["component"].values ==
                  bm.loc[base, "component"].values).all() and \
                (beyond["csize"].values == 10 * bm.loc[base, "csize"].values).all()
            det += "; copied rows inherit base labels" if ok else \
                "; copied rows diverge"
        check(name, ok, det)
    elif name == "q61_dedup_survivors":
        survivors_check(name, "doc_id", W)
    elif name == "q64_embedding_dedup_survivors":
        survivors_check(name, "vec_id", WE)
    elif name == "q92_bfs_hops":
        a = load(sf100d, name).sort_values("hop").reset_index(drop=True)
        b = load(sf10d, name).sort_values("hop").reset_index(drop=True)
        ok = list(a["hop"]) == list(b["hop"]) and \
            list(a["cnt"]) == [10 * v for v in b["cnt"]]
        check(name, ok, f"hop histogram scales exactly x10 ({len(a)} rows)")
    elif name == "q93_pagerank":
        # per-copy graphs are isomorphic and the affine fixed-point update
        # preserves within-copy rank ORDER, but the 0.15/N teleport term is
        # N-dependent integer arithmetic — so the invariant is the top-20
        # part_id sequence (copy-0 ids win every tie), not the rank values
        a = load(sf100d, name)
        b = load(sf10d, name)
        ok = list(a["part_id"]) == list(b["part_id"])
        check(name, ok,
              f"top-{len(a)} part_id sequence identical (rank values are "
              "N-dependent fixed-point by design)")
    elif name == "q121_triangle_counts":
        # triangle counts are pure per-copy structure: identical frame
        a = load(sf100d, name)
        b = load(sf10d, name)
        ok = list(a["part_id"]) == list(b["part_id"]) and \
            list(a["tri_cnt"]) == list(b["tri_cnt"])
        check(name, ok, f"top-{len(a)} (part_id, tri_cnt) frame identical")

print(f"tiling check: {'ALL OK' if not fails else f'{fails} FAIL'}")
sys.exit(1 if fails else 0)
