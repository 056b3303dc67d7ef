#!/usr/bin/env python3
"""Deterministic scale-up of the driver's testdata (TESTDATA.md) by tiling.

The driver ships sf0.001/0.01/0.1; every remaining perf question (per-query
scheduling floor amortization, plan shape at 10x) needs one more order of
magnitude. This tool tiles /root/testdata/sf0.1 N times with consistent key
offsets — referential integrity, value domains, string taxonomies and
timestamp windows are preserved exactly, so every gated query and its DuckDB
oracle runs unmodified on the scaled corpus:

- fact/dim keys of copy k are offset by k * (base table row count): customer,
  supplier, part, orders, lineitem FKs move together, so join selectivity
  and group cardinalities scale linearly (the TPC-H scaling rule);
- key-derived name strings (Customer#%09d / Supplier#%09d) are regenerated
  from the offset key, keeping the name<->key bijection and distinct counts;
- region/nation stay fixed (25 nations), like TPC-H at every sf;
- events keeps its Jan-2024 window with 10x users (densification — the
  realistic shape of event-stream growth);
- documents/embeddings tile with offset ids and UNCHANGED payloads: groups
  of N exact-duplicate docs/vectors are exactly the shape a web-scale corpus
  hands a dedup/ANN stack, and every gated top-k breaks ties on the id, so
  the oracles stay exact under massive tying.

Deterministic by construction (no RNG anywhere). Output is one parquet FILE
per table (the TESTDATA layout both Tables.scala and the DuckDB oracle
expect), written with bounded row groups so both engines can parallelize the
scan the way a real lake layout would.

Usage: python3 tools/gen_sf.py [outDir] [copies] [srcDir]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

# (table, [key columns to offset by that table's base count], name column)
# FK offsets reference the base count of the table they point into.
BASE = {}
for t in ["customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]:
    BASE[t] = pq.read_metadata(f"{src}/{t}.parquet").num_rows

OFFSETS = {
    "customer": {"c_custkey": BASE["customer"]},
    "supplier": {"s_suppkey": BASE["supplier"]},
    "part": {"p_partkey": BASE["part"]},
    "orders": {"o_orderkey": BASE["orders"], "o_custkey": BASE["customer"]},
    "lineitem": {"l_orderkey": BASE["orders"], "l_partkey": BASE["part"],
                 "l_suppkey": BASE["supplier"]},
    # user_id domain derives from the SOURCE data (0..1499 at sf0.1, 10x
    # per tiling) — the round-12 sf10 run hardcoded 1500 and collided the
    # copies' users when tiling FROM sf1, silently turning "10x users"
    # into "10x duplicate events per user"
    "events": {"event_id": BASE["events"],
               "user_id": 1 + pc.max(
                   pq.read_table(f"{src}/events.parquet",
                                 columns=["user_id"])["user_id"]).as_py()},
    "documents": {"doc_id": BASE["documents"]},
    "embeddings": {"vec_id": BASE["embeddings"]},
}
NAMES = {"customer": ("c_name", "c_custkey", "Customer#%09d"),
         "supplier": ("s_name", "s_suppkey", "Supplier#%09d")}
ROW_GROUP = 262_144  # bounded row groups: both engines split the scan


def tile_copy(base: pa.Table, name: str, k: int) -> pa.Table:
    t = base
    for col, width in OFFSETS.get(name, {}).items():
        i = t.schema.get_field_index(col)
        shifted = pc.add(t.column(col), pa.scalar(k * width,
                                                  t.schema.field(col).type))
        t = t.set_column(i, t.schema.field(col), shifted.cast(
            t.schema.field(col).type))
    if name in NAMES:
        ncol, kcol, fmt = NAMES[name]
        i = t.schema.get_field_index(ncol)
        keys = t.column(kcol).to_pylist()
        t = t.set_column(i, t.schema.field(ncol),
                         pa.array([fmt % v for v in keys], pa.string()))
    return t


import os
os.makedirs(out, exist_ok=True)
for name in ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"]:
    base = pq.read_table(f"{src}/{name}.parquet")
    path = f"{out}/{name}.parquet"
    if name in ("region", "nation"):
        # fixed dimensions at every sf, like TPC-H
        pq.write_table(base, path, row_group_size=ROW_GROUP)
        print(f"{name}: {base.num_rows} rows -> {path}")
        continue
    # stream one copy at a time (round 14: 1000x tiling would otherwise
    # hold the whole concatenated table in memory — ~60 GB for lineitem);
    # per-copy writes keep peak memory at one copy and produce the same
    # bounded row-group layout
    rows = 0
    with pq.ParquetWriter(path, base.schema) as w:
        for k in range(copies):
            t = tile_copy(base, name, k)
            w.write_table(t, row_group_size=ROW_GROUP)
            rows += t.num_rows
    print(f"{name}: {rows} rows -> {path}")
