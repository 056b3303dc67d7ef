#!/usr/bin/env python3
"""BENCHCMP pair analysis: totals, ratios and the standard exclusion rows
from one graft.Bench JSON + one bench_duckdb.py JSON over the same surface.

Usage: python3 tools/pair_analysis.py <spark.json> <duckdb.json> [excl,csv]
"""
import json, sys

sp_file, dk_file = sys.argv[1], sys.argv[2]
extra_excl = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

sp_lines = [l for l in open(sp_file) if l.strip().startswith("{")]
sp_diag = json.loads(sp_lines[0])
sp = sp_diag["wall_sec"]
dk = json.loads([l for l in open(dk_file) if l.strip().startswith("{")][-1])["queries"]

common = sorted(set(sp) & set(dk))
missing = sorted(set(sp) ^ set(dk))
if missing:
    print(f"note: {len(missing)} non-common queries ignored: {missing}")

def row(label, names):
    s = sum(sp[n] for n in names if sp[n] >= 0)
    d = sum(dk[n] for n in names if dk[n] >= 0)
    print(f"{label:58s} spark={s:8.2f}  duckdb={d:8.2f}  ratio={s/d if d else float('nan'):6.2f}x  n={len(names)}")
    return s, d

row("full common suite", common)
# the standing BENCHCMP exclusion rows
collapse = [n for n in common if n.split("_")[0] in ("q69", "q64", "q141", "q174")]
row("DuckDB single-node collapse set alone", collapse)
rest = [n for n in common if n not in collapse]
row("excl. collapse set", rest)
streaming = [n for n in rest if "streaming" in n or n.split("_")[0] in
             ("q130", "q133", "q142", "q147", "q148", "q168", "q169")]
demo = [n for n in rest if n.split("_")[0] == "q67"]
batch = [n for n in rest if n not in streaming and n not in demo
         and n.split("_")[0] not in extra_excl]
row("harshest batch-only (also excl. streaming gates + q67 demo)", batch)

ratios = sorted((sp[n] / dk[n], n) for n in common if dk[n] > 0 and sp[n] >= 0)
med = ratios[len(ratios) // 2]
print(f"median per-query ratio: {med[0]:.2f}x ({med[1]})")
worst = [f"{n}={sp[n]:.2f}/{dk[n]:.2f}" for r, n in ratios[-6:]]
print("worst per-query ratios:", ", ".join(worst))
