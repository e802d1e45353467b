#!/usr/bin/env python3
"""Assemble the three-tier bench table (VERDICT r7 #5).

Tiers:
  cold     — BENCH_DETAIL.json "queries_cold": pass-1 of the two-pass
             protocol. No clearing between queries, so a query can ride a
             SIBLING query's semantically-cached subplan; first-call
             codegen included.
  warm     — BENCH_DETAIL.json "queries": min-of-two, steady state.
  prodcold — BENCH_PRODCOLD.json "queries": one pass, cache + operator
             memo cleared BEFORE each query (JVM warm). Every query pays
             its own pins and shares nothing — "first run of the day" per
             query. prodcold − warm is the full pin-force + cache-build
             cost; queries where that dwarfs the warm saving are the
             pin-audit candidates.

Usage: python3 tools/three_tier_report.py [BENCH_DETAIL] [BENCH_PRODCOLD] [out_md]
"""
import json
import sys

detail_p = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
prod_p = sys.argv[2] if len(sys.argv) > 2 else "BENCH_PRODCOLD.json"
out_p = sys.argv[3] if len(sys.argv) > 3 else ""

detail = json.load(open(detail_p))
prod = json.load(open(prod_p))

cold = detail.get("queries_cold", {})
warm = detail.get("queries", {})
pc = prod.get("queries", {})

rows = []
for name in sorted(warm, key=lambda n: -pc.get(n, 0.0)):
    c, w, p = cold.get(name, -1), warm.get(name, -1), pc.get(name, -1)
    rows.append((name, c, w, p, (p - w) if (p >= 0 and w >= 0) else float("nan")))

lines = ["| query | cold | warm | prodcold | prodcold−warm |",
         "|---|---|---|---|---|"]
for name, c, w, p, d in rows:
    lines.append(f"| {name} | {c:.2f} | {w:.2f} | {p:.2f} | {d:+.2f} |")
tot = (sum(v for v in cold.values() if v >= 0),
       sum(v for v in warm.values() if v >= 0),
       sum(v for v in pc.values() if v >= 0))
lines.append(f"| **total** | **{tot[0]:.1f}** | **{tot[1]:.1f}** | "
             f"**{tot[2]:.1f}** | |")
md = "\n".join(lines)
print(md)
if out_p:
    with open(out_p, "w") as f:
        f.write(md + "\n")
