#!/usr/bin/env python3
"""Full-catalog scaling table (VERDICT r17 #1): join the per-query warm
and cold times from three bench detail artifacts (sf0.1, sf1 = 10x
replica, sf10 = 100x replica), compute the decade ratios, and flag
supralinear queries (ratio > data growth) for SCALE.md.

Usage: tools/scaling_table.py BENCH_DETAIL.json BENCH_SF1_DETAIL.json \
         BENCH_SF10_DETAIL.json [--flag-ratio 10]
Emits a markdown table on stdout, worst ratios first, plus totals."""
import json
import sys


def load(path):
    d = json.load(open(path))
    return d.get("queries", {}), d.get("queries_cold", {}), d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag = 10.0
    for a in sys.argv[1:]:
        if a.startswith("--flag-ratio"):
            flag = float(a.split("=", 1)[1])
    w01, c01, d01 = load(args[0])
    w1, c1, d1 = load(args[1])
    w10, c10, d10 = load(args[2])
    names = sorted(set(w01) & set(w1) & set(w10))
    rows = []
    for n in names:
        if min(w01[n], w1[n], w10[n]) < 0:
            rows.append((float("inf"), n, None))
            continue
        r01_1 = w1[n] / w01[n] if w01[n] > 0.005 else float("nan")
        r1_10 = w10[n] / w1[n] if w1[n] > 0.005 else float("nan")
        rows.append((r1_10, n, (w01[n], w1[n], w10[n], r01_1, r1_10,
                                c01.get(n, -1), c1.get(n, -1), c10.get(n, -1))))
    rows.sort(key=lambda t: -(t[0] if t[0] == t[0] else 0))
    print("| query | warm sf0.1 | warm sf1 | warm sf10 | x(0.1→1) | x(1→10) "
          "| cold sf0.1 | cold sf1 | cold sf10 |")
    print("|---|---|---|---|---|---|---|---|---|")
    sup = []
    for r, n, v in rows:
        if v is None:
            print(f"| {n} | FAILED | | | | | | | |")
            continue
        w0, w1_, w10_, ra, rb, cA, cB, cC = v
        mark = " ⚠" if (rb == rb and rb > flag) else ""
        if rb == rb and rb > flag:
            sup.append((n, rb))
        print(f"| {n}{mark} | {w0:.2f} | {w1_:.2f} | {w10_:.2f} | "
              f"{ra:.1f}× | {rb:.1f}× | {cA:.2f} | {cB:.2f} | {cC:.2f} |")
    t01 = sum(v for v in w01.values() if v >= 0)
    t1 = sum(v for v in w1.values() if v >= 0)
    t10 = sum(v for v in w10.values() if v >= 0)
    print(f"\nTOTAL warm: sf0.1 {t01:.1f} s -> sf1 {t1:.1f} s "
          f"({t1 / t01:.2f}x) -> sf10 {t10:.1f} s ({t10 / t1:.2f}x per decade; "
          f"data grows 10x per step)")
    print(f"common queries: {len(names)}; "
          f"supralinear (warm 1→10 ratio > {flag}x): "
          f"{', '.join(f'{n} {r:.1f}x' for n, r in sup) or 'none'}")


main()
