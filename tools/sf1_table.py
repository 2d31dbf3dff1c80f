#!/usr/bin/env python3
"""Regenerate the full-suite sf0.1->sf1 ratio table (markdown) from two
Bench full-map JSONs. Streaming __engine_s/__harness_s keys are skipped.

Usage: sf1_table.py BENCH_local_full.json BENCH_sf1_full.json
Prints the table plus totals and a >=linear watchlist to stdout.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    ap = {k: v for k, v in a.items() if "__" not in k}
    bp = {k: v for k, v in b.items() if "__" not in k}
    rows = []
    for k in sorted(set(ap) & set(bp)):
        r = bp[k] / ap[k] if ap[k] > 0 else 0.0
        rows.append((r, k, ap[k], bp[k]))
    rows.sort(key=lambda x: -x[0])
    print("| query | sf0.1 s | sf1 s | ratio (linear = 10x) |")
    print("|---|---|---|---|")
    for r, k, x, y in rows:
        print(f"| {k} | {x:.2f} | {y:.2f} | {r:.1f}x |")
    ta, tb = sum(ap.values()), sum(bp.values())
    print(f"\ntotals: {ta:.1f} s -> {tb:.1f} s = {tb/ta:.2f}x for 10x data; "
          f"{sum(1 for r, *_ in rows if r <= 10)}/{len(rows)} at or below linear")
    watch = [(k, round(r, 1)) for r, k, *_ in rows if r >= 10]
    print("at/above linear:", watch or "none")


if __name__ == "__main__":
    main()
