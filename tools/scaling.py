#!/usr/bin/env python3
"""Scaling-audit table: per-query t(sfB)/t(sfA) ratios from two Bench
JSON lines. Usage: scaling.py benchA.json benchB.json [factor]"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(set(qa) & set(qb)):
        ta, tb = qa[name], qb[name]
        if ta <= 0 or tb <= 0:
            rows.append((name, ta, tb, None))
        else:
            rows.append((name, ta, tb, tb / ta))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"| query | t(A) s | t(B) s | ratio (linear = {factor:.0f}x) |")
    print("|---|---|---|---|")
    for name, ta, tb, r in rows:
        rs = f"{r:.1f}x" if r else "err"
        print(f"| {name} | {ta:.2f} | {tb:.2f} | {rs} |")
    tot_a = sum(qa[n] for n in qa)
    tot_b = sum(qb[n] for n in qb)
    print(f"\ntotals: A={tot_a:.1f}s B={tot_b:.1f}s ratio={tot_b/tot_a:.2f}x "
          f"(data factor {factor:.0f}x)")
    worse = [n for n, ta, tb, r in rows if r and r > factor * 1.3]
    print("worse than ~linear:", worse or "none")


if __name__ == "__main__":
    main()
