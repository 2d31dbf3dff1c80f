#!/usr/bin/env python
"""Per-query task-CPU comparison between two Bench artifacts (VERDICT
r16 #3: adjudicate round-over-round CPU drift the way DRIFT_r16 §8
compared same-round pairs — per-query ratios, not totals).

Usage: python tools/cpu_compare.py A.json B.json [min_cpu_ms]

Reads the `metrics.<query>.task_cpu_ms` map from each artifact (git
refs work too: pass `<commit>:<path>` and it is resolved via git
show), joins on query name, and prints the ratio distribution B/A
over queries whose A-side CPU exceeds `min_cpu_ms` (default 200 —
sub-0.2 s queries measure scheduler noise, not kernels), plus the
biggest movers. A median ratio ≈ 1.0 with fat tails on both sides is
ambient-load class; a shifted median is a real drift worth
root-causing.
"""
import json
import subprocess
import sys


def load(ref):
    if ":" in ref and not ref.endswith(".json") or (":" in ref and "/" in ref.split(":", 1)[1]):
        out = subprocess.run(["git", "show", ref], capture_output=True, text=True)
        if out.returncode:
            sys.exit(f"git show {ref} failed: {out.stderr.strip()}")
        return json.loads(out.stdout)
    try:
        return json.load(open(ref))
    except FileNotFoundError:
        out = subprocess.run(["git", "show", ref], capture_output=True, text=True)
        if out.returncode:
            sys.exit(f"cannot read {ref} as file or git ref")
        return json.loads(out.stdout)


def cpu_map(d):
    return {q: float(m["task_cpu_ms"]) for q, m in d.get("metrics", {}).items()
            if "task_cpu_ms" in m}


def main(a_ref, b_ref, min_cpu=200.0):
    a, b = load(a_ref), load(b_ref)
    ca, cb = cpu_map(a), cpu_map(b)
    common = sorted(set(ca) & set(cb))
    rows = [(q, ca[q], cb[q], cb[q] / ca[q]) for q in common if ca[q] >= min_cpu]
    if not rows:
        sys.exit("no comparable queries")
    ratios = sorted(r[3] for r in rows)
    n = len(ratios)
    med = ratios[n // 2]
    p25, p75 = ratios[n // 4], ratios[3 * n // 4]
    tot_a = sum(r[1] for r in rows) / 1000.0
    tot_b = sum(r[2] for r in rows) / 1000.0
    print(f"A = {a_ref}  (env {a.get('env')})")
    print(f"B = {b_ref}  (env {b.get('env')})")
    print(f"comparable queries (A cpu >= {min_cpu} ms): {n}")
    print(f"CPU totals over comparable set: A {tot_a:.1f} s   B {tot_b:.1f} s   "
          f"(B/A {tot_b / tot_a:.3f})")
    print(f"per-query B/A ratio: p25 {p25:.3f}  median {med:.3f}  p75 {p75:.3f}")
    movers = sorted(rows, key=lambda r: r[3])
    print("biggest down-movers (B faster):")
    for q, x, y, r in movers[:5]:
        print(f"  {r:6.3f}  {q}  {x / 1000:.2f}s -> {y / 1000:.2f}s")
    print("biggest up-movers (B slower):")
    for q, x, y, r in movers[-5:]:
        print(f"  {r:6.3f}  {q}  {x / 1000:.2f}s -> {y / 1000:.2f}s")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 200.0))
