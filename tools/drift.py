#!/usr/bin/env python3
"""Scale-drift table from a series of Bench artifacts.

Usage: python3 tools/drift.py out.md f1.json:SF1 f2.json:SF2 [...]

Each artifact is a Bench JSON (full map with per-query metrics). For
every query present in all artifacts, prints wall seconds per SF, the
fitted power-law exponent of wall vs SF (least squares on log-log over
all points), and the same for task CPU seconds — the
contention-independent signal. Streaming queries use their engine
seconds when present.
"""
import json
import math
import sys


def load(spec):
    path, sf = spec.rsplit(":", 1)
    with open(path) as f:
        return float(sf), json.load(f)


def fit_exponent(xs, ys):
    # least-squares slope in log-log space; ignore nonpositive values
    pts = [(math.log(x), math.log(y)) for x, y in zip(xs, ys) if y > 0]
    if len(pts) < 2:
        return float("nan")
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    d = n * sxx - sx * sx
    return (n * sxy - sx * sy) / d if d else float("nan")


def main():
    out = sys.argv[1]
    runs = [load(s) for s in sys.argv[2:]]
    runs.sort(key=lambda r: r[0])
    sfs = [r[0] for r in runs]
    names = set(runs[0][1]["queries"])
    for _, d in runs[1:]:
        names &= set(d["queries"])
    base = [n for n in sorted(names) if not n.endswith("__engine_s")
            and not n.endswith("__harness_s")]
    rows = []
    for q in base:
        walls = []
        cpus = []
        for _, d in runs:
            eng = d["queries"].get(q + "__engine_s")
            walls.append(eng if eng is not None else d["queries"][q])
            m = d.get("metrics", {}).get(q, {})
            cpus.append(float(m.get("task_cpu_ms", 0)) / 1000.0)
        rows.append((q, walls, fit_exponent(sfs, walls),
                     cpus, fit_exponent(sfs, cpus)))
    rows.sort(key=lambda r: -(r[1][-1]))
    with open(out, "w") as f:
        hdr = " | ".join(f"s@sf{sf:g}" for sf in sfs)
        f.write(f"| query | {hdr} | wall exp | cpu exp |\n")
        f.write("|---" * (len(sfs) + 3) + "|\n")
        for q, walls, we, cpus, ce in rows:
            ws = " | ".join(f"{w:.2f}" for w in walls)
            f.write(f"| {q} | {ws} | {we:.2f} | {ce:.2f} |\n")
    for q, walls, we, cpus, ce in rows:
        flag = " <-- SUPERLINEAR" if we > 1.2 and walls[-1] > 2 else ""
        print(f"{q:28s} wall_exp={we:5.2f} cpu_exp={ce:5.2f} "
              f"last={walls[-1]:8.2f}s{flag}")


if __name__ == "__main__":
    main()
