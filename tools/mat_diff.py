#!/usr/bin/env python3
"""Cross-run output-determinism check over two Bench artifacts.

Every full bench pass records, per query, a materializing forcing's
order-independent output hash (`mat_hash` = bit_xor of
xxhash64(to_json(struct(*)))) and row count (`mat_rows`). Two runs of
the same code on the same fixture must agree on BOTH for every query:
a mat_hash drift is a nondeterministic output (rand/time/partition-
order dependence leaking into result values); a mat_rows drift with a
stable hash is an even-multiplicity duplication the xor is blind to.

Usage: tools/mat_diff.py BENCH_a.json BENCH_b.json
Exit 0 = all overlapping queries agree; 1 = drift (listed); 2 = usage
or no overlapping mat data.
"""
import json
import sys


def mat_map(path):
    with open(path) as f:
        doc = json.loads(f.read())
    out = {}
    for q, m in (doc.get("metrics") or {}).items():
        if "mat_hash" in m:
            out[q] = (str(m.get("mat_hash")), str(m.get("mat_rows", "?")))
    return out


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = mat_map(sys.argv[1]), mat_map(sys.argv[2])
    common = sorted(set(a) & set(b))
    if not common:
        print("mat_diff: no overlapping mat_hash entries between the two artifacts")
        return 2
    drift = [q for q in common if a[q] != b[q]]
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    for q in drift:
        print(f"DRIFT {q}: hash/rows {a[q][0]}/{a[q][1]} vs {b[q][0]}/{b[q][1]}")
    if only_a:
        print(f"note: {len(only_a)} queries only in {sys.argv[1]}: {', '.join(only_a[:8])}...")
    if only_b:
        print(f"note: {len(only_b)} queries only in {sys.argv[2]}: {', '.join(only_b[:8])}...")
    print(f"mat_diff: {len(common) - len(drift)}/{len(common)} queries identical"
          f" ({len(drift)} drifted)")
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
