#!/usr/bin/env python3
"""Per-query scaling-exponent table: given a Bench JSON at sf0.1 and
one at sf1.0 (10x the rows), print exponent = log10(t_sf1 / t_sf01)
per query — 1.0 is linear, <1 sublinear (fixed per-job overhead
amortizing), >1 superlinear (the queries to watch at 100 TB).

Small-denominator caveat: queries under ~1 s at sf0.1 are dominated by
fixed scheduling overhead, so their exponent reads LOW; the table is
for spotting superlinear blowups, not precise complexity fits.

Usage: python3 tools/scaling_table.py BENCH_baseline_r4.json BENCH_sf1.json
"""
import json
import math
import sys


def qsecs(path):
    with open(path) as f:
        d = json.load(f)
    out = {}
    for k, v in d["queries"].items():
        out[k] = v["sec"] if isinstance(v, dict) else v
    return out


def main(base_path, sf1_path):
    base, sf1 = qsecs(base_path), qsecs(sf1_path)
    common = sorted(set(base) & set(sf1))
    rows = []
    for q in common:
        t0, t1 = base[q], sf1[q]
        exp = math.log10(t1 / t0) if t0 > 0 else float("nan")
        rows.append((q, t0, t1, exp))
    print(f"| query | sf0.1 s | sf1.0 s | exponent |")
    print(f"|---|---|---|---|")
    for q, t0, t1, exp in rows:
        flag = " **superlinear**" if exp > 1.15 and t1 > 2 else ""
        print(f"| {q} | {t0:.2f} | {t1:.2f} | {exp:.2f}{flag} |")
    worst = [r for r in rows if r[3] > 1.15 and r[2] > 2]
    print(f"\ntotal: sf0.1 {sum(base[q] for q in common):.1f} s -> "
          f"sf1.0 {sum(sf1[q] for q in common):.1f} s; "
          f"{len(worst)} queries worse than ~linear: "
          f"{', '.join(r[0] for r in worst) or 'none'}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
