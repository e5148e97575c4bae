#!/usr/bin/env python3
"""Per-query bench regression check against a baseline round
(VERDICT r1 #10: BENCH_r01.json is the regression floor).

Usage: bench_compare.py <baseline.json> <current.json> [threshold]

Prints per-query ratios for queries present in both files and exits
non-zero if any query regressed beyond `threshold` (default 1.5x).
Queries new in `current` are listed informationally. Sub-second
baselines are noisy at local scale, so queries under 0.3s in the
baseline are only flagged when they also exceed 1.0s now.
"""
import json
import re
import sys


def load_queries(path):
    """Accept either the Bench JSON line ({"queries": {...}}) or the
    driver's round wrapper ({"tail": "<truncated output>"}) — in the
    latter case scrape whatever per-query timings survive truncation."""
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    pairs = re.findall(r'"(q[0-9][0-9a-z_]+)":([0-9.]+)', d.get("tail", ""))
    return {k: float(v) for k, v in pairs}


def main(base_path, cur_path, threshold=1.5):
    base = load_queries(base_path)
    cur = load_queries(cur_path)
    regressed = []
    for q in sorted(cur):
        if q not in base:
            print(f"NEW        {q:45s} {cur[q]:6.2f}s")
            continue
        b, c = base[q], cur[q]
        ratio = c / b if b > 0 else float("inf")
        flag = ratio > threshold and (b >= 0.3 or c > 1.0)
        mark = "REGRESSED" if flag else ("ok       " if ratio <= threshold else "noisy    ")
        print(f"{mark}  {q:45s} {b:6.2f}s -> {c:6.2f}s  ({ratio:4.2f}x)")
        if flag:
            regressed.append(q)
    removed = sorted(set(base) - set(cur))
    for q in removed:
        print(f"REMOVED    {q}")
    if regressed:
        print(f"\n{len(regressed)} queries regressed >{threshold}x: {regressed}")
        return 1
    print(f"\nno regressions beyond {threshold}x "
          f"({len(cur)} queries, {len(set(cur) - set(base))} new)")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
