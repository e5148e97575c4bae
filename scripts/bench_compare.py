#!/usr/bin/env python3
"""Per-query bench regression check against a baseline round
(VERDICT r1 #10: BENCH_r01.json is the regression floor).

Usage: bench_compare.py <baseline.json> <current.json> [threshold]

Prints per-query ratios for queries present in both files and exits
non-zero if any query regressed beyond `threshold` (default 1.5x).
Queries new in `current` are listed informationally. Sub-second
baselines are noisy at local scale, so queries under 0.3s in the
baseline are only flagged when they also exceed 1.0s now.

HOST-REGIME NORMALIZATION (VERDICT r18 item 2): when BOTH artifacts
carry the Bench sentinel ({"sentinel":{"start":s,"end":e}} — a pinned
zero-I/O calibration probe run at window start and end), per-query
ratios are divided by the sentinel ratio (min(start,end) each side,
the quiet-cost estimator) before flagging. A uniform 1.3x host drift
then reads as ratio ~1.0 everywhere instead of 200 spurious flags,
while a real per-query regression stays visible. Raw ratios are still
printed alongside. Either artifact lacking a sentinel falls back to
raw-ratio flagging (the pre-r19 behavior).
"""
import json
import re
import sys


def load(path):
    """Accept either the Bench JSON line ({"queries": {...}}) or the
    driver's round wrapper ({"tail": "<truncated output>"}) — in the
    latter case scrape whatever per-query timings survive truncation.
    Returns (queries, sentinel_or_None). Round artifacts hold the 3
    final Bench stdout lines — pick the first line that parses and
    carries per-query data."""
    d = None
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d is None or ("queries" in cand and "queries" not in d):
            d = cand
        if "queries" in d:
            break
    if d is None:
        raise SystemExit(f"no parseable JSON line in {path}")
    sent = None
    s = d.get("sentinel")
    if isinstance(s, dict):
        vals = [v for v in (s.get("start"), s.get("end"))
                if isinstance(v, (int, float)) and v > 0]
        if vals:
            sent = min(vals)
    if "queries" in d:
        return d["queries"], sent
    pairs = re.findall(r'"(q[0-9][0-9a-z_]+)":([0-9.]+)', d.get("tail", ""))
    return {k: float(v) for k, v in pairs}, sent


def main(base_path, cur_path, threshold=1.5):
    base, base_sent = load(base_path)
    cur, cur_sent = load(cur_path)
    norm = 1.0
    if base_sent and cur_sent:
        norm = cur_sent / base_sent
        print(f"sentinel: base {base_sent:.3f}s -> current {cur_sent:.3f}s "
              f"(host regime {norm:.3f}x); flagging on sentinel-normalized "
              f"ratios")
    else:
        print("sentinel: absent in one or both artifacts; flagging on raw "
              "ratios")
    regressed = []
    for q in sorted(cur):
        if q not in base:
            print(f"NEW        {q:45s} {cur[q]:6.2f}s")
            continue
        b, c = base[q], cur[q]
        raw = c / b if b > 0 else float("inf")
        ratio = raw / norm
        flag = ratio > threshold and (b >= 0.3 or c > 1.0)
        mark = "REGRESSED" if flag else ("ok       " if ratio <= threshold else "noisy    ")
        print(f"{mark}  {q:45s} {b:6.2f}s -> {c:6.2f}s  "
              f"(raw {raw:4.2f}x, norm {ratio:4.2f}x)")
        if flag:
            regressed.append(q)
    removed = sorted(set(base) - set(cur))
    for q in removed:
        print(f"REMOVED    {q}")
    if regressed:
        print(f"\n{len(regressed)} queries regressed >{threshold}x "
              f"(sentinel-normalized): {regressed}")
        return 1
    print(f"\nno regressions beyond {threshold}x "
          f"({len(cur)} queries, {len(set(cur) - set(base))} new)")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
