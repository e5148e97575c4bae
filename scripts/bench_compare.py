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

SECOND GATE (ADVICE r19): the sentinel runs through the engine under
test, so an engine change that slows EVERYTHING slows the sentinel
identically and normalization alone would read it as host regime.
Two backstops: (a) a query whose RAW ratio exceeds a looser ceiling
(2x the threshold's headroom over 1.0, i.e. raw > 1 + 2*(threshold-1))
is flagged regardless of normalization; (b) a sentinel ratio outside
[0.6, 1.6] — more than plausible host drift — exits non-zero with a
regime warning even when no per-query flag fires, so an
across-the-board regression cannot ride the normalizer to exit 0.
"""
import json
import re
import sys


def load(path):
    """Accept either the Bench JSON line ({"queries": {...}}) or the
    driver's round wrapper ({"tail": "<truncated output>"}) — in the
    latter case scrape whatever per-query timings survive truncation.
    Returns (queries, sentinel_or_None). Round artifacts hold the 3
    final Bench stdout lines; a full multi-pass Bench stdout holds one
    queries-bearing line PER PASS — keep the one with the highest
    `reps` field (ties: the last), so pass-1 single-rep timings never
    shadow the final-pass medians (ADVICE r19)."""
    d = None
    best_reps = -1
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d is None and "queries" not in cand:
            d = cand  # tail-wrapper fallback, only if nothing better
        if "queries" in cand:
            reps = cand.get("reps", 0)
            reps = reps if isinstance(reps, (int, float)) else 0
            if "queries" not in (d or {}) or reps >= best_reps:
                d, best_reps = cand, reps
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
    regime_bad = False
    if base_sent and cur_sent:
        norm = cur_sent / base_sent
        print(f"sentinel: base {base_sent:.3f}s -> current {cur_sent:.3f}s "
              f"(host regime {norm:.3f}x); flagging on sentinel-normalized "
              f"ratios")
        # a sentinel ratio host drift alone can't plausibly explain is
        # itself a finding — an engine-wide slowdown moves the sentinel
        # too, and normalizing by it would hide the regression entirely
        if not (0.6 <= norm <= 1.6):
            regime_bad = True
            print(f"WARNING: sentinel ratio {norm:.3f}x is outside the "
                  f"host-drift band [0.6, 1.6] — either the host regime "
                  f"shifted drastically or the ENGINE regressed uniformly "
                  f"(the sentinel runs through the engine under test); "
                  f"adjudicate before trusting normalized ratios")
    else:
        print("sentinel: absent in one or both artifacts; flagging on raw "
              "ratios")
    # raw ceiling: normalization must not absolve a query whose raw
    # ratio exceeds the threshold's headroom doubled (threshold 1.5 ->
    # raw ceiling 2.0)
    raw_ceiling = 1.0 + 2.0 * (threshold - 1.0)
    regressed = []
    for q in sorted(cur):
        if q not in base:
            print(f"NEW        {q:45s} {cur[q]:6.2f}s")
            continue
        b, c = base[q], cur[q]
        raw = c / b if b > 0 else float("inf")
        ratio = raw / norm
        noise_ok = b >= 0.3 or c > 1.0
        flag = (ratio > threshold or raw > raw_ceiling) and noise_ok
        mark = ("REGRESSED" if flag
                else ("ok       " if ratio <= threshold else "noisy    "))
        print(f"{mark}  {q:45s} {b:6.2f}s -> {c:6.2f}s  "
              f"(raw {raw:4.2f}x, norm {ratio:4.2f}x)")
        if flag:
            regressed.append(q)
    removed = sorted(set(base) - set(cur))
    for q in removed:
        print(f"REMOVED    {q}")
    if regressed:
        print(f"\n{len(regressed)} queries regressed (norm >{threshold}x "
              f"or raw >{raw_ceiling}x): {regressed}")
        return 1
    if regime_bad:
        print(f"\nno per-query flags, but the sentinel ratio {norm:.3f}x "
              f"exceeds plausible host drift — failing for adjudication")
        return 2
    print(f"\nno regressions beyond {threshold}x "
          f"({len(cur)} queries, {len(set(cur) - set(base))} new)")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
