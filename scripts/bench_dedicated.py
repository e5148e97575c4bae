#!/usr/bin/env python3
"""Dedicated-JVM re-measurement of the heaviest bench entries (r15
verdict item 3, standing protocol).

The in-catalog numbers of the heaviest sf1 queries are neighbor-heap
artifacts: 200 queries share one JVM, so a 30+ s pair aggregate runs
against whatever heap/allocator state its ~199 neighbors left behind
(q182's in-catalog median has ranged 37-52 s while its dedicated band is
16-24 s). This script takes an in-catalog artifact, picks the top-N
entries by median, re-runs EACH in its own fresh sbt/Spark JVM
(SPARK_GRAFT_ONLY=<query>, same reps / sf dir / partition bytes), and
writes ONE merged artifact holding both numbers side by side — the
dedicated min becomes the number of record for those queries.

Usage:
  bench_dedicated.py <in_catalog.json> <sfDir> <out.json> [topN=10] [reps=3]
"""
import json
import os
import re
import subprocess
import sys


def run_one(name, sf_dir, reps):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_ONLY": name,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": env.get("SPARK_GRAFT_CPUS", "32"),
        "SPARK_GRAFT_REPS": str(reps),
        "SPARK_GRAFT_BUDGET_SEC": "100000",
    })
    # exact scale-token match: a substring test ("sf1" in sf_dir) would
    # also hit sf10/sf15 paths and apply the wrong partition bytes
    if os.path.basename(sf_dir.rstrip("/")) == "sf1":
        env.setdefault("SPARK_GRAFT_MAX_PART_BYTES", "524288")
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    lines = re.findall(r'\{"metric".*"spread".*\}', out.stdout)
    if not lines:
        return {"error": (out.stdout[-500:] + out.stderr[-500:])[-500:]}
    spread = json.loads(lines[-1])["spread"]
    return spread.get(name, {"error": f"{name} missing from spread"})


def main():
    in_catalog, sf_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    selector = sys.argv[4] if len(sys.argv) > 4 else "10"
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    with open(in_catalog) as f:
        base = json.loads(f.readline())
    spread = base["spread"]
    if selector.isdigit():
        heaviest = sorted(
            ((v["median"], k) for k, v in spread.items()
             if v.get("median", -1) > 0),
            reverse=True)[:int(selector)]
    else:
        # explicit comma-separated query list (r18 verdict item 3: the
        # variance-exposed heavies, not an N-by-median cut)
        names = [n for n in selector.split(",") if n]
        missing = [n for n in names if n not in spread]
        if missing:
            sys.exit(f"queries not in {in_catalog}: {missing}")
        heaviest = [(spread[n]["median"], n) for n in names]
    merged = {}
    for med, name in heaviest:
        print(f"[dedicated] {name} (in-catalog median {med:.2f} s)...",
              flush=True)
        ded = run_one(name, sf_dir, reps)
        merged[name] = {"in_catalog": spread[name], "dedicated": ded}
        if "min" in ded:
            print(f"[dedicated]   -> min {ded['min']:.2f} s "
                  f"median {ded['median']:.2f} s", flush=True)
        else:
            print(f"[dedicated]   -> ERROR {ded}", flush=True)
    artifact = {
        "metric": "dedicated",
        "source_artifact": os.path.basename(in_catalog),
        "sf": sf_dir,
        "reps": reps,
        "queries": merged,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[dedicated] wrote {out_path}")


if __name__ == "__main__":
    main()
