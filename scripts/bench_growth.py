#!/usr/bin/env python3
"""Dedicated-JVM growth measurement for the dedup family (r16 verdict
item 4): q91/q195/q182/q203 at sf0.1 / sf1 / sf3, each query in its own
fresh JVM (reps inside, min+median recorded), merged into ONE artifact
with the corpus sizes so SCALING.md's growth-exponent table is
reproducible.

Usage: bench_growth.py <out.json> [reps=3] [comma,separated,queries]
(r17: the query list is overridable — verdict item 3 extends the suite
to the ANN and split families q173/q210/q211/q212 plus the new q213.)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_dedicated import run_one  # noqa: E402

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1", {}),
    ("sf1", "/root/repo/target/sf1", {"SPARK_GRAFT_MAX_PART_BYTES": "524288"}),
    ("sf3", "/root/repo/target/sf3", {"SPARK_GRAFT_MAX_PART_BYTES": "524288"}),
]
QUERIES = [
    "q91_dedup_minhash_md5",
    "q195_dedup_minhash_oph",
    "q182_containment_pairs",
    "q203_curated_scrub_export",
]


def main():
    out_path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    queries = sys.argv[3].split(",") if len(sys.argv) > 3 else QUERIES
    merged = {}
    for scale, sf_dir, env in SCALES:
        merged[scale] = {"sf_dir": sf_dir}
        for name in queries:
            os.environ.update(env)
            print(f"[growth] {scale} {name}...", flush=True)
            r = run_one(name, sf_dir, reps)
            for k in env:
                os.environ.pop(k, None)
            merged[scale][name] = r
            if "min" in r:
                print(f"[growth]   -> min {r['min']:.2f} s median "
                      f"{r['median']:.2f} s", flush=True)
            else:
                print(f"[growth]   -> ERROR {r}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"metric": "growth", "reps": reps, "scales": merged}, f,
                  indent=1)
    print(f"[growth] wrote {out_path}")


if __name__ == "__main__":
    main()
