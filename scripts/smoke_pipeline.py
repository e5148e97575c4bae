#!/usr/bin/env python3
"""End-to-end PROCESS smoke of the CLI entry points (r16 verdict item 5).

CurationChainSpec proves the job BODY equals q203 in-JVM; this script
proves the actual `main`s work as operating-system processes:

  1. `PipelineMain gen-topics`  — seeded landed-topic layout (S8-S10)
  2. `PipelineMain <landed> <out>` — ingest → clean → all eight tasks
  3. `PipelineMain curate <sfDir> <out>` — the q203 curation chain as a
     job, asserted BIT-EQUAL (via DuckDB row hashing) to the q203
     catalog result dumped by `graft.Verify`, plus the stats artifact
     re-derived from the landed files.

Usage: scripts/smoke_pipeline.py [sfDir=/root/testdata/sf0.001]
Exits non-zero on any assertion; prints one PASS line per stage.
"""
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sbt(main_args, env_extra=None):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    env.update(env_extra or {})
    r = subprocess.run(["sbt", "-batch", f"runMain {main_args}"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    if r.returncode != 0:
        sys.exit(f"FAIL: sbt runMain {main_args}\n{r.stdout[-2000:]}\n{r.stderr[-500:]}")
    return r.stdout


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import duckdb
    tmp = tempfile.mkdtemp(prefix="graft-smoke-")

    # --- stage 1+2: generator CLI -> pin pipeline CLI ---
    landed = f"{tmp}/landed"
    sbt(f"graft.run.PipelineMain gen-topics {landed} 400 42")
    npins = len(glob.glob(f"{landed}/topics/pin/partition=*/*.json"))
    assert npins > 0, "gen-topics wrote no pin files"
    pinout = f"{tmp}/pinout"
    sbt(f"graft.run.PipelineMain {landed} {pinout}")
    con = duckdb.connect()
    for t in ["clean/pin", "clean/geo", "clean/user"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{pinout}/{t}/*.parquet')").fetchone()[0]
        assert n > 0, f"{t} is empty"
    tasks = sorted(os.listdir(f"{pinout}/tasks"))
    assert len(tasks) >= 8, f"expected >=8 task outputs, got {tasks}"
    for t in tasks:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{pinout}/tasks/{t}/*.parquet')").fetchone()[0]
        assert n > 0, f"task {t} is empty"
    print(f"PASS pin pipeline: {npins} landed files -> 3 clean tables + "
          f"{len(tasks)} task outputs", flush=True)

    # --- stage 3: curate CLI vs the q203 catalog result ---
    curout = f"{tmp}/curout"
    sbt(f"graft.run.PipelineMain curate {sf} {curout}")
    vdir = f"{tmp}/verify"
    sbt(f"graft.Verify {sf} {vdir}", {"SPARK_GRAFT_ONLY": "q203"})
    q203 = f"{vdir}/q203_curated_scrub_export"  # Verify writes a dir per query

    def canon(path):
        cols = [d[0] for d in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()]
        # NULL-preserving row hash (r16 advice): concat_ws SKIPS NULLs,
        # so rows differing only in WHICH column is NULL would hash
        # identical; coalesce each column to a sentinel that cannot
        # appear in real values so NULL position survives the concat.
        sel = ", ".join(
            f"coalesce(CAST({c} AS VARCHAR), chr(9216))" for c in sorted(cols))
        return con.execute(
            f"SELECT count(*), count(DISTINCT md5(concat_ws('|', {sel}))) , "
            f"md5(string_agg(md5(concat_ws('|', {sel})), '' ORDER BY "
            f"md5(concat_ws('|', {sel})))) FROM read_parquet('{path}')").fetchone()

    job, cat = canon(f"{curout}/curated/*.parquet"), canon(f"{q203}/*.parquet")
    assert job == cat, f"curate job != q203 catalog result: {job} vs {cat}"

    stats = json.loads(open(glob.glob(f"{curout}/stats/part-*.json")[0]).read())
    n_exp, n_rem = con.execute(
        f"SELECT count(*), sum(n_removed) FROM read_parquet('{curout}/curated/*.parquet')").fetchone()
    n_in = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet')").fetchone()[0]
    assert stats["n_exported"] == n_exp and stats["chunks_removed"] == n_rem \
        and stats["n_input"] == n_in, f"stats artifact mismatch: {stats}"
    print(f"PASS curate: job == q203 ({job[0]} rows, set-hash {job[2][:12]}…), "
          f"stats {{n_input: {n_in}, n_exported: {n_exp}, chunks_removed: {n_rem}}}",
          flush=True)
    print(f"SMOKE PASS ({tmp})")


if __name__ == "__main__":
    main()
