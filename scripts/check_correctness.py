#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, compare to the Spark result parquet dumped
by graft.Verify (columns sorted by name, rows sorted, values hashed).

IMPORTANT: comparison goes through DuckDB's `.df()` → pandas, exactly
like the driver — NOT `fetchall()`. The difference matters: DuckDB
HUGEINT (the result type of SUM over BIGINT) converts to pandas
float64, so an uncast oracle-side SUM emits '3.0' where Spark's parquet
emits '3' and the hash diverges; `fetchall()` converts HUGEINT to a
Python int and masks exactly that class of failure (burned rounds 1–2).
Likewise pandas `sort_values` raises on array-typed cells, which the
driver reports as an oracle error — this replica must too.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import hashlib
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_prep(df):
    """Mirror the driver: lowercase + sort columns by name, then pandas
    sort_values over all columns (raises TypeError on array cells, like
    the driver's checker does)."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df


def frame_hash(df):
    h = hashlib.sha256()
    rows = sorted("\x01".join(canon(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\x02")
    return h.hexdigest()


def row_strings(df):
    return sorted("|".join(canon(v) for v in row)
                  for row in df.itertuples(index=False, name=None))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = n_rows_only = 0
    for name in names:
        sdf = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            n_rows_only += 1
            print(f"ROWS_ONLY  {name:35s} rows={len(sdf)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
            sdf = frame_prep(sdf)
            odf = frame_prep(odf)
        except Exception as e:
            n_bad += 1
            print(f"ORACLE_ERR {name:35s} {e}")
            continue
        schema_ok = list(sdf.columns) == list(odf.columns)
        rows_ok = len(sdf) == len(odf)
        hash_ok = schema_ok and frame_hash(sdf) == frame_hash(odf)
        if schema_ok and rows_ok and hash_ok:
            n_ok += 1
            print(f"OK         {name:35s} rows={len(sdf)}")
        else:
            n_bad += 1
            print(f"MISMATCH   {name:35s} schema={schema_ok} "
                  f"rows={len(sdf)}/{len(odf)} hash={hash_ok}")
            if schema_ok and len(sdf) and len(odf):
                for a, b in list(zip(row_strings(sdf), row_strings(odf)))[:2000]:
                    if a != b:
                        print(f"    spark : {a[:160]}")
                        print(f"    oracle: {b[:160]}")
                        break
            elif not schema_ok:
                print(f"    spark cols : {list(sdf.columns)}")
                print(f"    oracle cols: {list(odf.columns)}")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rows_only} rows-only "
          f"of {len(names)} queries")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
