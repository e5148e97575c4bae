#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, compare to the Spark result parquet dumped
by graft.Verify (columns sorted by name, rows sorted, values hashed).

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import hashlib
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode("utf-8"))
        h.update(b"\x02")
    return h.hexdigest()


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
        res = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols = [c.lower() for c in res.columns]
        spark_rows = res.fetchall()
        if name not in oracles:
            n_rows_only += 1
            print(f"ROWS_ONLY  {name:35s} rows={len(spark_rows)}")
            continue
        try:
            ores = con.sql(oracles[name])
            o_cols = [c.lower() for c in ores.columns]
            o_rows = ores.fetchall()
        except Exception as e:
            n_bad += 1
            print(f"ORACLE_ERR {name:35s} {e}")
            continue
        schema_ok = sorted(spark_cols) == sorted(o_cols)
        rows_ok = len(spark_rows) == len(o_rows)
        hash_ok = (schema_ok and
                   frame_hash(spark_cols, spark_rows) == frame_hash(o_cols, o_rows))
        if schema_ok and rows_ok and hash_ok:
            n_ok += 1
            print(f"OK         {name:35s} rows={len(spark_rows)}")
        else:
            n_bad += 1
            print(f"MISMATCH   {name:35s} schema={schema_ok} "
                  f"rows={len(spark_rows)}/{len(o_rows)} hash={hash_ok}")
            if schema_ok and len(spark_rows) and len(o_rows):
                order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                s_set = sorted("|".join(canon(r[i]) for i in order) for r in spark_rows)
                oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                o_set = sorted("|".join(canon(r[i]) for i in oo) for r in o_rows)
                for a, b in list(zip(s_set, o_set))[:2000]:
                    if a != b:
                        print(f"    spark : {a[:160]}")
                        print(f"    oracle: {b[:160]}")
                        break
            elif not schema_ok:
                print(f"    spark cols : {sorted(spark_cols)}")
                print(f"    oracle cols: {sorted(o_cols)}")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rows_only} rows-only "
          f"of {len(names)} queries")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
