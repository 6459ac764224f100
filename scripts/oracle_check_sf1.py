#!/usr/bin/env python3
"""Per-gate timed replica of the driver's correctness gate for the sf1
exposure runs (r13 verdict #2): materializes the parquet tables as
NATIVE DuckDB tables first (the plain oracle_check's views re-scan
parquet on every CTE reference — at 6M-row tables the graph oracles'
repeated `e`/`deg` references make that quadratic-feeling), then runs
each requested gate's oracle with a wall-clock budget and prints the
per-gate verdict + seconds.

Usage: python3 scripts/oracle_check_sf1.py <sfDir> <verifyOutDir> <gate> [gate...]
"""
import glob
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
from oracle_check import TABLES, canon  # reuse the exact compare


def main(sf_dir, out_dir, gates):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        t0 = time.time()
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{src}')")
        print(f"load {t}: {time.time() - t0:.1f}s", flush=True)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in gates:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output", flush=True)
            failures += 1
            continue
        spark = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        t0 = time.time()
        try:
            ora = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}", flush=True)
            failures += 1
            continue
        sec = time.time() - t0
        ok = (len(spark) == len(ora)
              and list(spark.columns) == list(ora.columns)
              and spark.equals(ora))
        if ok:
            print(f"{name}: OK ({len(spark)} rows, oracle {sec:.1f}s)", flush=True)
        else:
            failures += 1
            neq = "?"
            if len(spark) == len(ora) and list(spark.columns) == list(ora.columns):
                bad = ((spark != ora) & ~(spark.isna() & ora.isna())).any(axis=1)
                neq = int(bad.sum())
            print(f"{name}: MISMATCH rows {len(spark)} vs {len(ora)}, "
                  f"cols {list(spark.columns)} vs {list(ora.columns)}, "
                  f"neq_rows={neq} (oracle {sec:.1f}s)", flush=True)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], sys.argv[3:]) else 0)
