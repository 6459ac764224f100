#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs
the matching oracle_sql.json entry in DuckDB against the same parquet
tables, and compares: row count, schema (column names + types after
sorting columns by name), and cell values (rows sorted by all columns).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # driver's hash compare is width-tolerant for integers (r01 q17 passed
    # with int32 vs int64); normalize so this checker matches its verdicts
    for c in df.columns:
        if str(df[c].dtype) in ("int8", "int16", "int32"):
            df[c] = df[c].astype("int64")
        # datetimes: unit (ns vs us), tz-awareness (DuckDB reads
        # isAdjustedToUTC parquet as TIMESTAMPTZ), and representation
        # (datetime64 vs boxed date objects) vary by reader; the driver
        # hashes VALUES, so normalize all to naive datetime64[us]
        elif str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) == "object":
            sample = df[c].dropna().head(5)
            if len(sample) and all(hasattr(v, "year") for v in sample):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")

    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver sf dirs hold single-file tables; synthesized probe dirs
        # (e.g. target/sf1full) hold spark-written directories
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            failures += 1
            continue
        spark = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        try:
            ora = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            failures += 1
            continue
        problems = []
        if len(spark) != len(ora):
            problems.append(f"rows {len(spark)} vs {len(ora)}")
        if list(spark.columns) != list(ora.columns):
            problems.append(f"cols {list(spark.columns)} vs {list(ora.columns)}")
        elif [str(d) for d in spark.dtypes] != [str(d) for d in ora.dtypes]:
            problems.append(
                f"dtypes {dict(zip(spark.columns, map(str, spark.dtypes)))} vs "
                f"{dict(zip(ora.columns, map(str, ora.dtypes)))}")
        elif len(spark) == len(ora) and not spark.equals(ora):
            neq = (spark != ora) & ~(spark.isna() & ora.isna())
            bad = neq.any(axis=1)
            problems.append(f"values differ in {int(bad.sum())} rows; first:\n"
                            f"spark={spark[bad].head(2).to_dict('records')}\n"
                            f"ora  ={ora[bad].head(2).to_dict('records')}")
        if problems:
            print(f"{name}: FAIL  " + "; ".join(problems))
            failures += 1
        else:
            print(f"{name}: OK ({len(spark)} rows)")
    queries_without_oracle = set()  # informational
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
