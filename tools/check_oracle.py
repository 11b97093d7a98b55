#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__.py`` on Spark and its
``oracle_sql()`` on DuckDB at sf0.01 (or --sf-dir), then compares row
count, sorted column names, and an order-insensitive value hash (floats
formatted fixed-point to 6 decimal places before hashing to absorb
summation-order noise — queries should pre-round displayed doubles so the
tolerance is adequate). Exit code 1 if anything mismatches.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df.copy()
    df = df[sorted(df.columns)]
    for col in df.columns:
        s = df[col]
        dt = str(s.dtype)
        if dt.startswith("datetime64"):
            df[col] = s.astype("datetime64[us]").map(
                lambda v: v.isoformat() if pd.notna(v) else ""
            )
        elif s.dtype.kind == "f":
            df[col] = s.map(lambda v: "" if pd.isna(v) else f"{v:.6f}")
        elif s.dtype.kind in "iu":
            df[col] = s.astype("int64").map(str)
        elif dt == "bool":
            df[col] = s.map(str)
        else:
            df[col] = s.map(lambda v: "" if v is None or v is pd.NA else str(v))
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--window",
        action="store_true",
        help="run exactly the driver's 50-entry correctness window "
        "(the first 50 of queries() in rotation order)",
    )
    args = ap.parse_args()

    import __spark_entry__ as e
    from audience_manager_platform_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    if args.window:
        only = set(list(qs)[:50])
    failed, no_oracle = [], []
    n_run = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            no_oracle.append(name)
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value hash")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failed.append(name)
        else:
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{n_run - len(failed)}/{n_run} ok; {len(no_oracle)} rows-only; "
        f"{len(failed)} failed: {failed or '-'}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
