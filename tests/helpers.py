"""Differential-oracle comparison helpers.

Reproduces the driver's compare contract (see ``__spark_entry__.py``):
row count + schema (column names) + order-insensitive value comparison.
Columns are sorted by name, rows sorted by all columns; floats compared
with a small tolerance (Spark and DuckDB sum doubles in different orders).
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for col in out.columns:
        if out[col].dtype == object:
            out[col] = out[col].map(lambda v: str(v) if v is not None else None)
        if str(out[col].dtype).startswith("datetime64"):
            out[col] = out[col].astype("datetime64[us]")
        if str(out[col].dtype) in ("uint64", "UInt64", "int32", "Int64", "uint32"):
            out[col] = out[col].astype("int64")
        if str(out[col].dtype) in ("float32",):
            out[col] = out[col].astype("float64")
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol=1e-9):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row count mismatch: {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64")
            bv = bv.astype("float64")
            for i, (x, y) in enumerate(zip(av, bv)):
                if x is None or (isinstance(x, float) and math.isnan(x)):
                    assert y is None or math.isnan(y), f"{col}[{i}]: {x} vs {y}"
                else:
                    assert math.isclose(x, y, rel_tol=rtol, abs_tol=1e-9), (
                        f"{col}[{i}]: {x} vs {y}"
                    )
        else:
            pd.testing.assert_series_equal(
                av, bv, check_names=False, check_dtype=False, obj=f"column {col}"
            )


def assert_matches_oracle(spark_df, duck, sql: str, rtol=1e-9):
    assert_frames_match(spark_df.toPandas(), duck.execute(sql).df(), rtol=rtol)
