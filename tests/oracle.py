"""Local mimic of the driver's DuckDB correctness gate.

Runs a queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, then compares row count, column names, and values
(order-insensitive, float-tolerant). Used by tests so oracle drift is caught
before the driver runs.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.map(lambda v: str(v) if v is not None else None)
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(spark_df, duck_df: pd.DataFrame, float_tol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    a = _normalize(spark_df.toPandas())
    b = _normalize(duck_df)
    errs = []
    if list(a.columns) != list(b.columns):
        errs.append(f"columns: spark={list(a.columns)} duck={list(b.columns)}")
        return errs
    if len(a) != len(b):
        errs.append(f"rowcount: spark={len(a)} duck={len(b)}")
        return errs
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av, bv)):
                if x is None and y is None:
                    continue
                xf = float("nan") if x is None else float(x)
                yf = float("nan") if y is None else float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                if abs(xf - yf) > float_tol * max(1.0, abs(xf), abs(yf)):
                    errs.append(f"col {c} row {i}: {x} != {y}")
                    break
        else:
            neq = av.astype(str).fillna("") != bv.astype(str).fillna("")
            if neq.any():
                i = int(neq.idxmax())
                errs.append(f"col {c} row {i}: {av[i]!r} != {bv[i]!r}")
    return errs


def run_query_vs_oracle(spark, name: str, sf_dir: str) -> list[str]:
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry = importlib.import_module("__spark_entry__")
    qs, osql = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    if name not in osql:
        n = sdf.count()
        return [] if n >= 0 else [f"{name}: spark query failed"]
    con = duck_connection(sf_dir)
    ddf = con.execute(osql[name]).fetchdf()
    return compare(sdf, ddf)
