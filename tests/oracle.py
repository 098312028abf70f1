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

# canonical table list lives in mitie_spark.session; keep one copy
from mitie_spark.session import TABLES  # noqa: E402,F401


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
    spark_pdf = (
        spark_df if isinstance(spark_df, pd.DataFrame) else spark_df.toPandas()
    )
    a = _normalize(spark_pdf)
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
            # fillna BEFORE astype: astype(str) would stringify missing
            # values to 'None'/'nan' first (engine-dependent), making the
            # fill a no-op and a null-vs-null pair a false mismatch
            neq = av.fillna("").astype(str) != bv.fillna("").astype(str)
            if neq.any():
                i = int(neq.idxmax())
                errs.append(f"col {c} row {i}: {av[i]!r} != {bv[i]!r}")
    return errs


def _canon_cell(v) -> str:
    """Driver-hash cell canonicalization.

    Evidence from CORRECTNESS_r01: integer *widths* are normalized (Spark
    int32 vs DuckDB int64 hashed equal in doc_token_stats) but int vs float
    is NOT (DuckDB SUM(int)->HUGEINT->float64 hash-failed lang_counts while
    values compared numerically equal). So: ints of any width canonicalize
    to str(int), floats keep full repr (bit-level — last-ulp diffs must
    fail here like they fail the driver), everything else via str().
    """
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    # DATE columns: Spark toPandas -> datetime.date, DuckDB fetchdf ->
    # midnight datetime64[ns]; the driver hashed these equal in r01
    # (events_by_type_day, shipping_priority), so normalize midnight
    # timestamps down to their date.
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is None and v == v.normalize():
            return v.date().isoformat()
        return v.isoformat()
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive strict value hash (the driver-gate mimic)."""
    import hashlib

    df = df.reindex(sorted(df.columns), axis=1)
    cells = [
        "\x1f".join(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    cells.sort()
    h = hashlib.md5()
    h.update("\x1e".join(df.columns).encode())
    h.update(b"\x00")
    h.update("\x1e".join(cells).encode())
    return h.hexdigest()


def run_query_vs_oracle(spark, name: str, sf_dir: str) -> list[str]:
    import importlib
    import sys

    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    entry = importlib.import_module("__spark_entry__")
    qs, osql = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    if name not in osql:
        try:
            sdf.count()
        except Exception as exc:
            return [f"{name}: spark query failed: {exc}"]
        return []
    con = duck_connection(sf_dir)
    try:
        ddf = con.execute(osql[name]).fetchdf()
    finally:
        con.close()
    spdf = sdf.toPandas()
    errs = compare(spdf, ddf)
    if not errs:
        ha, hb = value_hash(spdf), value_hash(ddf)
        if ha != hb:
            errs.append(
                f"strict value hash mismatch (spark={ha} duck={hb}): values "
                "compare equal under tolerance but would fail the driver "
                "gate — check int-vs-float column types (bare SUM(int) in "
                "DuckDB returns HUGEINT->float64) and float bit-identity"
            )
    return errs
