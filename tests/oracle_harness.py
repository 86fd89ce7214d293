"""Shared harness emulating the driver's DuckDB-oracle comparison.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables,
then compares row count, column names, and order-insensitive values —
the same gate the external driver applies (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"create view {t} as select * from '{path}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v))
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", int(v))
    return v


def rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in idx)
        out[key] = out.get(key, 0) + 1
    return out


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    errs = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    s_set = rows_to_set(s_cols, s_rows)
    d_set = rows_to_set(d_cols, d_rows)
    if s_set != d_set:
        only_s = [k for k in s_set if s_set[k] != d_set.get(k, 0)][:3]
        only_d = [k for k in d_set if d_set[k] != s_set.get(k, 0)][:3]
        errs.append(f"{name}: VALUES differ; spark-only={only_s} duck-only={only_d}")
    return errs
