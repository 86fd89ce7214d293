"""Driver-style correctness smoke: every registry query vs its DuckDB oracle.

Mirrors the per-round correctness gate: for each entry in
``crypto_exchange_etl_spark.queries.QUERIES`` run the Spark implementation
at ``sf_dir`` (default /root/testdata/sf0.01) AND the paired
``ORACLES[name]`` SQL in DuckDB over the same parquet tables, then compare

  * row count,
  * schema (column names, sorted — the driver sorts columns by name),
  * values (rows sorted by every column; floats compared to 1e-9 rel).

Usage::

    python scripts/oracle_check.py [sf_dir] [only_query ...]

Prints one line per query and a final summary; exit code 1 on any
mismatch so it can gate CI.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from crypto_exchange_etl_spark.queries import ORACLES, QUERIES  # noqa: E402
from crypto_exchange_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), x if not isinstance(x, tuple) else str(x))
        for x in row
    )


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    """Return (rows_match, schema_match, values_match, detail)."""
    rows_match = len(spark_rows) == len(duck_rows)
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    schema_match = [spark_cols[i] for i in s_order] == [duck_cols[i] for i in d_order]
    if not (rows_match and schema_match):
        return rows_match, schema_match, False, "row/schema mismatch"
    s = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in spark_rows), key=_sort_key
    )
    d = sorted(
        (tuple(_norm(r[i]) for i in d_order) for r in duck_rows), key=_sort_key
    )
    for ri, (sr, dr) in enumerate(zip(s, d)):
        for ci, (sv, dv) in enumerate(zip(sr, dr)):
            if not _values_equal(sv, dv):
                col = [spark_cols[i] for i in s_order][ci]
                return True, True, False, (
                    f"value mismatch row {ri} col {col}: spark={sv!r} duck={dv!r}"
                )
    return True, True, True, None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failed = []
    names = [n for n in QUERIES if not only or n in only]
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            oracle = ORACLES.get(name)
            if oracle is None:
                print(f"{name:28s} rows={len(spark_rows):7d}  (no oracle)")
                continue
            cur = con.execute(oracle)
            duck_cols = [c[0] for c in cur.description]
            duck_rows = cur.fetchall()
            rm, sm, vm, detail = compare(spark_rows, spark_cols, duck_rows, duck_cols)
            ok = rm and sm and vm
            dt = time.time() - t0
            status = "OK " if ok else "FAIL"
            print(
                f"{name:28s} {status} rows={len(spark_rows):7d}/{len(duck_rows):7d}"
                f" schema={'y' if sm else 'N'} values={'y' if vm else 'N'}"
                f"  {dt:5.1f}s" + (f"  {detail}" if detail and not ok else "")
            )
            if not ok:
                failed.append((name, detail))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERR  {type(e).__name__}: {e}")
            failed.append((name, str(e)[:200]))
    print(f"\n{len(names) - len(failed)}/{len(names)} green")
    for name, detail in failed:
        print(f"  FAIL {name}: {detail}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
