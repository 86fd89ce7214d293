"""Consecutive-run compaction (operator A2) — "aggregate_trades".

Reference semantics (/root/reference/fintick/aggregators/trades/lib.py:19-92):
rows ordered by ``(timestamp, nanoseconds, index)`` are collapsed whenever
adjacent rows are equal on ``(symbol, timestamp, nanoseconds, tickRule)``:
one output row per run with the run's LAST price, Σvolume, Σnotional,
tick count, and ``vwap = Σvolume / Σnotional`` (the reference's
inverted-notional convention — its ``notional`` is base-asset quantity and
``volume`` is quote value, so Σvolume/Σnotional IS the value-weighted
price). README claims 30–50 % row reduction (/root/reference/README.md:54).

Spark-first design: the reference's single-threaded ``itertuples`` fold
becomes the classic sessionize-by-change pattern —
``lag`` boundary flags → running-sum run ids → ``groupBy(run_id)`` — three
Catalyst-planned stages, no Python. The window is partitioned by ``symbol``
(each symbol's tick stream is an independent total order), so parallelism
is per-symbol, and the groupBy gets map-side partial aggregation.

Note on scale: a per-symbol window implies one task per symbol for the
running sum. That matches the data's semantics (runs are defined by
adjacency in a per-symbol total order — inherently sequential), and equals
the reference's parallelism model (one cloud function per symbol). For
hot symbols, runs never span micro-batch boundaries in practice (the
reference recomputes per partition; we compact per batch/partition too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RUN_KEY = ("timestamp", "nanoseconds", "tickRule")
ORDER = ("timestamp", "nanoseconds", "index")


def compact_runs(df: DataFrame, by_symbol: bool | None = None) -> DataFrame:
    """Collapse consecutive equal-(symbol, ts, ns, tickRule) runs.

    Output: AGG_TICKS_SCHEMA shape — symbol (if present), timestamp,
    nanoseconds, price (last in run), vwap, volume, notional, ticks,
    tickRule, index (run's first index, preserving the total order).
    """
    has_symbol = "symbol" in df.columns if by_symbol is None else by_symbol
    part = [F.col("symbol")] if has_symbol else []
    w = Window.partitionBy(*part).orderBy(*[F.col(c) for c in ORDER])

    boundary = F.lit(False)
    for c in RUN_KEY:
        prev = F.lag(F.col(c)).over(w)
        boundary = boundary | prev.isNull() | (prev != F.col(c))
    df2 = df.withColumn("_b", boundary.cast("int"))
    df2 = df2.withColumn("_run", F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, 0)))

    group = (part + [F.col("_run")]) if has_symbol else [F.col("_run")]
    agg = (
        df2.groupBy(*group)
        .agg(
            F.min("timestamp").alias("timestamp"),
            F.min("nanoseconds").alias("nanoseconds"),
            F.max_by("price", F.struct("timestamp", "nanoseconds", "index")).alias("price"),
            F.sum("volume").alias("volume"),
            F.sum("notional").alias("notional"),
            F.count(F.lit(1)).cast("long").alias("ticks"),
            F.first("tickRule").alias("tickRule"),
            F.min("index").alias("index"),
        )
        .withColumn(
            "vwap",
            (F.col("volume") / F.col("notional")).cast("decimal(38,18)"),
        )
        .drop("_run")
    )
    cols = (["symbol"] if has_symbol else []) + [
        "timestamp", "nanoseconds", "price", "vwap", "volume", "notional",
        "ticks", "tickRule", "index",
    ]
    return agg.select(*cols)
