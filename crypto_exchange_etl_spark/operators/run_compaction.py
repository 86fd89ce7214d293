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
``lag`` boundary flags → running-sum run ids → ``groupBy(run_id)``.

Scale key (strategy="span", the default): the run key CONTAINS
``(timestamp, nanoseconds)``, so two rows with different timestamps can
never share a run — every run lives entirely inside one
``(symbol, timestamp, nanoseconds)`` span, and spans are contiguous in
the total order. The sequential dependency therefore never crosses a
span boundary, and the window can partition on the FULL span key instead
of on ``symbol`` alone: parallelism is one task per distinct
``(symbol, ts, ns)`` (effectively unbounded at tick granularity) rather
than one task per symbol, with NO cross-partition run stitching needed —
an exact-equivalence rewrite, not an approximation (pinned by
tests/test_aggregations.py strategy-equivalence cases, including runs
interrupted within one timestamp). The groupBy keys are a superset of
the window partition key, so Catalyst reuses the exchange: one shuffle
total, and ``max_by(price, index)`` has a fixed-width buffer (no struct
ordering key — ts/ns are constants inside a span), keeping the aggregate
a pure HashAggregate.

strategy="symbol" keeps the per-symbol global window (the reference's
parallelism model — one cloud function per symbol) for comparison; it
computes the same rows one-task-per-symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RUN_KEY = ("timestamp", "nanoseconds", "tickRule")
ORDER = ("timestamp", "nanoseconds", "index")


def compact_runs(
    df: DataFrame, by_symbol: bool | None = None, strategy: str = "span"
) -> DataFrame:
    """Collapse consecutive equal-(symbol, ts, ns, tickRule) runs.

    Output: AGG_TICKS_SCHEMA shape — symbol (if present), timestamp,
    nanoseconds, price (last in run), vwap, volume, notional, ticks,
    tickRule, index (run's first index, preserving the total order).
    """
    if strategy not in ("span", "symbol"):
        raise ValueError(f"unknown run-compaction strategy: {strategy!r}")
    has_symbol = "symbol" in df.columns if by_symbol is None else by_symbol
    sym = [F.col("symbol")] if has_symbol else []

    if strategy == "span":
        # runs cannot cross a (ts, ns) change — window the span only
        w = Window.partitionBy(
            *sym, F.col("timestamp"), F.col("nanoseconds")
        ).orderBy(F.col("index"))
        prev = F.lag(F.col("tickRule")).over(w)
        boundary = prev.isNull() | (prev != F.col("tickRule"))
        group = sym + [F.col("timestamp"), F.col("nanoseconds"), F.col("_run")]
        last_price = F.max_by("price", F.col("index"))
    else:
        w = Window.partitionBy(*sym).orderBy(*[F.col(c) for c in ORDER])
        boundary = F.lit(False)
        for c in RUN_KEY:
            prev = F.lag(F.col(c)).over(w)
            boundary = boundary | prev.isNull() | (prev != F.col(c))
        group = sym + [F.col("_run")]
        last_price = F.max_by(
            "price", F.struct("timestamp", "nanoseconds", "index")
        )

    df2 = df.withColumn("_b", boundary.cast("int"))
    df2 = df2.withColumn(
        "_run", F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )

    agg = (
        df2.groupBy(*group)
        .agg(
            F.min("timestamp").alias("_ts"),
            F.min("nanoseconds").alias("_ns"),
            last_price.alias("price"),
            F.sum("volume").alias("volume"),
            F.sum("notional").alias("notional"),
            F.count(F.lit(1)).cast("long").alias("ticks"),
            F.first("tickRule").alias("tickRule"),
            F.min("index").alias("index"),
        )
        .withColumn(
            # divide in float64, not decimal: decimal(38,18)/decimal(38,18)
            # under Spark's default allowPrecisionLoss yields decimal(38,6)
            # — the cast to (38,18) would just zero-pad a 6-dp rounding.
            # float64 carries ~16 significant digits, the same arithmetic
            # the reference's pandas kernel uses for vwap.
            "vwap",
            (F.col("volume").cast("double") / F.col("notional").cast("double"))
            .cast("decimal(38,18)"),
        )
    )
    cols = (["symbol"] if has_symbol else []) + [
        F.col("_ts").alias("timestamp"),
        F.col("_ns").alias("nanoseconds"),
        "price", "vwap", "volume", "notional", "ticks", "tickRule", "index",
    ]
    return agg.select(*cols)
