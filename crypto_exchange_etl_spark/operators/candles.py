"""OHLCV aggregation (A1) and tumbling-window candles (A3).

Reference semantics:

- ``aggregate_rows`` (/root/reference/fintick/aggregators/lib.py:14-55):
  per bucket — open = first price (optionally carried from the previous
  bucket's close), high/low = max/min, close = last price, Σ volume /
  notional / ticks plus buy-side (tickRule == 1) sums, optional topN.
- ``aggregate_candles`` (/root/reference/fintick/aggregators/candles/lib.py:39-66):
  fixed timeframe buckets (must divide 60 there; any Spark window duration
  here), bucket-start timestamp emitted, empty buckets skipped (no gap
  fill), open carried across buckets AND partitions via the Firestore
  cache dict.

Spark-first: one ``groupBy(symbol, window(ts))`` with conditional
aggregates — the buy-side filter is ``sum(when(tickRule == 1, x))``, one
pass, no separate filtered scan (reference does a second pass,
/root/reference/fintick/aggregators/lib.py:24). The cross-bucket open
carry is ``lag(close) over (partition by symbol order by bucket)`` —
what the reference threads through Firestore docs becomes one window
function; across micro-batches the carry table provides lag's seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .topn import topn_in_group

_ORDER = ("timestamp", "nanoseconds", "index")


def _order_struct() -> Column:
    return F.struct(*[F.col(c) for c in _ORDER])


def ohlcv_aggs(ticks_col: str | None = None) -> list[Column]:
    """The A1 expression set (argmin/argmax via min_by/max_by — the
    reference needs a float-cast idxmin/idxmax workaround for Decimal,
    /root/reference/fintick/controllers/base.py:104-106; Spark compares
    decimals natively)."""
    ticks = F.col(ticks_col) if ticks_col else F.lit(1)
    buy = F.col("tickRule") == 1
    return [
        F.min_by("price", _order_struct()).alias("open"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max_by("price", _order_struct()).alias("close"),
        F.sum("volume").alias("volume"),
        F.sum(F.when(buy, F.col("volume")).otherwise(F.lit(0).cast("decimal(38,18)"))).alias("buyVolume"),
        F.sum("notional").alias("notional"),
        F.sum(F.when(buy, F.col("notional")).otherwise(F.lit(0).cast("decimal(38,18)"))).alias("buyNotional"),
        F.sum(ticks).cast("long").alias("ticks"),
        F.sum(F.when(buy, ticks).otherwise(0)).cast("long").alias("buyTicks"),
    ]


def aggregate_candles(
    df: DataFrame,
    timeframe: str = "1 minute",
    top_n: int | None = None,
    carry_open: bool = True,
    ticks_col: str | None = None,
) -> DataFrame:
    """Tumbling candles per symbol. Output one row per non-empty bucket:
    symbol, timestamp (bucket start), open/high/low/close, volume,
    buyVolume, notional, buyNotional, ticks, buyTicks [, topN]."""
    has_symbol = "symbol" in df.columns
    part = ["symbol"] if has_symbol else []
    bucket = F.window("timestamp", timeframe)

    candles = (
        df.groupBy(*part, bucket.alias("_w"))
        .agg(*ohlcv_aggs(ticks_col))
        .withColumn("timestamp", F.col("_w.start"))
        .drop("_w")
    )

    if carry_open:
        w = Window.partitionBy(*part).orderBy("timestamp")
        candles = candles.withColumn(
            "open", F.coalesce(F.lag("close").over(w), F.col("open"))
        ).withColumn("high", F.greatest("high", "open")).withColumn(
            "low", F.least("low", "open")
        )

    if top_n:
        df_b = df.withColumn("timestamp_bucket", F.window("timestamp", timeframe)["start"])
        tn = topn_in_group(df_b, part + ["timestamp_bucket"], top_n)
        candles = candles.join(
            tn,
            on=[candles["timestamp"] == tn["timestamp_bucket"]]
            + [candles[c] == tn[c] for c in part],
            how="left",
        ).drop("timestamp_bucket")
        if has_symbol:
            candles = candles.drop(tn["symbol"])

    front = (["symbol"] if has_symbol else []) + ["timestamp"]
    rest = [c for c in candles.columns if c not in front]
    return candles.select(*front, *rest)
