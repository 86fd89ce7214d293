"""Streaming windowed aggregations with watermark-based late-data policy.

Reference analogue (SURVEY.md §2.8): the reference handles lateness by
re-processing whole partitions that are not yet ``ok`` and dropping
out-of-range trades at the validity gate
(/root/reference/fintick/controllers/base.py:88-99); completeness is the
``ok`` flag written per partition. In Structured Streaming the same
policy is declarative: ``withWatermark`` bounds how late an event may be
and the engine maintains/merges partial windows in its state store —
what the reference's Firestore ``nextDay`` carry dict does by hand
(/root/reference/fintick/aggregators/base.py:255-267).

Two jobs:

- :func:`stream_page_metrics` — tumbling-window per-lang page counts
  over the CDC binlog (watermarked event time, append mode: a window
  emits exactly once, when the watermark passes it — the streaming twin
  of the batch ledger rollup).
- :func:`stream_candles` — tumbling OHLCV candles over a tick stream,
  the streaming twin of operators/candles.aggregate_candles (A3).

Scale notes: watermark + append-mode window aggs keep state bounded to
open windows only; state lives in the checkpoint's state store (RocksDB
on a real cluster). Partial aggregation applies before the stateful
exchange exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_page_metrics(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per (event-time window, lang): event counts by op + distinct-ish
    url count (approx at scale; exact here is fine for ≤ window volumes).

    Events later than ``watermark`` behind the max seen event time are
    DROPPED (the reference's validity-gate drop, made declarative);
    anything within the watermark merges into its still-open window.
    """
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).cast("long").alias("n_insert"),
            F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).cast("long").alias("n_update"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).cast("long").alias("n_delete"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_events",
            "n_insert",
            "n_update",
            "n_delete",
            "max_lsn",
        )
    )


def windowed_candles(
    stream: DataFrame,
    timeframe: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming tumbling OHLCV (A3's streaming twin).

    open/close use ``min_by``/``max_by`` over the total order
    (timestamp, nanoseconds, index) — merged incrementally by the state
    store across micro-batches, replacing the reference's carried
    ``nextDay`` partial-bar dict."""
    order = F.struct("timestamp", "nanoseconds", "index")
    buy = F.col("tickRule") == 1
    zero = F.lit(0).cast("decimal(38,18)")
    return (
        stream.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", timeframe).alias("w"), F.col("symbol"))
        .agg(
            F.min_by("price", order).alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", order).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum(F.when(buy, F.col("volume")).otherwise(zero)).alias("buyVolume"),
            F.count(F.lit(1)).alias("ticks"),
        )
        .select(F.col("w.start").alias("timestamp"), "symbol", "open", "high",
                "low", "close", "volume", "buyVolume", "ticks")
    )


def dedup_events_stream(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once events from an at-least-once feed, with bounded state.

    The reference re-fetches a 3-hour lookback window every hourly run
    (/root/reference/fintick/main.py:41-42), so the same REST page is
    delivered more than once and the uid dedup (P7,
    /root/reference/fintick/controllers/base.py:142-150) strips the
    replays. This is the declarative streaming twin:
    ``dropDuplicatesWithinWatermark`` keeps a seen-``lsn`` set ONLY for
    events newer than the watermark — exactly the 3h lookback horizon —
    so the dedup state is bounded by (arrival rate × watermark), not by
    total stream history as plain ``dropDuplicates`` on a stream would
    be. Late replays beyond the watermark are already rejected by the
    sink's idempotent LWW MERGE, so the two layers compose to
    exactly-once without unbounded state at either.
    """
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["lsn"])


def run_dedup_stream(
    spark,
    binlog_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    timeout_secs: float | None = 300,
):
    """Wire :func:`dedup_events_stream` to a parquet append sink
    (availableNow: drain the current binlog, then stop)."""
    from ..sources.binlog import read_binlog_stream

    stream = read_binlog_stream(spark, binlog_dir, max_files_per_trigger=2)
    q = (
        dedup_events_stream(stream, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_secs) if timeout_secs else q.awaitTermination()
    return q


def run_windowed_metrics_stream(
    spark,
    binlog_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    available_now: bool = True,
    timeout_secs: float | None = 300,
):
    """Wire :func:`windowed_page_metrics` to a parquet append sink.

    Append output mode ⇒ a window row is emitted exactly once, after the
    watermark passes its end — the streaming analogue of the reference
    closing a partition by writing ``ok: true``.
    """
    from ..sources.binlog import read_binlog_stream

    stream = read_binlog_stream(spark, binlog_dir, max_files_per_trigger=1)
    agg = windowed_page_metrics(stream, window=window, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="1 second").start()
    q.awaitTermination(timeout_secs) if timeout_secs else q.awaitTermination()
    return q
