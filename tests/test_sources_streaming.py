"""Tests for the bulk-CSV source (S3) and streaming windowed aggs (§2.8)."""

from __future__ import annotations

import datetime as dt
import gzip
import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import read_binlog, write_binlog_segments
from crypto_exchange_etl_spark.sources.csv_dump import dump_to_ticks, read_csv_dump
from crypto_exchange_etl_spark.streaming.windowed import (
    run_windowed_metrics_stream,
    windowed_candles,
    windowed_page_metrics,
)

CSV = """uid,symbol,timestamp,price,size,side
t1,XBTUSD,2024-01-01 00:00:00.001500,100.5,2.0,buy
t2,XBTUSD,2024-01-01 00:00:00.001500,100.6,1.0,sell
t3,XBTUSD,2024-01-01 00:00:01.000000,100.7,0.5,buy
t4,ETHUSD,2024-01-01 00:00:00.500000,10.0,1.0,sell
t5,ETHUSD,2024-01-01 00:00:02.000000,10.1,1.0,buy
"""


def test_csv_dump_roundtrip(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "dump.csv.gz")
    with gzip.open(path, "wt") as fh:
        fh.write(CSV)
    raw = read_csv_dump(spark, path)
    assert raw.count() == 5
    # column pruning through the source
    pruned = read_csv_dump(spark, path, columns=["uid", "price"])
    assert pruned.columns == ["uid", "price"]

    rows = dump_to_ticks(raw).collect()
    ticks = sorted((t for t in rows if t.symbol == "XBTUSD"), key=lambda t: t["index"])
    assert [t.uid for t in ticks] == ["t1", "t2", "t3"]
    assert [t.tickRule for t in ticks] == [1, -1, 1]
    # ms-floor + ns leftover split (1500 µs → 1 ms + 500000 ns)
    assert ticks[0].nanoseconds == 500_000
    assert ticks[0].timestamp.microsecond == 1000
    assert float(ticks[0].volume) == 201.0  # price*size
    # W4: the index is assigned PER SYMBOL (reference calculate_index)
    eth = sorted((t for t in rows if t.symbol == "ETHUSD"), key=lambda t: t["index"])
    assert [t.uid for t in eth] == ["t4", "t5"]
    assert [t["index"] for t in eth] == [0, 1] == [t["index"] for t in ticks[:2]]


def test_dump_to_ticks_no_global_exchange(spark, tmpdir_path):
    """The index window must not funnel all rows through one partition."""
    path = os.path.join(tmpdir_path, "dump2.csv.gz")
    with gzip.open(path, "wt") as fh:
        fh.write(CSV)
    plan = dump_to_ticks(read_csv_dump(spark, path))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(symbol" in plan


def _batch_metrics(df, window="10 minutes"):
    return (
        df.groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("lsn").alias("max_lsn"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_events", "max_lsn")
    )


def test_windowed_stream_equals_batch_when_nothing_late(spark, tmpdir_path):
    """With late_frac=0, every streamed window that CLOSES (end ≤ final
    watermark) must equal the batch aggregation of the same input."""
    binlog = os.path.join(tmpdir_path, "binlog")
    # one file per segment: the micro-batch boundary then coincides with
    # the segment boundary, so (late_frac=0 ⇒) nothing is ever behind the
    # watermark when it arrives
    write_binlog_segments(
        spark, binlog, n_events=4000, n_segments=4, files_per_segment=1,
        n_urls=400, seed=11, late_frac=0.0,
    )
    out = os.path.join(tmpdir_path, "metrics")
    run_windowed_metrics_stream(
        spark, binlog, out, os.path.join(tmpdir_path, "ck"),
        window="10 minutes", watermark="5 minutes",
    )
    streamed = spark.read.parquet(out)
    assert streamed.count() > 0

    batch = read_binlog(spark, binlog)
    max_ts = batch.agg(F.max("warc_ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(minutes=5)
    expected = (
        windowed_page_metrics(batch, "10 minutes", "5 minutes")
        .where(F.col("window_end") <= horizon)
    )
    got = {tuple(r) for r in streamed.where(F.col("window_end") <= horizon).collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and len(want) > 0


def test_windowed_stream_drops_beyond_watermark(spark, tmpdir_path):
    """A row arriving after the watermark passed its window is dropped —
    the declarative form of the reference's validity-gate drop."""
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def seg(path, rows):
        spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)

    binlog = os.path.join(tmpdir_path, "wm_binlog")
    on_time = [
        (i, 0, "I", f"u{i}", base + dt.timedelta(minutes=i), b"<p>x</p>", "en")
        for i in range(0, 60, 5)  # 10:00 … 10:55
    ]
    seg(os.path.join(binlog, "seg=00000"), on_time)
    # batch 1 advances the watermark to 10:55−30m=10:25 and EVICTS window
    # [10:00,10:10) from state (dropping late rows is guaranteed only once
    # the window's state is gone — before that Spark may still merge them)
    seg(
        os.path.join(binlog, "seg=00001"),
        [(99, 0, "I", "adv", base + dt.timedelta(minutes=65), b"<p>a</p>", "en")],
    )
    late = [
        # 10:05 event arriving after [10:00,10:10) was finalized ⇒ DROPPED
        (100, 0, "I", "late-url", base + dt.timedelta(minutes=5), b"<p>l</p>", "en"),
        # 11:06 event: open window, kept
        (101, 0, "I", "new-url", base + dt.timedelta(minutes=66), b"<p>n</p>", "en"),
    ]
    seg(os.path.join(binlog, "seg=00002"), late)

    out = os.path.join(tmpdir_path, "wm_out")
    run_windowed_metrics_stream(
        spark, binlog, out, os.path.join(tmpdir_path, "wm_ck"),
        window="10 minutes", watermark="30 minutes",
    )
    rows = {
        (r.window_start, r.n_events, r.max_lsn)
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window closed with only its 2 on-time events (lsn 0,5) —
    # the late lsn=100 event did NOT resurrect it
    assert (base, 2, 5) in rows
    assert not any(lsn == 100 for (_, _, lsn) in rows)


def test_windowed_candles_matches_batch_operator(spark):
    from crypto_exchange_etl_spark.operators.candles import aggregate_candles
    from crypto_exchange_etl_spark.sources.ticks import generate_ticks

    ticks = generate_ticks(spark, 2000, symbols=("A", "B"), seed=3)
    # batch evaluation of the streaming aggregation expression
    got = windowed_candles(ticks, timeframe="1 minute").collect()
    want = {
        (r.symbol, r.timestamp): r
        for r in aggregate_candles(ticks, "1 minute", carry_open=False).collect()
    }
    assert len(got) == len(want)
    for r in got:
        w = want[(r.symbol, r.timestamp)]
        assert (r.open, r.high, r.low, r.close, r.volume, r.ticks) == (
            w.open, w.high, w.low, w.close, w.volume, w.ticks
        )


def test_stream_dedup_within_watermark_removes_redelivered_pages(spark, tmpdir_path):
    """An at-least-once binlog (a whole segment redelivered, the
    reference's 3h-lookback re-fetch) streams through
    dedup_events_stream to exactly the batch-distinct event set."""
    import shutil

    from crypto_exchange_etl_spark.streaming.windowed import run_dedup_stream

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(
        spark, binlog, n_events=3000, n_segments=3, files_per_segment=1,
        n_urls=300, seed=7, late_frac=0.0,
    )
    # redeliver segment 1 verbatim as a later segment (same lsns, same
    # payloads — the REST page fetched again by the lookback window)
    shutil.copytree(os.path.join(binlog, "seg=00001"), os.path.join(binlog, "seg=00003"))

    out = os.path.join(tmpdir_path, "deduped")
    run_dedup_stream(
        spark, binlog, out, os.path.join(tmpdir_path, "ck"), watermark="2 hours"
    )

    got = spark.read.parquet(out)
    batch = read_binlog(spark, binlog)
    assert batch.count() == 4000  # duplicates really were delivered
    assert got.count() == 3000
    assert got.select("lsn").distinct().count() == 3000
    # value-level: deduped stream == the original (pre-redelivery) events
    orig = batch.where(F.col("lsn") < 3000).dropDuplicates(["lsn"])
    cols = [c for c in got.columns]
    assert got.select(*cols).exceptAll(orig.select(*cols)).count() == 0
