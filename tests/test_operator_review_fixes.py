"""Regression tests for the round-4 operator/kernel review findings.

- a non-positive ``thresh_value`` made the threshold-bar cut search loop
  forever inside an executor task (searchsorted never advances past the
  current prefix value) — now rejected at plan/construction time;
- ``compact_runs`` computed vwap with decimal(38,18)/decimal(38,18),
  which Spark's default precision rules round to SIX decimal places
  before the cast back to (38,18) zero-pads them — now float64 division
  (the reference kernel's arithmetic);
- the packed LWW rank coded any unknown or NULL op as a DELETE,
  silently tombstoning the key a malformed winner belonged to — now a
  loud task error;
- ``IncrementalBars`` rewrote an ever-growing applied-batch list into
  every state manifest (commit cost linear in stream age) — now bounded
  by a floor watermark — and ``expire_state`` never collected
  crash-orphaned ``.tmp-*.json`` staging files.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.operators.bars import (
    thresh_bars,
    thresh_bars_pandas,
)
from crypto_exchange_etl_spark.operators.compaction import lww_winner_keys
from crypto_exchange_etl_spark.operators.run_compaction import compact_runs
from crypto_exchange_etl_spark.sources.ticks import generate_ticks
from crypto_exchange_etl_spark.streaming.incremental_bars import IncrementalBars

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


# ------------------------------------------------- thresh_value validation


def test_non_positive_thresh_value_rejected(spark, tmp_path):
    import pandas as pd

    ticks = generate_ticks(spark, 50, symbols=("BTC",), seed=1)
    for bad in (0.0, -5.0):
        with pytest.raises(ValueError, match="thresh_value"):
            thresh_bars(ticks, "volume", bad)
        with pytest.raises(ValueError, match="thresh_value"):
            thresh_bars_pandas(pd.DataFrame(), "volume", bad)
    # the old IncrementalBars DEFAULT (thresh_value=0.0) was the hang
    with pytest.raises(ValueError, match="thresh_value"):
        IncrementalBars(spark, str(tmp_path / "t"), kind="thresh")
    with pytest.raises(ValueError, match="box_size"):
        IncrementalBars(spark, str(tmp_path / "r"), kind="renko")


# --------------------------------------------------------- vwap precision


def test_vwap_keeps_float64_precision(spark):
    # one run: volume=1, notional=3 → vwap = 1/3. The decimal division
    # produced 0.333333000000000000 (6-dp rounding zero-padded to 18)
    df = spark.createDataFrame(
        [("BTC", TS, 0, 10.0, 1.0, 3.0, 1, 7)],
        "symbol string, timestamp timestamp, nanoseconds long, price double,"
        " volume double, notional double, tickRule int, index long",
    ).select(
        "symbol", "timestamp", "nanoseconds",
        F.col("price").cast("decimal(38,18)").alias("price"),
        F.col("volume").cast("decimal(38,18)").alias("volume"),
        F.col("notional").cast("decimal(38,18)").alias("notional"),
        "tickRule", "index",
    )
    vwap = float(compact_runs(df).select("vwap").collect()[0][0])
    assert vwap == pytest.approx(1.0 / 3.0, rel=1e-12)
    assert abs(vwap - 0.333333) > 1e-9  # not the 6-dp rounding


# ------------------------------------------------------ LWW op validation


def test_lww_pack_rejects_unknown_and_null_op(spark):
    ok = spark.createDataFrame(
        [("u1", TS, 1, "I"), ("u1", TS, 2, "U"), ("u2", TS, 3, "D")],
        "url string, warc_ts timestamp, lsn long, op string",
    )
    got = sorted(map(tuple, lww_winner_keys(ok).collect()))
    assert got == [("u1", 2, "U", False), ("u2", 3, "D", True)]
    for bad_op in ("X", None):
        bad = spark.createDataFrame(
            [("u1", TS, 1, bad_op)],
            "url string, warc_ts timestamp, lsn long, op string",
        )
        with pytest.raises(Exception, match="unknown op code"):
            lww_winner_keys(bad).collect()


# ------------------------------------------- bounded applied-batch state


def test_applied_batches_bounded_by_floor(spark, tmp_path, monkeypatch):
    import crypto_exchange_etl_spark.streaming.incremental_bars as ib

    monkeypatch.setattr(ib, "_MAX_APPLIED", 3)
    ticks = generate_ticks(spark, 120, symbols=("BTC",), seed=3).cache()
    inc = IncrementalBars(
        spark, str(tmp_path / "tb"), kind="thresh",
        thresh_attr="volume", thresh_value=20.0,
    )
    for i in range(6):
        b = ticks.where(
            (F.col("index") >= i * 20) & (F.col("index") < (i + 1) * 20)
        )
        inc.apply_batch(b, batch_id=i)
    m = inc.manifest()
    assert len(m["applied_batches"]) <= 3
    assert m["applied_floor"] == 2  # ids 0..2 collapsed into the floor
    # replays of collapsed ids still skip (exactly-once preserved)
    assert inc.apply_batch(ticks.limit(0), batch_id=0)["skipped"] is True
    assert inc.apply_batch(ticks.limit(0), batch_id=5)["skipped"] is True
    # stream-applied == single-shot still holds across the bound
    single = thresh_bars(
        ticks.where(F.col("index") < 120), "volume", 20.0
    ).count()
    assert inc.read().count() == single


def test_expire_state_collects_orphaned_tmp_files(spark, tmp_path):
    ticks = generate_ticks(spark, 40, symbols=("BTC",), seed=4)
    inc = IncrementalBars(
        spark, str(tmp_path / "tb"), kind="thresh",
        thresh_attr="volume", thresh_value=20.0,
    )
    inc.apply_batch(ticks, batch_id=0)
    old = os.path.join(inc.state_dir, ".tmp-deadbeef.json")
    fresh = os.path.join(inc.state_dir, ".tmp-cafebabe.json")
    for p in (old, fresh):
        with open(p, "w") as fh:
            fh.write("{}")
    os.utime(old, (1, 1))  # crash orphan from long ago
    inc.expire_state()
    assert not os.path.exists(old)  # collected
    assert os.path.exists(fresh)  # in-flight commit staging survives
