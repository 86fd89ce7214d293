"""Regression tests for the round-4 session-12 pipeline review findings.

Each test pins one fixed bug:

- ``fork()`` silently dropped ``on_violation``, resetting a quarantine/
  drop policy to the default ``fail`` on the DR fork;
- a crashing ``audit`` callback (as opposed to one returning False)
  stranded the staged WAP snapshot — every restart re-staged a new one;
- replayed (exactly-once-skipped) batches bypassed view refresh, so a
  crash between table commit and view refresh was NOT self-healed by
  the replay, contradicting the documented contract;
- ``read_metrics`` crashed with PATH_NOT_FOUND before the first batch
  landed instead of returning an empty frame;
- ``run_debezium_stream`` defaulted ``dead_letter_dir=None`` and
  silently discarded malformed events despite the no-silent-vanish
  contract (now defaults under the checkpoint dir).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import (
    CdcPipeline,
    read_metrics,
)

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _rows(spark, rows):
    return spark.createDataFrame(rows, CHANGES_SCHEMA)


def _seed_rows(n=4, lang="en"):
    return [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), lang)
        for i in range(n)
    ]


def test_fork_preserves_on_violation(spark, tmpdir_path):
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=2,
        on_violation="quarantine",
    )
    pipe.apply_batch(_rows(spark, _seed_rows()), batch_id=0)
    fork = pipe.fork(
        os.path.join(tmpdir_path, "t2"),
        checkpoint_src=_mk_ck(spark, pipe, tmpdir_path),
        checkpoint_dst=os.path.join(tmpdir_path, "ck2"),
    )
    assert fork.on_violation == "quarantine"


def _mk_ck(spark, pipe, tmpdir_path):
    """A real streaming checkpoint for fork() to copy."""
    from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments

    binlog = os.path.join(tmpdir_path, "binlog")
    ck = os.path.join(tmpdir_path, "ck")
    write_binlog_segments(
        spark, binlog, n_events=200, n_segments=1, n_urls=50, seed=3
    )
    pipe.run_stream(binlog, ck, available_now=True, timeout_secs=120)
    return ck


def test_crashing_audit_discards_staged_snapshot(spark, tmpdir_path):
    calls = {"n": 0}

    def bad_audit(staged_df, summary):
        calls["n"] += 1
        raise KeyError("user audit bug")

    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=2, audit=bad_audit
    )
    with pytest.raises(KeyError):
        pipe.apply_batch(_rows(spark, _seed_rows()), batch_id=0)
    assert calls["n"] == 1
    t = pipe.table
    # no stranded staged snapshot, committed chain untouched, batch id
    # unapplied (a corrected run can re-use it)
    assert t.list_staged() == []
    assert t.read().count() == 0
    pipe2 = CdcPipeline(spark, pipe.table_path, n_buckets=2)
    pipe2.apply_batch(_rows(spark, _seed_rows()), batch_id=0)
    assert pipe2.table.read().count() == 4


def test_views_self_heal_on_replayed_batch(spark, tmpdir_path):
    from crypto_exchange_etl_spark.lake.matview import MaterializedAggregate

    table_path = os.path.join(tmpdir_path, "t")
    seed = CdcPipeline(spark, table_path, n_buckets=2)
    seed.apply_batch(_rows(spark, _seed_rows()), batch_id=0)
    view = MaterializedAggregate(
        spark, table_path, os.path.join(tmpdir_path, "v"),
        group_col="lang", sums={"n_chars": "length(text)"},
    )
    view.refresh()
    # simulate "crash between table commit and view refresh": the batch
    # commits WITHOUT the view attached
    seed.apply_batch(_rows(spark, [
        (100, 0, "I", "u9", TS + dt.timedelta(days=1), b"<p>x</p>", "fr"),
    ]), batch_id=1)
    # restart replays batch 1 with the view attached; the exactly-once
    # guard skips the merge — the view must still catch up
    pipe = CdcPipeline(spark, table_path, n_buckets=2, views=[view])
    out = pipe.apply_batch(_rows(spark, [
        (100, 0, "I", "u9", TS + dt.timedelta(days=1), b"<p>x</p>", "fr"),
    ]), batch_id=1)
    assert out.get("skipped")
    assert {r.lang for r in view.read().collect()} >= {"en", "fr"}


def test_read_metrics_empty_feed_returns_empty_frame(spark, tmpdir_path):
    d = os.path.join(tmpdir_path, "metrics")
    df = read_metrics(spark, d)  # dir does not even exist yet
    assert df.count() == 0
    assert "batch_id" in df.columns
    os.makedirs(d)
    assert read_metrics(spark, d).count() == 0


def test_debezium_stream_default_dead_letter_under_checkpoint(
    spark, tmpdir_path
):
    import json

    feed = os.path.join(tmpdir_path, "feed")
    os.makedirs(feed)
    good = {
        "payload": {
            "op": "c",
            "after": {
                "url": "u1",
                "warc_ts": "2024-01-01 00:00:00",
                "html": "PHA+aGk8L3A+",  # <p>hi</p>
                "lang": "en",
            },
            "before": None,
            "source": {"lsn": 1, "partition": 0},
        }
    }
    with open(os.path.join(feed, "f.ndjson"), "w") as fh:
        fh.write(json.dumps(good) + "\n")
        fh.write("this is not json\n")
    ck = os.path.join(tmpdir_path, "ck")
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    pipe.run_debezium_stream(feed, ck, available_now=True, timeout_secs=120)
    assert pipe.table.read().count() == 1
    # the malformed line landed in the DEFAULT dead-letter dir (under the
    # checkpoint) instead of vanishing
    dld = os.path.join(ck, "dead_letter", "batch-0")
    assert os.path.isdir(dld)
    dead = spark.read.parquet(dld)
    assert dead.count() == 1
    assert dead.collect()[0]["reason"] == "unparseable"
