"""ChangeFeedConsumer: checkpointed incremental tailing of a lake table.

Pins the consumer contract end to end: exactly-once coverage of every
change across poll/commit cycles, at-least-once re-delivery before
commit, restart resume from the cursor file, tail-only starts, and the
offset-out-of-range failure when snapshot expiry outruns the consumer —
including that a consumer-driven downstream LakeTable converges to the
upstream state (the CDC loop closed through the feed itself).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake import (
    ChangeFeedConsumer,
    ChangeFeedLagError,
)
from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline


def _apply_batches(spark, path, n_batches, events_per_batch=800, n_urls=100,
                   start_batch=0):
    pipe = CdcPipeline(spark, path, n_buckets=4)
    df = generate_changes(
        spark, (start_batch + n_batches) * events_per_batch,
        n_urls=n_urls, seed=23,
    )
    for b in range(start_batch, start_batch + n_batches):
        lo, hi = b * events_per_batch, (b + 1) * events_per_batch
        pipe.apply_batch(
            df.where((F.col("lsn") >= lo) & (F.col("lsn") < hi)), batch_id=b
        )
    return pipe


def test_poll_commit_covers_all_changes_once(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _apply_batches(spark, path, 2)
    ck = os.path.join(tmpdir_path, "cursor.json")
    c = ChangeFeedConsumer(spark, path, ck)

    got, to_v = c.poll()
    first = {(r.url, r._change_type, r._commit_version) for r in got.collect()}
    # at-least-once: polling again BEFORE commit re-delivers the same range
    again, to_v2 = c.poll()
    assert to_v2 == to_v
    assert {(r.url, r._change_type, r._commit_version) for r in again.collect()} == first
    c.commit(to_v)
    assert c.poll() is None  # caught up

    # two more upstream batches → only the new commits arrive
    _apply_batches(spark, path, 2, start_batch=2)
    got2, to_v3 = c.poll()
    second = {(r.url, r._change_type, r._commit_version) for r in got2.collect()}
    assert to_v3 > to_v
    assert all(v > to_v for (_u, _t, v) in second)
    c.commit(to_v3)

    # union of the two polls == full feed
    full = {
        (r.url, r._change_type, r._commit_version)
        for r in pipe.table.changes_between(0, to_v3).collect()
    }
    assert first | second == full
    assert c.lag()["versions_behind"] == 0


def test_restart_resumes_from_cursor(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    _apply_batches(spark, path, 2)
    ck = os.path.join(tmpdir_path, "cursor.json")
    c = ChangeFeedConsumer(spark, path, ck)
    _df, v = c.poll()
    c.commit(v)
    # a NEW consumer object on the same checkpoint resumes, not restarts
    c2 = ChangeFeedConsumer(spark, path, ck)
    assert c2.position() == v
    assert c2.poll() is None


def test_tail_only_start(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _apply_batches(spark, path, 2)
    cur = pipe.table.current_version()
    c = ChangeFeedConsumer(
        spark, path, os.path.join(tmpdir_path, "ck.json"), start_version=cur
    )
    assert c.poll() is None  # history skipped
    _apply_batches(spark, path, 1, start_batch=2)
    got, v = c.poll()
    assert {r._commit_version for r in got.collect()} == {cur + 1}


def test_downstream_table_converges(spark, tmpdir_path):
    """Feed a second LakeTable from the consumer: downstream live state
    must equal upstream live state (exactly-once through idempotent LWW
    apply, keyed on the feed's own lsn lineage via warc_ts ordering)."""
    up = os.path.join(tmpdir_path, "up")
    down = os.path.join(tmpdir_path, "down")
    pipe = _apply_batches(spark, up, 3)
    c = ChangeFeedConsumer(spark, up, os.path.join(tmpdir_path, "ck.json"))
    sink = CdcPipeline(spark, down, n_buckets=4)
    batch = 0
    while (polled := c.poll()) is not None:
        changes, v = polled
        # re-envelope the feed as change events for the downstream table
        ev = (
            changes.where(F.col("_change_type") != "update_preimage")
            .withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", "D").otherwise("U"),
            )
            # synthetic lsn: commit version in the high bits so the
            # downstream LWW tiebreak follows upstream commit order (a key
            # appears at most once per commit in the feed, so the
            # low-bit row id never decides between two rows of one key)
            .withColumn(
                "lsn",
                F.col("_commit_version").cast("long") * F.lit(1 << 40)
                + F.monotonically_increasing_id(),
            )
            .withColumn("partition", F.lit(0))
            .select("lsn", "partition", "op", "url", "warc_ts", "html", "lang")
        )
        sink.apply_batch(ev, batch_id=batch)
        c.commit(v)
        batch += 1
    upstate = sorted(
        (r.url, r.warc_ts, r.lang)
        for r in pipe.table.read().select("url", "warc_ts", "lang").collect()
    )
    downstate = sorted(
        (r.url, r.warc_ts, r.lang)
        for r in sink.table.read().select("url", "warc_ts", "lang").collect()
    )
    assert upstate == downstate


def test_lag_error_after_snapshot_expiry(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _apply_batches(spark, path, 3)
    c = ChangeFeedConsumer(spark, path, os.path.join(tmpdir_path, "ck.json"))
    c.commit(0)  # durably pin the cursor at the start of history
    pipe.table.expire_snapshots(keep_last=1)
    try:
        c.poll()
        raise AssertionError("expected ChangeFeedLagError")
    except ChangeFeedLagError:
        pass
