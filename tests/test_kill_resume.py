"""Mid-stream kill-and-resume tests (north_star requirement).

The crash is injected AFTER the lake commit but BEFORE Structured Streaming
records the batch in its checkpoint — the worst-case window. On restart the
source replays the same batch id; ``merge_apply``'s applied-batch guard (and
LWW idempotence underneath it) make the re-apply a no-op, so the resumed
run's final state must be identical to an uninterrupted run.

Reference analogue: the ``ok``-flag skip guard + WRITE_TRUNCATE idempotence
(/root/reference/fintick/controllers/base.py:80-86,166-186), which the
reference can only test manually against live GCP — here it is a local
deterministic test.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import StreamingQueryException

from crypto_exchange_etl_spark.sources.binlog import (
    read_binlog_stream,
    write_binlog_segments,
)
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline


def _state(table):
    rows = table.read().select("url", "warc_ts", "text", "lang").collect()
    return sorted(map(tuple, rows))


class _Boom(Exception):
    pass


def test_kill_after_commit_before_checkpoint_then_resume(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    ck = os.path.join(tmpdir_path, "ck")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=3, n_urls=250, seed=42)

    # uninterrupted oracle
    whole = CdcPipeline(spark, os.path.join(tmpdir_path, "whole"), n_buckets=4)
    whole.replay_all(binlog, batch_id=0)

    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    pipe.ensure_table()
    applied = {"n": 0}

    def crashing_sink(df, batch_id):
        pipe.apply_batch(df, batch_id)  # data + ledger COMMITTED
        applied["n"] += 1
        if applied["n"] == 2:
            raise _Boom("injected crash after commit, before checkpoint")

    stream = read_binlog_stream(spark, binlog, max_files_per_trigger=4)
    q = (
        stream.writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()

    crashed_batches = sorted(pipe.table.applied_batches())
    assert len(crashed_batches) == 2  # batch 1 committed but not checkpointed

    # resume from checkpoint with the normal (non-crashing) pipeline
    pipe.run_stream(binlog, ck, max_files_per_trigger=4, available_now=True,
                    timeout_secs=300)

    # batch 1 was re-delivered by the source; the guard must have skipped it
    # (no duplicate batch ids) and the final state equals the oracle
    resumed = sorted(pipe.table.applied_batches())
    assert len(resumed) == len(set(resumed))
    assert _state(pipe.table) == _state(whole.table)

    # ledger has exactly one row-set per (partition, batch) — no double apply
    led = pipe.table.ledger()
    dupes = (
        led.groupBy("partition", "batch_id").count().where(F.col("count") > 1).count()
    )
    assert dupes == 0


def test_kill_resume_with_audit_views_and_mor(spark, tmpdir_path):
    """Worst-case crash window with the whole session-4 surface enabled at
    once: merge-on-read writes, write-audit-publish staging on every
    batch, and an in-stream materialized view. After resume, the table
    must equal an uninterrupted replay and the view must equal a
    recompute — the three mechanisms' cursors/guards may not interfere."""
    from crypto_exchange_etl_spark.lake.matview import MaterializedAggregate

    binlog = os.path.join(tmpdir_path, "binlog")
    ck = os.path.join(tmpdir_path, "ck")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=3, n_urls=250, seed=42)

    whole = CdcPipeline(spark, os.path.join(tmpdir_path, "whole"), n_buckets=4)
    whole.replay_all(binlog, batch_id=0)

    table_path = os.path.join(tmpdir_path, "t")
    view = MaterializedAggregate(
        spark, table_path, os.path.join(tmpdir_path, "view"),
        group_col="lang", sums={"n_chars": "length(text)"},
    )
    pipe = CdcPipeline(
        spark, table_path, n_buckets=4, write_mode="mor", max_deltas=2,
        audit=lambda df, s: True, views=[view],
    )
    pipe.ensure_table()
    applied = {"n": 0}

    def crashing_sink(df, batch_id):
        pipe.apply_batch(df, batch_id)
        applied["n"] += 1
        if applied["n"] == 2:
            raise _Boom("injected crash after commit, before checkpoint")

    stream = read_binlog_stream(spark, binlog, max_files_per_trigger=4)
    q = (
        stream.writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()

    pipe.run_stream(binlog, ck, max_files_per_trigger=4, available_now=True,
                    timeout_secs=300)

    assert pipe.table.list_staged() == []  # no staged leftovers
    assert _state(pipe.table) == _state(whole.table)
    got = sorted(map(tuple, view.read().collect()))
    want = sorted(
        map(
            tuple,
            pipe.table.read()
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.coalesce(F.expr("length(text)"), F.lit(0))).alias("n_chars"),
            )
            .collect(),
        )
    )
    assert got == want
