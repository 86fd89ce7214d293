"""lake_cdf admission control (maxVersionsPerBatch) and batch reads.

Rate limiting bounds each micro-batch to K table versions — the Delta
``maxFilesPerTrigger`` analogue for a version-offset source — so a
consumer restarted against a long backlog pages through it in bounded
steps instead of one giant batch. Batch reads expose the same planner
via ``spark.read.format("lake_cdf")`` (Delta batch-CDF analogue).
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.cdf_source import LakeCdfDataSource
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _canon(df):
    rows = df.select(
        "url", "warc_ts", "lang", "_change_type", "_commit_version"
    ).collect()
    return sorted(
        (r.url, r.warc_ts, r.lang, r._change_type, r._commit_version)
        for r in rows
    )


def _history(spark, path, n_commits=5):
    """A table with n_commits merge commits touching distinct keys."""
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(4)
    ])
    t = pipe.table
    v0 = t.current_version()
    for b in range(1, n_commits):
        _apply(spark, pipe, b, [
            (100 + b, 0, "U", f"u{b % 4}",
             TS + dt.timedelta(days=b), b"<p>x</p>", f"l{b}"),
        ])
    return pipe.table, v0


def test_max_versions_per_batch_pages_through_backlog(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    t, v0 = _history(spark, path, n_commits=5)
    vN = t.current_version()
    expect = _canon(t.changes_between(v0, vN))

    spark.dataSource.register(LakeCdfDataSource)
    df = (
        spark.readStream.format("lake_cdf")
        .option("path", path)
        .option("startingVersion", v0 + 1)
        .option("maxVersionsPerBatch", 1)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ck"))
        .load()
    )
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            try:
                got = spark.read.schema(df.schema).parquet(out)
                if got.count() >= len(expect):
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
    got = spark.read.schema(df.schema).parquet(out)
    assert _canon(got) == expect  # nothing lost, nothing duplicated
    # the backlog was paged: more than one non-empty micro-batch planned
    offsets = [f for f in os.listdir(os.path.join(ck, "offsets"))
               if not f.startswith(".")]
    assert len(offsets) >= (vN - v0)


def test_batch_read_matches_changes_between(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    t, v0 = _history(spark, path, n_commits=4)
    vN = t.current_version()
    spark.dataSource.register(LakeCdfDataSource)

    full = (
        spark.read.format("lake_cdf")
        .option("path", path)
        .option("startingVersion", v0 + 1)
        .load()
    )
    assert _canon(full) == _canon(t.changes_between(v0, vN))

    # subrange with endingVersion (inclusive)
    sub = (
        spark.read.format("lake_cdf")
        .option("path", path)
        .option("startingVersion", v0 + 1)
        .option("endingVersion", v0 + 2)
        .load()
    )
    assert _canon(sub) == _canon(t.changes_between(v0, v0 + 2))

    # filters compose: it's a normal DataFrame (the range (v0, vN] holds
    # the 3 update commits; the bootstrap inserts predate it)
    post = full.where(F.col("_change_type") == "update_postimage")
    assert post.count() == 3


def test_batch_read_requires_starting_version(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    _history(spark, path, n_commits=2)
    spark.dataSource.register(LakeCdfDataSource)
    try:
        spark.read.format("lake_cdf").option("path", path).load().collect()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_rate_limited_restart_resumes_without_duplicates(spark, tmpdir_path):
    """Stop a rate-limited stream mid-backlog and restart it with the
    SAME options (stale startingVersion included — the documented
    re-anchor case): the floor self-heals from the checkpointed start
    and the union of both runs is exactly the change feed, no
    duplicates, no gaps."""
    path = os.path.join(tmpdir_path, "t")
    t, v0 = _history(spark, path, n_commits=6)
    vN = t.current_version()
    expect = _canon(t.changes_between(v0, vN))

    spark.dataSource.register(LakeCdfDataSource)
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")

    def run(stop_after_rows):
        df = (
            spark.readStream.format("lake_cdf")
            .option("path", path)
            .option("startingVersion", v0 + 1)
            .option("maxVersionsPerBatch", 1)
            .option("checkpointLocation", ck)
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 240
        try:
            while time.time() < deadline:
                try:
                    if spark.read.schema(df.schema).parquet(out).count() >= stop_after_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()
        return df.schema

    sch = run(stop_after_rows=2)        # partial drain
    run(stop_after_rows=len(expect))    # restart, same stale options
    got = spark.read.schema(sch).parquet(out)
    assert _canon(got) == expect


def test_max_versions_requires_checkpoint_location(spark, tmpdir_path):
    """Admission control without the checkpointLocation anchor would
    rewind the offset log on restart — it is refused outright."""
    path = os.path.join(tmpdir_path, "t")
    _history(spark, path, n_commits=2)
    spark.dataSource.register(LakeCdfDataSource)
    df = (
        spark.readStream.format("lake_cdf")
        .option("path", path)
        .option("maxVersionsPerBatch", 1)
        .load()
    )
    q = None
    try:
        q = (df.writeStream.format("noop")
             .option("checkpointLocation", os.path.join(tmpdir_path, "ck2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        failed = False
    except Exception as e:
        failed = "checkpointLocation" in str(e)
    finally:
        if q is not None:
            try:
                q.stop()
            except Exception:
                pass
    assert failed
