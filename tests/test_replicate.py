"""Lake→lake incremental replication (``lake_cdf`` → ``lake_sink``).

Oracle: the source table's own ``read()`` — after each drained
replication pass the replica's logical state must equal it exactly.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F, types as T

from crypto_exchange_etl_spark.lake.replicate import create_replica, replicate_stream
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _canon(df):
    return sorted(map(tuple, df.select("url", "warc_ts", "html", "text", "lang").collect()))


def _sync(spark, src, dst, ck):
    q = replicate_stream(spark, src, dst, ck)
    q.awaitTermination(300)


def test_replica_tracks_source_exactly_once(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    dst = os.path.join(tmpdir_path, "dst")
    ck = os.path.join(tmpdir_path, "ck")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en")
        for i in range(12)
    ])
    rep = create_replica(spark, src, dst)
    _sync(spark, src, dst, ck)
    assert _canon(rep.read()) == _canon(pipe.table.read())

    # more changes: update, delete, insert — drain again, same checkpoint
    _apply(spark, pipe, 1, [
        (100, 0, "U", "u0", TS + dt.timedelta(days=2), b"<p>v2</p>", "de"),
        (101, 0, "D", "u1", TS + dt.timedelta(days=2), None, None),
        (102, 0, "I", "u99", TS + dt.timedelta(days=2), b"<p>99</p>", "fr"),
    ])
    _sync(spark, src, dst, ck)
    assert _canon(rep.read()) == _canon(pipe.table.read())
    assert rep.read().where(F.col("url") == "u1").count() == 0
    v = rep.current_version()

    # nothing new: a third drain commits nothing (exactly-once, no churn)
    _sync(spark, src, dst, ck)
    assert rep.current_version() == v

    # a FRESH checkpoint is a new producer (sinkId derives from the
    # checkpoint path): its replay re-applies CONVERGENTLY (LWW
    # idempotent) instead of being silently swallowed by the previous
    # bootstrap's guards — what makes re-bootstrapping from a later
    # startingVersion safe. Same state, new commits.
    _sync(spark, src, dst, os.path.join(tmpdir_path, "ck2"))
    assert rep.current_version() > v
    assert _canon(rep.read()) == _canon(pipe.table.read())
    # while the SAME checkpoint stays exactly-once (no churn)
    _sync(spark, src, dst, ck)
    assert _canon(rep.read()) == _canon(pipe.table.read())


def test_replica_follows_schema_evolution(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    dst = os.path.join(tmpdir_path, "dst")
    ck = os.path.join(tmpdir_path, "ck")
    pipe = CdcPipeline(spark, src, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(4)
    ])
    create_replica(spark, src, dst)
    _sync(spark, src, dst, ck)

    # source evolves: merge_into with an extra column adds it to the schema
    src_t = pipe.table
    extra = spark.createDataFrame(
        [("u0", TS + dt.timedelta(days=1), 0.9)],
        T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("grade", T.DoubleType()),
        ]),
    )
    src_t.merge_into(extra, when_matched_update="*", when_not_matched_insert="*")
    assert "grade" in src_t.schema.fieldNames()

    # restart contract: re-create syncs the replica's DDL, then a NEW
    # query on the SAME checkpoint (= same derived sinkId, same
    # producer) re-pins the CDF schema (now with the column) and resumes
    # past the already-replicated versions
    rep = create_replica(spark, src, dst)
    assert "grade" in rep.schema.fieldNames()
    q = replicate_stream(spark, src, dst, ck)
    q.awaitTermination(300)
    want = {r.url: r.grade for r in src_t.read().collect()}
    got = {r.url: r.grade for r in rep.read().collect()}
    assert got == want and got["u0"] == 0.9


def test_replicate_cli_subcommand(spark, tmpdir_path, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cdc_job", os.path.join(os.path.dirname(__file__), "..", "scripts", "cdc_job.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    src = os.path.join(tmpdir_path, "src")
    dst = os.path.join(tmpdir_path, "dst")
    pipe = CdcPipeline(spark, src, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(5)
    ])
    rc = mod.main([
        "replicate", "--source", src, "--target", dst,
        "--checkpoint", os.path.join(tmpdir_path, "ck"),
    ])
    assert rc == 0
    from crypto_exchange_etl_spark.lake.table import LakeTable

    rep = LakeTable.load(spark, dst)
    assert _canon(rep.read()) == _canon(pipe.table.read())


def test_replicate_once_batch_drain(spark, tmpdir_path):
    """replicate_once: the batch-mode drain (no stream machinery) tracks
    the source exactly, advances its cursor atomically with the data
    (guard-derived), is a no-op when caught up, and swallows a replayed
    (sinkId, batchId) write — the crash-rerun schedule."""
    from pyspark.sql import functions as F

    from crypto_exchange_etl_spark.lake.replicate import (
        replica_position,
        replicate_once,
    )
    from crypto_exchange_etl_spark.lake.table import LakeTable

    src = os.path.join(tmpdir_path, "src")
    dst = os.path.join(tmpdir_path, "dst")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en")
        for i in range(12)
    ])
    assert replicate_once(spark, src, dst) == (0, 1)
    rep = LakeTable.load(spark, dst)
    assert _canon(rep.read()) == _canon(pipe.table.read())

    _apply(spark, pipe, 1, [
        (100, 0, "U", "u0", TS + dt.timedelta(days=2), b"<p>v2</p>", "de"),
        (101, 0, "D", "u1", TS + dt.timedelta(days=2), None, None),
        (102, 0, "I", "u99", TS + dt.timedelta(days=2), b"<p>99</p>", "fr"),
    ])
    assert replicate_once(spark, src, dst) == (1, 2)
    assert _canon(rep.read()) == _canon(pipe.table.read())
    assert rep.read().where(F.col("url") == "u1").count() == 0

    # caught up: no commit, cursor stable
    v = rep.current_version()
    assert replicate_once(spark, src, dst) is None
    assert rep.current_version() == v

    # crash-rerun: a replayed batch write with the SAME (sinkId, batchId)
    # commits nothing (guard) — simulate by re-driving the sink directly
    sink_id = next(
        str(g).rsplit(":", 2)[1]
        for g in rep.manifest()["applied_batches"]
        if str(g).startswith("sink:")
    )
    assert replica_position(rep, sink_id) == 2
    ch = (
        spark.read.format("lake_cdf").option("path", src)
        .option("startingVersion", 2).option("endingVersion", 2)
        .option("includePreimages", "false").load()
    )
    from crypto_exchange_etl_spark.lake.replicate import replicate_changes

    out = replicate_changes(ch).withColumn("__bucket__", rep.bucket_expr())
    (
        out.write.format("lake_sink").option("path", dst)
        .option("sinkId", sink_id).option("batchId", 2)
        .option("bucketColumn", "__bucket__").mode("append").save()
    )
    assert rep.current_version() == v  # replay swallowed
    assert _canon(rep.read()) == _canon(pipe.table.read())


def test_lake_sink_batch_writer_requires_batch_id(spark, tmpdir_path):
    from crypto_exchange_etl_spark.lake.table import LakeTable
    from crypto_exchange_etl_spark.model import PAGES_SCHEMA

    import pytest

    path = os.path.join(tmpdir_path, "t")
    LakeTable.create(spark, path, PAGES_SCHEMA, n_buckets=2)
    df = spark.createDataFrame(
        [("u1", TS, b"<p>x</p>", "x", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    with pytest.raises(Exception, match="batchId"):
        df.write.format("lake_sink").option("path", path).mode("append").save()
