"""``lake_cdf`` streaming data source (Spark 4 Python Data Source API).

Parity oracle is :meth:`LakeTable.changes_between` itself (already
verified against brute-force snapshot diffs in test_lake_features): the
streamed rows for (v0, vN] must equal the batch CDF rows exactly.
"""

from __future__ import annotations

import datetime as dt
import os

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
        "url", "warc_ts", "text", "lang", "_change_type", "_commit_version"
    ).collect()
    return sorted(
        (r.url, r.warc_ts, r.text, r.lang, r._change_type, r._commit_version)
        for r in rows
    )


def _drain(spark, path, starting_version, tmp, write_mode_cols=None):
    spark.dataSource.register(LakeCdfDataSource)
    df = (
        spark.readStream.format("lake_cdf")
        .option("path", path)
        .option("startingVersion", starting_version)
        .load()
    )
    out = os.path.join(tmp, "cdf_out")
    ck = os.path.join(tmp, "cdf_ck")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.schema(df.schema).parquet(out)


def test_stream_matches_batch_cdf(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=4)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS + dt.timedelta(hours=i), f"<p>{i}</p>".encode(), "en")
        for i in range(6)
    ])
    t = pipe.table
    v0 = t.current_version()
    _apply(spark, pipe, 1, [
        (100, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>new</p>", "de"),
        (101, 0, "I", "u9", TS + dt.timedelta(days=1), b"<p>9</p>", "en"),
    ])
    _apply(spark, pipe, 2, [
        (200, 0, "D", "u1", TS + dt.timedelta(days=2), None, None),
    ])

    got = _drain(spark, path, starting_version=v0 + 1, tmp=tmpdir_path)
    want = pipe.table.changes_between(v0)
    assert _canon(got) == _canon(want)
    kinds = {r._change_type for r in got.collect()}
    assert kinds == {"insert", "update_preimage", "update_postimage", "delete"}


def test_stream_tail_only_default_and_restart(spark, tmpdir_path):
    """Default start = tail (no history replay); a restarted query resumes
    from the checkpoint, never re-emitting consumed versions."""
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(4)
    ])
    spark.dataSource.register(LakeCdfDataSource)
    df = spark.readStream.format("lake_cdf").option("path", path).load()
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")

    def drain():
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()  # tail start: the seed batch predates the query
    assert spark.read.schema(df.schema).parquet(out).count() == 0

    _apply(spark, pipe, 1, [
        (10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "de"),
    ])
    drain()
    first = _canon(spark.read.schema(df.schema).parquet(out))
    assert {k[4] for k in first} == {"update_preimage", "update_postimage"}

    drain()  # nothing new: restart must not re-emit
    assert _canon(spark.read.schema(df.schema).parquet(out)) == first

    _apply(spark, pipe, 2, [
        (20, 0, "D", "u2", TS + dt.timedelta(days=2), None, None),
    ])
    drain()
    rows = _canon(spark.read.schema(df.schema).parquet(out))
    assert len(rows) == len(first) + 1
    assert any(k[4] == "delete" and k[0] == "u2" for k in rows)


def test_stream_across_mor_and_rename(spark, tmpdir_path):
    """Delta commits (MOR) and a field-id rename mid-stream: the pinned
    query schema keeps emitting under its own names, values resolved by
    id from files written before AND after the rename."""
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode="mor",
                       max_deltas=1000)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(3)
    ])
    t = pipe.table
    v0 = t.current_version()
    _apply(spark, pipe, 1, [
        (10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "fr"),
    ])
    t.rename_column("lang", "language")  # metadata-only commit: no rows
    _apply(spark, pipe, 2, [
        (20, 0, "U", "u1", TS + dt.timedelta(days=2), b"<p>y</p>", "de"),
    ])

    got = _drain(spark, path, starting_version=v0 + 1, tmp=tmpdir_path)
    # query schema pinned at CURRENT version: 'language' (renamed) plus
    # 'lang' (re-minted by batch 2's name-bound evolution)
    assert "language" in got.columns and "lang" in got.columns
    by = {(r.url, r._change_type): r for r in got.collect()}
    # u0's images were written pre-rename under 'lang' (old field id) —
    # resolved by id into the pinned 'language' column
    assert by[("u0", "update_preimage")].language == "en"
    assert by[("u0", "update_postimage")].language == "fr"
    assert by[("u0", "update_postimage")].lang is None  # new id: no leak
    # u1's postimage arrived after the rename: its envelope 'lang' bound
    # the NEW column; its 'language' (old id) carries nothing new
    assert by[("u1", "update_preimage")].language == "en"
    assert by[("u1", "update_postimage")].language is None
    assert by[("u1", "update_postimage")].lang == "de"


def test_stream_fills_initial_defaults(spark, tmpdir_path):
    """add_column with an initial default mid-history: images from files
    that PREDATE the add stream the default (same rule as _read_raw);
    post-add rows own their written value."""
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(3)
    ])
    t = pipe.table
    t.add_column("score", "double", default=0.5)
    v_add = t.current_version()
    _apply(spark, pipe, 1, [
        (10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "fr"),
    ])

    got = _drain(spark, path, starting_version=v_add + 1, tmp=tmpdir_path)
    by = {(r.url, r._change_type): r for r in got.collect()}
    # preimage read from a pre-add file: default, not null
    assert by[("u0", "update_preimage")].score == 0.5
    # postimage written after the add by a writer that omitted the
    # column: physical null stays null (initial-, not write-, default)
    assert by[("u0", "update_postimage")].score is None


def test_batch_cdf_without_preimages(spark, tmpdir_path):
    """``includePreimages=false``: same change set minus the
    ``update_preimage`` rows — postimage/insert payload intact, delete
    rows carry null payload (key + warc_ts stay) because the old side
    was planned to read only key/rank/liveness columns."""
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=4)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en")
        for i in range(6)
    ])
    t = pipe.table
    v0 = t.current_version()
    _apply(spark, pipe, 1, [
        (100, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>new</p>", "de"),
        (101, 0, "I", "u9", TS + dt.timedelta(days=1), b"<p>9</p>", "en"),
    ])
    _apply(spark, pipe, 2, [
        (200, 0, "D", "u1", TS + dt.timedelta(days=2), None, None),
    ])

    spark.dataSource.register(LakeCdfDataSource)

    def batch(**opts):
        r = (
            spark.read.format("lake_cdf")
            .option("path", path)
            .option("startingVersion", v0 + 1)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    full = _canon(batch())
    slim = _canon(batch(includePreimages="false"))

    want = [r for r in full if r[4] != "update_preimage"]
    # deletes: payload (text/lang here) nulled, key + warc_ts + meta kept
    want = [
        (u, ts, None, None, ct, cv) if ct == "delete" else (u, ts, tx, lg, ct, cv)
        for (u, ts, tx, lg, ct, cv) in want
    ]
    assert slim == sorted(want)
    assert {r[4] for r in slim} == {"insert", "update_postimage", "delete"}
