"""Zero-copy table clone (Delta CLONE analogue, hardlink deep clone)."""

from __future__ import annotations

import datetime as dt
import os

from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def test_clone_is_independent_and_zero_copy(spark, tmpdir_path):
    src_path = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src_path, n_buckets=2, write_mode="mor",
                       max_deltas=1000)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(5)
    ])
    _apply(spark, pipe, 1, [
        (10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "de"),
    ])
    src = pipe.table

    clone = src.clone_to(os.path.join(tmpdir_path, "fork"))
    assert clone.current_version() == 0
    assert sorted(r.url for r in clone.read().select("url").collect()) == [
        f"u{i}" for i in range(5)
    ]
    # zero-copy: data files are hardlinks of the source bytes
    f0 = clone.manifest()["files"][0]["path"]
    st = os.stat(os.path.join(clone.path, f0))
    assert st.st_nlink >= 2
    assert st.st_ino == os.stat(os.path.join(src.path, f0)).st_ino

    # diverge the fork: merges against the clone see the carried
    # exactly-once guard (batch 1 already applied) and new batches land
    fork_pipe = CdcPipeline(spark, clone.path, n_buckets=2, write_mode="mor",
                            max_deltas=1000)
    assert fork_pipe.apply_batch(
        spark.createDataFrame(
            [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "de")],
            CHANGES_SCHEMA),
        batch_id=1,
    ).get("skipped")
    _apply(spark, fork_pipe, 2, [
        (20, 0, "D", "u1", TS + dt.timedelta(days=2), None, None),
    ])
    assert fork_pipe.table.read().count() == 4
    # source untouched by the fork's delete
    assert LakeTable.load(spark, src_path).read().count() == 5

    # source-side retention does not break the fork (hardlinked bytes
    # survive until the last referent unlinks)
    _apply(spark, pipe, 3, [
        (30, 0, "U", "u2", TS + dt.timedelta(days=3), b"<p>z</p>", "fr"),
    ])
    src2 = LakeTable.load(spark, src_path)
    src2.compact_files()
    src2.expire_snapshots(keep_last=1)
    src2.remove_orphans(older_than_secs=0)
    assert fork_pipe.table.read().count() == 4  # fork still whole


def test_failover_fork_resumes_stream(spark, tmpdir_path):
    """DR failover: fork (table + checkpoint) mid-feed, keep consuming on
    BOTH sides, and the fork converges to the primary's exact state."""
    from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=1500, n_segments=2,
                          n_urls=150, seed=11)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "primary"),
                       n_buckets=4, write_mode="mor", max_deltas=1000)
    ck = os.path.join(tmpdir_path, "ck")
    pipe.run_stream(binlog, ck, available_now=True, timeout_secs=300)

    fork = pipe.fork(os.path.join(tmpdir_path, "standby"), ck,
                     os.path.join(tmpdir_path, "ck_standby"))
    assert fork.write_mode == "mor" and fork.n_buckets == 4  # config carried

    # the feed grows after the fork (old segments immutable, same seed)
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=4,
                          n_urls=150, seed=11)
    pipe.run_stream(binlog, ck, available_now=True, timeout_secs=300)
    fork.run_stream(binlog, os.path.join(tmpdir_path, "ck_standby"),
                    available_now=True, timeout_secs=300)

    def state(t):
        return sorted(
            (r.url, r.text, str(r.warc_ts), r.lang)
            for r in t.read().collect()
        )

    assert state(fork.table) == state(pipe.table)
    # and both equal a from-scratch single-shot replay of the full feed
    ref = CdcPipeline(spark, os.path.join(tmpdir_path, "ref"), n_buckets=4)
    ref.replay_all(binlog)
    assert state(pipe.table) == state(ref.table)
    # refuses to clobber an existing checkpoint
    try:
        pipe.fork(os.path.join(tmpdir_path, "other"), ck,
                  os.path.join(tmpdir_path, "ck_standby"))
        raise AssertionError("expected FileExistsError")
    except FileExistsError:
        pass


def test_clone_pinned_version(spark, tmpdir_path):
    src_path = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src_path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(3)
    ])
    v0 = pipe.table.current_version()
    _apply(spark, pipe, 1, [
        (9, 0, "I", "u9", TS + dt.timedelta(days=1), b"<p>9</p>", "en"),
    ])
    clone = pipe.table.clone_to(os.path.join(tmpdir_path, "asof"), version=v0)
    assert clone.read().count() == 3
    assert clone.manifest()["summary"]["source_version"] == v0
