"""Maintenance-commit REBASE (Iceberg validation + retry, not recompute).

A compaction/retention/bloom commit losing the version CAS re-points its
file swap at the new head when its input files are still present —
carrying the concurrent commit's files, watermarks and schema forward —
instead of redoing the rewrite. Only a concurrent rewrite of its inputs
(validated) forces recompute, surfaced as CommitConflictError.
"""

from __future__ import annotations

import datetime as dt
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.table import CommitConflictError, LakeTable
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _inject_before(monkeypatch, op_name, fire):
    """Arrange for `fire()` to run right before the first commit whose
    summary operation is `op_name` — a concurrent writer winning the CAS."""
    orig = LakeTable._write_manifest
    state = {"armed": True}

    def hijack(self, manifest):
        if state["armed"] and manifest.get("summary", {}).get("operation") == op_name:
            state["armed"] = False
            fire()
        orig(self, manifest)

    monkeypatch.setattr(LakeTable, "_write_manifest", hijack)
    return state


def test_minor_compact_rebases_over_concurrent_merge(spark, tmpdir_path, monkeypatch):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode="mor", max_deltas=1000)
    for b in range(3):
        _apply(spark, pipe, b, [
            (b * 10 + i, 0, "I" if b == 0 else "U", f"u{i}", TS + dt.timedelta(hours=b),
             f"<p>{b}.{i}</p>".encode(), "en") for i in range(4)
        ])
    t = pipe.table

    def fire():  # a merge lands between compaction compute and commit
        _apply(spark, pipe, 99, [
            (999, 0, "U", "u0", TS + dt.timedelta(days=9), b"<p>late</p>", "de"),
        ])

    _inject_before(monkeypatch, "minor_compact", fire)
    s = t.minor_compact(max_deltas=1)
    assert "rebased_onto" in s, s

    # the concurrent merge's delta survived the rebase and still wins LWW
    m = pipe.table.manifest()
    rows = {r.url: r.lang for r in pipe.table.read().collect()}
    assert rows["u0"] == "de"
    assert len(rows) == 4
    # exactly-once: the raced batch is recorded applied on the final chain
    assert 99 in pipe.table.applied_batches()
    # and the compaction's outputs are in the file list
    assert any("minor-" in f["path"] for f in m["files"])


def test_compact_files_raises_when_inputs_rewritten(spark, tmpdir_path, monkeypatch):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)  # CoW: merges rewrite buckets
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(6)
    ])
    t = pipe.table

    def fire():  # CoW merge rewrites the very files compaction consumed
        _apply(spark, pipe, 1, [
            (50, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>y</p>", "de"),
        ])

    _inject_before(monkeypatch, "compact", fire)
    with pytest.raises(CommitConflictError, match="rewritten"):
        t.compact_files()
    # table state is the concurrent merge's — compaction left no trace
    rows = {r.url: r.lang for r in pipe.table.read().collect()}
    assert rows["u0"] == "de" and len(rows) == 6


def test_compact_files_rebases_over_metadata_commit(spark, tmpdir_path, monkeypatch):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(6)
    ])
    t = pipe.table

    _orig = LakeTable._write_manifest

    def fire():  # metadata-only concurrent commit: files untouched
        m = t.manifest()
        nm = dict(m)
        nm.update(version=m["version"] + 1, snapshot_id=str(uuid.uuid4()),
                  parent_version=m["version"], summary={"operation": "noop"},
                  committed_at_unix=time.time())
        _orig(t, nm)  # through the un-hijacked method

    _inject_before(monkeypatch, "compact", fire)
    s = t.compact_files()
    assert "rebased_onto" in s
    rows = {r.url for r in pipe.table.read().select("url").collect()}
    assert rows == {f"u{i}" for i in range(6)}


def test_build_blooms_rebases_and_degrades_safely(spark, tmpdir_path, monkeypatch):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode="mor", max_deltas=1000)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(6)
    ])
    t = pipe.table

    def fire():  # merge adds files AFTER the bloom scan
        _apply(spark, pipe, 1, [
            (50, 0, "I", "u_new", TS + dt.timedelta(days=1), b"<p>n</p>", "en"),
        ])

    _inject_before(monkeypatch, "build_blooms", fire)
    s = t.build_blooms()
    assert "rebased_onto" in s
    t2 = pipe.table
    # bloom-covered key and post-bloom key both look up correctly
    assert t2.lookup("u0").count() == 1
    assert t2.lookup("u_new").count() == 1
    assert t2.lookup("missing").count() == 0
