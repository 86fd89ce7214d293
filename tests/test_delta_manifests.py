"""Incremental (delta) manifests: per-commit metadata O(touched files).

A commit whose file-set change is small stores ``files_delta = {base,
added, removed, depth}`` instead of the full list; ``manifest()``
resolves the chain through an immutable-version cache, and every
``_DELTA_CHECKPOINT_DEPTH``-th link checkpoints the full list (the
Iceberg manifest-list property — at 10^5 files and per-hour commits,
KBs of metadata per commit instead of tens of MBs).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from crypto_exchange_etl_spark.lake.table import (
    _DELTA_CHECKPOINT_DEPTH,
    LakeTable,
    _fmt_version,
)
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _raw_manifest(t: LakeTable, v: int) -> dict:
    with open(os.path.join(t.meta_dir, _fmt_version(v))) as fh:
        return json.load(fh)


def _apply(spark, pipe, batch_id, rows):
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)
    return pipe.apply_batch(df, batch_id=batch_id)


def test_mor_appends_store_deltas(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4,
                       write_mode="mor", max_deltas=1000)
    for b in range(4):
        _apply(spark, pipe, b, [
            (b * 10 + i, 0, "I", f"u{b}_{i}", TS + dt.timedelta(hours=b),
             b"<p>x</p>", "en") for i in range(3)
        ])
    t = pipe.table
    v = t.current_version()
    raw = _raw_manifest(t, v)
    # an append-only MOR commit must not re-list the whole table
    assert "files" not in raw and "files_delta" in raw
    d = raw["files_delta"]
    assert d["removed"] == [] and len(d["added"]) >= 1
    # resolution reproduces the full list and reads work end-to-end
    m = t.manifest()
    assert len(m["files"]) == sum(
        len(_raw_manifest(t, i).get("files_delta", {}).get("added", []))
        + len(_raw_manifest(t, i).get("files", []))
        for i in range(v + 1)
    )
    assert t.read().count() == 12


def test_metadata_only_commit_is_tiny(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(8)
    ])
    t = pipe.table
    t.rename_column("lang", "language")  # touches no files
    raw = _raw_manifest(t, t.current_version())
    assert raw["files_delta"]["added"] == []
    assert raw["files_delta"]["removed"] == []
    assert {r.url for r in t.read().select("url").collect()} == {f"u{i}" for i in range(8)}


def test_checkpoint_bounds_chain_depth(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode="mor",
                       max_deltas=10_000)
    _apply(spark, pipe, 0, [(0, 0, "I", "u0", TS, b"<p>0</p>", "en")])
    t = pipe.table
    # drive the version counter with metadata-only commits (cheap) past
    # the checkpoint depth
    name = "lang"
    for i in range(_DELTA_CHECKPOINT_DEPTH + 3):
        nxt = f"lang_{i}"
        t.rename_column(name, nxt)
        name = nxt
    vs = range(1, t.current_version() + 1)
    kinds = ["full" if "files" in _raw_manifest(t, v) else
             _raw_manifest(t, v)["files_delta"]["depth"] for v in vs]
    assert "full" in kinds[1:], kinds  # at least one checkpoint link
    assert max(k for k in kinds if k != "full") < _DELTA_CHECKPOINT_DEPTH
    assert t.read().count() == 1


def test_expire_materializes_dangling_chains(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2,
                       write_mode="mor", max_deltas=1000)
    for b in range(5):
        _apply(spark, pipe, b, [
            (b * 10, 0, "I", f"u{b}", TS + dt.timedelta(hours=b), b"<p>x</p>", "en")
        ])
    t = pipe.table
    cur = t.current_version()
    assert "files_delta" in _raw_manifest(t, cur)  # chain reaches back
    t.expire_snapshots(keep_last=2)
    # surviving manifests must be self-contained or chain only to kept ones
    for v in (cur - 1, cur):
        raw = _raw_manifest(t, v)
        if "files_delta" in raw:
            assert raw["files_delta"]["base"] >= cur - 1
    assert t.read().count() == 5
    assert t.read(version=cur - 1).count() >= 4


def test_cow_rewrite_falls_back_to_full_or_delta_correctly(spark, tmpdir_path):
    """CoW rewrites most touched-bucket files; whichever representation
    wins, state and time travel stay exact."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(6)
    ])
    v0 = pipe.table.current_version()
    _apply(spark, pipe, 1, [
        (100, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>y</p>", "de")
    ])
    t = pipe.table
    assert t.read().count() == 6
    assert {r.lang for r in t.read().where("url = 'u0'").collect()} == {"de"}
    old = t.read(version=v0)
    assert {r.lang for r in old.where("url = 'u0'").collect()} == {"en"}
    # rollback across the delta chain round-trips
    t.rollback(v0)
    assert {r.lang for r in pipe.table.read().where("url = 'u0'").collect()} == {"en"}
