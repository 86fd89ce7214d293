"""Merge-on-read mode: delta appends, minor compaction, tombstone GC.

The CoW suite (test_cdc_spine.py) pins merge semantics; this suite pins
that MOR produces the identical logical state while writing O(batch)
bytes per micro-batch, and that compaction folds deltas and GCs
tombstones under the applied-LSN watermark.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

from test_cdc_spine import _state

UTC = dt.timezone.utc


def _new_bytes(manifest_before, manifest_after) -> int:
    before = {f["path"] for f in manifest_before["files"]}
    return sum(f["bytes"] for f in manifest_after["files"] if f["path"] not in before)


def test_mor_equals_cow_state(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=4000, n_segments=4, n_urls=300)
    cow = CdcPipeline(spark, os.path.join(tmpdir_path, "cow"), n_buckets=4)
    mor = CdcPipeline(
        spark, os.path.join(tmpdir_path, "mor"), n_buckets=4,
        write_mode="mor", max_deltas=3,
    )
    for i in range(4):
        seg = spark.read.parquet(os.path.join(binlog, f"seg={i:05d}"))
        cow.apply_batch(seg, batch_id=i)
        mor.apply_batch(seg, batch_id=i)
    assert _state(cow.table) == _state(mor.table)
    assert mor.table.write_mode == "mor"


def test_mor_merge_matrix_and_stats(spark, tmpdir_path):
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=4, write_mode="mor",
        max_deltas=100,  # keep deltas outstanding
    )
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)

    def ch(lsn, op, url, hours=0, html=b"<p>x</p>"):
        return (
            lsn, 0, op, url, ts + dt.timedelta(hours=hours),
            None if op == "D" else html, None if op == "D" else "en",
        )

    s0 = pipe.apply_batch(
        spark.createDataFrame(
            [ch(1, "I", "a"), ch(2, "I", "b"), ch(3, "I", "c")], CHANGES_SCHEMA
        ),
        batch_id=0,
    )
    assert s0["n_insert"] == 3 and s0["n_update"] == 0
    s1 = pipe.apply_batch(
        spark.createDataFrame(
            [ch(4, "U", "a", hours=1, html=b"<p>a2</p>"), ch(5, "D", "b", hours=1),
             ch(6, "I", "d", hours=1)],
            CHANGES_SCHEMA,
        ),
        batch_id=1,
    )
    # stats come from the FOLDED live view of affected buckets
    assert s1["n_insert"] == 1 and s1["n_update"] == 1 and s1["n_delete"] == 1
    live = {r.url: r.text for r in pipe.table.read().collect()}
    assert set(live) == {"a", "c", "d"} and live["a"] == "a2"


def test_mor_write_cost_is_o_batch(spark, tmpdir_path):
    """The scale property CoW lacks: per-batch written bytes track the
    BATCH size, not the live table size, even when the batch's Zipf keys
    touch every bucket."""
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=20_000, n_segments=1, n_urls=2_000)
    seg = spark.read.parquet(os.path.join(binlog, "seg=00000"))

    cow = CdcPipeline(spark, os.path.join(tmpdir_path, "cow"), n_buckets=4)
    mor = CdcPipeline(
        spark, os.path.join(tmpdir_path, "mor"), n_buckets=4,
        write_mode="mor", max_deltas=10_000,
    )
    cow.apply_batch(seg, batch_id=0)
    mor.apply_batch(seg, batch_id=0)

    small = seg.orderBy(F.desc("lsn")).limit(100)  # newest 100 events
    results = {}
    for pipe in (cow, mor):
        before = pipe.table.manifest()
        pipe.apply_batch(small, batch_id=1)
        results[pipe.table.write_mode] = _new_bytes(before, pipe.table.manifest())
    table_bytes = sum(f["bytes"] for f in cow.table.manifest()["files"])
    # CoW rewrote every touched bucket (~whole table under Zipf spread);
    # MOR wrote only the 100 winners (floor: ~4 KB parquet footer × bucket)
    assert results["mor"] < results["cow"] / 5
    assert results["mor"] < table_bytes / 5
    assert _state(cow.table) == _state(mor.table)


def test_minor_compact_folds_and_preserves_state(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=3, n_urls=200)
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=4,
        write_mode="mor", max_deltas=10_000,  # no auto-compaction
    )
    for i in range(3):
        seg = spark.read.parquet(os.path.join(binlog, f"seg={i:05d}"))
        pipe.apply_batch(seg, batch_id=i)
    t = pipe.table
    st = _state(t)
    assert sum(t.delta_file_counts().values()) > 0
    t.minor_compact(max_deltas=1)  # fold every bucket with ≥1 delta
    assert sum(t.delta_file_counts().values()) == 0
    assert _state(t) == st


def test_auto_minor_compact_bounds_deltas(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=6, n_urls=200)
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=4,
        write_mode="mor", max_deltas=2,
    )
    for i in range(6):
        seg = spark.read.parquet(os.path.join(binlog, f"seg={i:05d}"))
        pipe.apply_batch(seg, batch_id=i)
    # the read path never folds more than max_deltas per bucket
    assert all(c < 2 for c in pipe.table.delta_file_counts().values())


def test_tombstone_gc_under_watermark(spark, tmpdir_path):
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=2,
        write_mode="mor", max_deltas=10_000,
    )
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    ins = [(i, 0, "I", f"u{i}", ts, b"<p>x</p>", "en") for i in range(10)]
    dels = [(10 + i, 0, "D", f"u{i}", ts + dt.timedelta(hours=1), None, None)
            for i in range(5)]
    pipe.apply_batch(spark.createDataFrame(ins, CHANGES_SCHEMA), batch_id=0)
    pipe.apply_batch(spark.createDataFrame(dels, CHANGES_SCHEMA), batch_id=1)
    t = pipe.table
    st = _state(t)
    phys = t.read_physical()
    assert phys.where(F.col("is_deleted")).count() == 5  # tombstones live
    # every delete lsn ≤ the applied watermark ⇒ GC-able
    t.minor_compact(max_deltas=1, gc_tombstones=True)
    assert t.read_physical().where(F.col("is_deleted")).count() == 0
    assert _state(t) == st  # logical state unchanged
    # compact_files offers the same GC for CoW tables
    cow = CdcPipeline(spark, os.path.join(tmpdir_path, "cow"), n_buckets=2)
    cow.apply_batch(spark.createDataFrame(ins, CHANGES_SCHEMA), batch_id=0)
    cow.apply_batch(spark.createDataFrame(dels, CHANGES_SCHEMA), batch_id=1)
    st2 = _state(cow.table)
    cow.table.compact_files(gc_tombstones=True)
    assert cow.table.read_physical().where(F.col("is_deleted")).count() == 0
    assert _state(cow.table) == st2


def test_mor_schema_evolution_across_deltas(spark, tmpdir_path):
    """Schema evolution while in merge-on-read mode: base files written
    under schema v1 must fold with delta files written under the widened
    v2 (missing column → null), and minor compaction must preserve the
    evolved state byte-for-byte."""
    import pyspark.sql.types as T

    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "me"), n_buckets=2,
        write_mode="mor", max_deltas=100,  # keep deltas: no auto-compact
    )
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    pipe.apply_batch(
        spark.createDataFrame([(1, 0, "I", "a", ts, b"<p>1</p>", "en")], CHANGES_SCHEMA),
        batch_id=0,
    )
    evolved = T.StructType(
        list(CHANGES_SCHEMA.fields)
        + [T.StructField("content_type", T.StringType(), True)]
    )
    s = pipe.apply_batch(
        spark.createDataFrame(
            [(2, 0, "I", "b", ts + dt.timedelta(hours=1), b"<p>2</p>", "en", "text/html")],
            evolved,
        ),
        batch_id=1,
    )
    assert any(c["kind"] == "add" for c in s["schema_changes"])
    # update of url "a" under the NEW schema, still as a delta
    pipe.apply_batch(
        spark.createDataFrame(
            [(3, 0, "U", "a", ts + dt.timedelta(hours=2), b"<p>1v2</p>", "en", "app/x")],
            evolved,
        ),
        batch_id=2,
    )
    want = {"a": "app/x", "b": "text/html"}
    got = {r.url: r.content_type for r in pipe.table.read().collect()}
    assert got == want
    assert any(f.get("delta") for f in pipe.table.manifest()["files"])

    # fold deltas into the base; evolved state must be unchanged
    pipe.table.minor_compact(max_deltas=1)
    assert not any(f.get("delta") for f in pipe.table.manifest()["files"])
    got2 = {r.url: r.content_type for r in pipe.table.read().collect()}
    assert got2 == want
