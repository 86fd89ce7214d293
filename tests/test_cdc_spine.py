"""End-to-end tests for the CDC spine: generator → extract → LWW → MERGE.

Test strategy adopted from the reference (SURVEY.md §5): deterministic
seeded generators + count/value assertions on kernels + the split-vs-whole
equivalence property (/root/reference/test/test_renko_aggregator.py:26-54),
generalized here to batch-boundary independence of the merged table state.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.functions.extract import (
    extract_text_bytes,
    with_extracted_text,
)
from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA, PAGES_SCHEMA
from crypto_exchange_etl_spark.operators.compaction import (
    lww_compact,
    lww_compact_window,
)
from crypto_exchange_etl_spark.sources.binlog import (
    generate_changes,
    read_binlog,
    write_binlog_segments,
)
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc


def _state(table: LakeTable):
    """Canonical comparable table state: sorted tuples of public+lineage."""
    rows = (
        table.read_physical()
        .where(~F.col("is_deleted"))
        .select("url", "warc_ts", "text", "lang", "lsn")
        .collect()
    )
    return sorted((r.url, r.warc_ts, r.text, r.lang, r.lsn) for r in rows)


# ---------------------------------------------------------------- generator


def test_generator_deterministic(spark):
    a = generate_changes(spark, 2000, n_urls=100, seed=7).collect()
    b = generate_changes(spark, 2000, n_urls=100, seed=7, parallelism=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    lsns = {r.lsn for r in a}
    assert lsns == set(range(2000))


def test_generator_skew_and_ops(spark):
    df = generate_changes(spark, 5000, n_urls=500, seed=42)
    by_url = df.groupBy("url").count()
    top = by_url.orderBy(F.desc("count")).first()
    assert top["count"] > 50  # Zipf head is hot
    ops = {r.op for r in df.select("op").distinct().collect()}
    assert ops == {"I", "U", "D"}
    # deletes carry null payload
    assert df.where((F.col("op") == "D") & F.col("html").isNotNull()).count() == 0


# --------------------------------------------------------------- extraction


def test_extract_byte_identity(spark):
    df = generate_changes(spark, 500, n_urls=50, seed=1).where(F.col("html").isNotNull())
    got = with_extracted_text(df).select("html", "text").collect()
    assert len(got) > 0
    for r in got:
        assert r.text == extract_text_bytes(bytes(r.html))


def test_extract_handles_script_style_and_nulls(spark):
    html = b"<html><script>var x=1;</script><style>p{}</style><p>Hello  <b>world</b></p></html>"
    assert extract_text_bytes(html) == "Hello world"
    df = spark.createDataFrame([(html,), (None,)], "html binary")
    out = {r.text for r in with_extracted_text(df).collect()}
    assert out == {"Hello world", None}


# ---------------------------------------------------------------------- LWW


def test_lww_compact_agg_equals_window(spark):
    df = generate_changes(spark, 3000, n_urls=100, seed=3)
    a = lww_compact(df).collect()
    b = lww_compact_window(df).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == df.select("url").distinct().count()


def test_lww_tiebreak_on_lsn(spark):
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        (1, 0, "U", "u", ts, b"a", "en"),
        (5, 0, "U", "u", ts, b"b", "en"),  # same warc_ts, higher lsn wins
        (3, 0, "U", "u", ts - dt.timedelta(hours=1), b"c", "en"),  # older ts loses
    ]
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)
    w = lww_compact(df).collect()
    assert len(w) == 1 and w[0].lsn == 5 and bytes(w[0].html) == b"b"


# -------------------------------------------------------------------- MERGE


def test_merge_insert_update_delete_matrix(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)

    def ch(lsn, op, url, hours=0, html=b"<p>x</p>"):
        return (
            lsn, 0, op, url, ts + dt.timedelta(hours=hours),
            None if op == "D" else html, None if op == "D" else "en",
        )

    b0 = spark.createDataFrame(
        [ch(1, "I", "a"), ch(2, "I", "b"), ch(3, "I", "c")], CHANGES_SCHEMA
    )
    s0 = pipe.apply_batch(b0, batch_id=0)
    assert s0["n_insert"] == 3 and s0["n_update"] == 0

    b1 = spark.createDataFrame(
        [ch(4, "U", "a", hours=1, html=b"<p>a2</p>"), ch(5, "D", "b", hours=1),
         ch(6, "I", "d", hours=1)],
        CHANGES_SCHEMA,
    )
    s1 = pipe.apply_batch(b1, batch_id=1)
    assert s1["n_insert"] == 1 and s1["n_update"] == 1 and s1["n_delete"] == 1

    live = {r.url: r.text for r in pipe.table.read().collect()}
    assert set(live) == {"a", "c", "d"}
    assert live["a"] == "a2"


def test_merge_late_update_after_delete_is_ignored(spark, tmpdir_path):
    """Tombstones give replay-order-independent LWW: an older update
    arriving after a newer delete must NOT resurrect the row."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    d = spark.createDataFrame(
        [(10, 0, "D", "u", ts + dt.timedelta(hours=2), None, None)], CHANGES_SCHEMA
    )
    pipe.apply_batch(d, batch_id=0)
    late = spark.createDataFrame(
        [(5, 0, "U", "u", ts, b"<p>old</p>", "en")], CHANGES_SCHEMA
    )
    pipe.apply_batch(late, batch_id=1)
    assert pipe.table.read().count() == 0


def test_merge_idempotent_reapply(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=2000, n_segments=2, n_urls=200)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    pipe.replay_all(binlog, batch_id=0)
    st = _state(pipe.table)
    assert pipe.replay_all(binlog, batch_id=0) == {"skipped": True, "batch_id": 0}
    # even a FORCED re-apply under a new batch id is a state no-op (LWW)
    pipe.replay_all(binlog, batch_id=99)
    assert _state(pipe.table) == st


def test_split_vs_whole_equivalence(spark, tmpdir_path):
    """f(all) ≡ f(batch_0) ∘ … ∘ f(batch_n) — the reference's cache test
    (/root/reference/test/test_renko_aggregator.py:26-54) generalized to
    merge state."""
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=4000, n_segments=4, n_urls=300)
    whole = CdcPipeline(spark, os.path.join(tmpdir_path, "whole"), n_buckets=4)
    whole.replay_all(binlog, batch_id=0)

    split = CdcPipeline(spark, os.path.join(tmpdir_path, "split"), n_buckets=4)
    for i in range(4):
        seg = spark.read.parquet(os.path.join(binlog, f"seg={i:05d}"))
        split.apply_batch(seg, batch_id=i)

    assert _state(whole.table) == _state(split.table)


def test_bucket_pruned_rewrite(spark, tmpdir_path):
    """A batch touching one key must rewrite only that key's bucket."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=8)
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=2000, n_segments=1, n_urls=200)
    pipe.replay_all(binlog, batch_id=0)
    files_before = {f["path"]: f for f in pipe.table.manifest()["files"]}

    ts = dt.datetime(2025, 1, 1, tzinfo=UTC)
    one = spark.createDataFrame(
        [(10**9, 0, "U", "https://site-0.example.com/page/0", ts, b"<p>hot</p>", "en")],
        CHANGES_SCHEMA,
    )
    pipe.apply_batch(one, batch_id=1)
    m = pipe.table.manifest()
    touched = {
        f["bucket"] for f in m["files"] if f["path"] not in files_before
    }
    assert len(touched) == 1  # only the one affected bucket rewritten


# ------------------------------------------------------------------- ledger


def test_ledger_watermarks_and_metrics(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=3, n_urls=300,
                          n_partitions=4)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    for i in range(3):
        seg = spark.read.parquet(os.path.join(binlog, f"seg={i:05d}"))
        pipe.apply_batch(seg, batch_id=i)

    led = pipe.table.ledger()
    assert led.count() == 3 * 4  # 3 batches × 4 binlog partitions
    # manifest watermark == max lsn seen per partition
    wm = pipe.table.watermarks()
    src = read_binlog(spark, binlog).groupBy("partition").agg(F.max("lsn").alias("m"))
    for r in src.collect():
        assert wm[str(r["partition"])] == r["m"]
    # ledger high-watermark per partition matches too
    agg = led.groupBy("partition").agg(F.max("max_lsn").alias("m")).collect()
    for r in agg:
        assert wm[str(r["partition"])] == r["m"]


# -------------------------------------------------------------- maintenance


def test_compact_and_expire(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=3, n_urls=300)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    for i in range(3):
        seg = spark.read.parquet(os.path.join(binlog, f"seg={i:05d}"))
        pipe.apply_batch(seg, batch_id=i)
    t = pipe.table
    st = _state(t)
    before = len(t.manifest()["files"])
    t.compact_files(target_file_bytes=64 * 1024 * 1024)
    assert _state(t) == st  # compaction preserves state
    removed = t.expire_snapshots(keep_last=1)
    assert removed > 0
    assert _state(t) == st  # expiry never touches the live snapshot
    assert len(t.manifest()["files"]) <= before + 4


def test_expire_rows_ttl(spark, tmpdir_path):
    """Age-based retention (reference: 6-day hourly TTL,
    fintick/bqloader/bqloader.py:9-13): expired rows gone, live rows and
    their LWW lineage untouched, the expiry committed with a ledger row,
    and the pre-expiry snapshot still time-travelable."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    old = dt.datetime(2024, 1, 1, tzinfo=UTC)
    new = dt.datetime(2024, 1, 10, tzinfo=UTC)
    rows = [
        (1, 0, "I", "old_a", old, b"<p>oa</p>", "en"),
        (2, 0, "I", "old_b", old, b"<p>ob</p>", "en"),
        (3, 0, "D", "old_b", old + dt.timedelta(hours=1), None, None),
        (4, 0, "I", "new_a", new, b"<p>na</p>", "en"),
        (5, 1, "I", "new_b", new, b"<p>nb</p>", "en"),
    ]
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=0)
    t = pipe.table
    v_before = t.current_version()
    assert {r.url for r in t.read().collect()} == {"old_a", "new_a", "new_b"}

    cutoff = dt.datetime(2024, 1, 6, tzinfo=UTC)
    summary = t.expire_rows(cutoff)
    # 2 physical old rows: old_a (live) + old_b's tombstone (the
    # superseded insert was already LWW-compacted away at merge time);
    # both settled (wm = min(4,5) = 4 ≥ 3)
    assert summary["n_expired"] == 2
    assert {r.url for r in t.read().collect()} == {"new_a", "new_b"}
    # physical: not even tombstones of the expired range survive
    assert t.read_physical().where(F.col("warc_ts") < F.lit(
        cutoff.replace(tzinfo=None))).count() == 0

    # LWW replay of the live range unchanged: a late update to a live key
    # merges exactly as it would have pre-expiry
    pipe.apply_batch(
        spark.createDataFrame(
            [(6, 0, "U", "new_a", new + dt.timedelta(hours=1), b"<p>na2</p>", "en")],
            CHANGES_SCHEMA,
        ),
        batch_id=1,
    )
    live = {r.url: r.text for r in t.read().collect()}
    assert live == {"new_a": "na2", "new_b": "nb"}

    # ledger records the expiry as maintenance lineage (partition = -1)
    led = t.ledger().where(F.col("partition") == -1).collect()
    assert len(led) == 1 and led[0].n_delete == 2 and led[0].ok

    # snapshot isolation: the pre-expiry version still shows the old rows
    assert {r.url for r in t.read(version=v_before).collect()} == {
        "old_a", "new_a", "new_b"
    }


def test_expire_rows_settled_only_guard(spark, tmpdir_path):
    """A row older than the cutoff whose lsn is ABOVE the applied-LSN
    watermark must survive: delivery on another binlog partition has not
    settled past it, so dropping it could change a future LWW fold."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    old = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        (3, 0, "I", "old_low", old, b"<p>l</p>", "en"),
        (10, 0, "I", "old_high", old, b"<p>h</p>", "en"),
        (5, 1, "I", "other", dt.datetime(2024, 1, 10, tzinfo=UTC), b"<p>o</p>", "en"),
    ]
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=0)
    t = pipe.table
    # watermark = min(partition maxima) = min(10, 5) = 5
    summary = t.expire_rows(dt.datetime(2024, 1, 6, tzinfo=UTC))
    assert summary["n_expired"] == 1  # old_low only; old_high (lsn 10 > 5) stays
    assert {r.url for r in t.read().collect()} == {"old_high", "other"}
    # unconditional mode (the reference's behavior) drops it
    t.expire_rows(dt.datetime(2024, 1, 6, tzinfo=UTC), settled_only=False)
    assert {r.url for r in t.read().collect()} == {"other"}


def test_expire_rows_metadata_only_drop(spark, tmpdir_path):
    """A file wholly past the cutoff leaves the manifest WITHOUT a data
    rewrite (files_dropped > 0, files_rewritten == 0) — the whole-
    partition-drop fast path; physical deletion deferred to
    expire_snapshots."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    old = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        (i, 0, "I", f"u{i}", old + dt.timedelta(minutes=i), b"<p>x</p>", "en")
        for i in range(8)
    ]
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=0)
    t = pipe.table
    n_files = len(t.manifest()["files"])
    summary = t.expire_rows(dt.datetime(2024, 1, 6, tzinfo=UTC))
    assert summary["n_expired"] == 8
    assert summary["files_dropped"] == n_files and summary["files_rewritten"] == 0
    assert t.read().count() == 0
    removed = t.expire_snapshots(keep_last=1)
    assert removed >= n_files


def test_time_travel(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    pipe.apply_batch(
        spark.createDataFrame([(1, 0, "I", "a", ts, b"<p>1</p>", "en")], CHANGES_SCHEMA),
        batch_id=0,
    )
    v1 = pipe.table.current_version()
    pipe.apply_batch(
        spark.createDataFrame(
            [(2, 0, "U", "a", ts + dt.timedelta(hours=1), b"<p>2</p>", "en")],
            CHANGES_SCHEMA,
        ),
        batch_id=1,
    )
    assert pipe.table.read(version=v1).collect()[0].text == "1"
    assert pipe.table.read().collect()[0].text == "2"


def test_bootstrap_deferred_enrich_matches_pre_exchange_placement(
    spark, tmpdir_path, monkeypatch
):
    """The backfill fast path (extraction AFTER the bucket exchange, so
    derived text never crosses it) must be byte-identical to the
    pre-exchange placement — purity of the enrich makes the two plans
    equivalent; this pins it."""
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=2, n_urls=250)

    monkeypatch.setenv("SPARK_CDC_DEFER_ENRICH", "1")
    a = CdcPipeline(spark, os.path.join(tmpdir_path, "ta"), n_buckets=4)
    a.replay_all(binlog)
    monkeypatch.setenv("SPARK_CDC_DEFER_ENRICH", "0")
    b = CdcPipeline(spark, os.path.join(tmpdir_path, "tb"), n_buckets=4)
    b.replay_all(binlog)

    da, db = a.table.read(), b.table.read()
    cols = sorted(da.columns)
    assert da.count() == db.count() > 0
    assert da.select(*cols).exceptAll(db.select(*cols)).count() == 0
    assert db.select(*cols).exceptAll(da.select(*cols)).count() == 0


def test_metrics_feed_records_batches_and_survives_skip(spark, tmpdir_path):
    """Per-batch metrics feed: one JSON doc per applied batch with counts
    and throughput; an exactly-once-skipped re-apply must NOT clobber the
    original record (reference analogue: the Firestore doc counts written
    after each load, /root/reference/fintick/controllers/base.py:258-267)."""
    import json

    from crypto_exchange_etl_spark.streaming.pipeline import read_metrics

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=2000, n_segments=2, n_urls=200)
    mdir = os.path.join(tmpdir_path, "metrics")
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=4, metrics_dir=mdir
    )
    segs = sorted(
        os.path.join(binlog, f) for f in os.listdir(binlog) if f.startswith("seg=")
    )
    for i, seg in enumerate(segs):
        pipe.apply_batch(read_binlog(spark, seg), batch_id=i)

    files = sorted(f for f in os.listdir(mdir) if f.startswith("batch-"))
    assert len(files) == len(segs)
    with open(os.path.join(mdir, files[0])) as fh:
        doc0 = json.load(fh)
    assert doc0["batch_id"] == 0 and not doc0["skipped"]
    assert doc0["n_events"] > 0 and doc0["events_per_sec"] > 0
    orig_recorded_at = doc0["recorded_at_unix"]

    # exactly-once skip: re-apply batch 0 — record must be preserved
    out = pipe.apply_batch(read_binlog(spark, segs[0]), batch_id=0)
    assert out.get("skipped")
    with open(os.path.join(mdir, files[0])) as fh:
        doc0b = json.load(fh)
    assert doc0b["recorded_at_unix"] == orig_recorded_at and not doc0b["skipped"]

    # DataFrame view over the feed
    m = read_metrics(spark, mdir)
    rows = {r.batch_id: r for r in m.collect()}
    assert set(rows) == set(range(len(segs)))
    assert sum(r.n_events for r in rows.values()) == 2000
