"""Regressions for the streaming/consumer review findings: fork
ordering, non-empty-earliest bootstraps, retention holes, bucket-spec
pinning of the LSH index, audited-skip metrics."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.consumer import (
    ChangeFeedConsumer,
    ChangeFeedLagError,
)
from crypto_exchange_etl_spark.lake.lsh_index import MaterializedLshIndex
from crypto_exchange_etl_spark.lake.matview import MaterializedAggregate
from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _aged_table(spark, path, n=6):
    """A table whose EARLIEST retained snapshot is non-empty: seed, make
    more commits, then expire history."""
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(n)
    ])
    for b in range(1, 3):
        _apply(spark, pipe, b, [
            (100 + b, 0, "U", f"u{b}", TS + dt.timedelta(days=b),
             b"<p>x</p>", f"l{b}"),
        ])
    t = pipe.table
    t.expire_snapshots(keep_last=2)
    assert t.manifest(t.earliest_version())["files"]  # non-empty earliest
    return pipe


def test_matview_bootstrap_full_on_nonempty_earliest(spark, tmpdir_path):
    """A view created AFTER history expiry must equal the full-read
    oracle — the CDF-only bootstrap silently missed pre-cut rows."""
    pipe = _aged_table(spark, os.path.join(tmpdir_path, "t"))
    view = MaterializedAggregate(
        spark, pipe.table.path, os.path.join(tmpdir_path, "v"),
        group_col="lang", sums={"n_chars": "length(text)"},
    )
    out = view.refresh()
    assert out.get("bootstrapped_full")
    got = {r["lang"]: r["n_rows"] for r in view.read().collect()}
    want = {
        r["lang"]: r["n"]
        for r in pipe.table.read().groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    # and it keeps maintaining incrementally afterwards
    _apply(spark, pipe, 7, [
        (200, 0, "I", "u99", TS + dt.timedelta(days=9), b"<p>n</p>", "xx"),
    ])
    view.refresh()
    assert {r["lang"] for r in view.read().collect()} >= {"xx"}


def test_lsh_bootstrap_full_and_rebucket_pinning(spark, tmpdir_path):
    """(a) index created after expiry covers the whole live corpus;
    (b) a source rebucket must NOT re-address the index's stored
    buckets — incremental stays ≡ rebuild."""
    pipe = _aged_table(spark, os.path.join(tmpdir_path, "t"))
    idx = MaterializedLshIndex(
        spark, pipe.table.path, os.path.join(tmpdir_path, "i"), k=8, bands=4,
    )
    out = idx.refresh()
    assert out.get("bootstrapped_full")

    def band_rows(ix):
        return sorted(
            (r.url, int(r.band), int(r.bh))
            for r in ix.read().collect()
        )

    oracle = MaterializedLshIndex(
        spark, pipe.table.path, os.path.join(tmpdir_path, "o"), k=8, bands=4,
    )
    oracle.rebuild()
    assert band_rows(idx) == band_rows(oracle)

    # rebucket the SOURCE, then update a key: the index must keep using
    # its own pinned layout and stay identical to a fresh rebuild
    pipe.table.rebucket(4)
    _apply(spark, pipe, 8, [
        (300, 0, "U", "u0", TS + dt.timedelta(days=30), b"<p>z</p>", "zz"),
    ])
    idx.refresh()
    oracle.rebuild()
    assert band_rows(idx) == band_rows(oracle)


def test_consumer_refuses_blind_bootstrap(spark, tmpdir_path):
    pipe = _aged_table(spark, os.path.join(tmpdir_path, "t"))
    c = ChangeFeedConsumer(
        spark, pipe.table.path, os.path.join(tmpdir_path, "cur.json")
    )
    with pytest.raises(ChangeFeedLagError, match="non-empty"):
        c.poll()
    # explicit start_version (tail) works
    c2 = ChangeFeedConsumer(
        spark, pipe.table.path, os.path.join(tmpdir_path, "cur2.json"),
        start_version=pipe.table.current_version(),
    )
    assert c2.poll() is None


def test_consumer_lag_error_on_retention_hole(spark, tmpdir_path):
    """A tag-pinned snapshot surviving expiry leaves a hole in the
    retained chain; poll must raise ChangeFeedLagError, not a raw
    FileNotFoundError."""
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(3)
    ])
    t = pipe.table
    v_pin = t.current_version()
    t.create_tag("pin", version=v_pin)
    for b in range(1, 5):
        _apply(spark, pipe, b, [
            (100 + b, 0, "U", f"u{b % 3}", TS + dt.timedelta(days=b),
             b"<p>y</p>", f"l{b}"),
        ])
    t = pipe.table
    t.expire_snapshots(keep_last=2)
    retained = sorted(
        int(f[1:-5]) for f in os.listdir(t.meta_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    assert v_pin in retained and retained != list(
        range(v_pin, retained[-1] + 1)
    )  # a genuine hole above the pin
    c = ChangeFeedConsumer(
        spark, path, os.path.join(tmpdir_path, "cur.json"),
        start_version=v_pin,
    )
    with pytest.raises(ChangeFeedLagError, match="hole"):
        c.poll()


def test_fork_mid_stream_batch_is_not_lost(spark, tmpdir_path):
    """A batch applied between the checkpoint copy and the table clone
    lands in the clone but not the copied checkpoint — the replayed
    batch must hit the carried guard, never be dropped. (The reverse
    order — clone first — silently lost it; review fix.)"""
    from unittest import mock

    binlogdir = os.path.join(tmpdir_path, "binlog")
    from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments

    write_binlog_segments(spark, binlogdir, n_events=1200, n_segments=2,
                          n_urls=100, seed=3)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    ck = os.path.join(tmpdir_path, "ck")
    pipe.run_stream(binlogdir, ck, available_now=True, timeout_secs=300)

    real_clone = LakeTable.clone_to
    applied = {}

    def clone_with_race(table_self, target, version=None):
        # simulate the live stream applying one more batch AFTER the
        # checkpoint copy but BEFORE the clone
        if not applied:
            applied["done"] = True
            _apply(spark, pipe, 999, [
                (10**6, 0, "I", "https://race.example/",
                 TS + dt.timedelta(days=50), b"<p>r</p>", "rr"),
            ])
        return real_clone(pipe.table, target, version)

    with mock.patch.object(LakeTable, "clone_to", clone_with_race):
        fork = pipe.fork(
            os.path.join(tmpdir_path, "t2"), ck,
            os.path.join(tmpdir_path, "ck2"),
        )
    # the raced batch is IN the fork (clone taken after it)
    assert fork.table.read().where("url = 'https://race.example/'").count() == 1
    # resuming the fork replays nothing destructive and converges with
    # the primary on the same feed
    fork.run_stream(binlogdir, os.path.join(tmpdir_path, "ck2"),
                    available_now=True, timeout_secs=300)
    a = pipe.table.read().count()
    b = fork.table.read().count()
    assert a == b


def test_audited_skip_still_lands_metrics(spark, tmpdir_path):
    mdir = os.path.join(tmpdir_path, "metrics")
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=2,
        audit=lambda df, s: True, metrics_dir=mdir,
    )
    _apply(spark, pipe, 0, [
        (1, 0, "I", "u0", TS, b"<p>0</p>", "en"),
    ])
    f = os.path.join(mdir, "batch-000000000000.json")
    assert os.path.exists(f)
    os.remove(f)  # simulate the crash that lost the original record
    _apply(spark, pipe, 0, [
        (1, 0, "I", "u0", TS, b"<p>0</p>", "en"),
    ])  # exactly-once replay: skipped, but the record is restored
    with open(f) as fh:
        doc = json.load(fh)
    assert doc["skipped"] is True and doc["batch_id"] == 0


def test_expire_snapshots_by_age(spark, tmpdir_path):
    """Iceberg's age form: snapshots younger than the cutoff survive
    regardless of keep_last; older ones expire."""
    import time as _time
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    for b in range(4):
        _apply(spark, pipe, b, [
            (10 + b, 0, "I" if b == 0 else "U", "u0",
             TS + dt.timedelta(days=b), b"<p>x</p>", f"l{b}"),
        ])
    t = pipe.table
    vs = sorted(
        int(f[1:-5]) for f in os.listdir(t.meta_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    # cutoff in the past: nothing is old enough — everything survives
    t.expire_snapshots(keep_last=1, older_than=_time.time() - 3600)
    vs_after = sorted(
        int(f[1:-5]) for f in os.listdir(t.meta_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    assert vs_after == vs
    # cutoff in the future: age no longer protects; count floor applies
    t.expire_snapshots(keep_last=2, older_than=_time.time() + 3600)
    vs_final = sorted(
        int(f[1:-5]) for f in os.listdir(t.meta_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    assert vs_final == vs[-2:]
    assert t.read().count() == 1  # state intact


def test_lake_format_digit_named_ref_resolves_as_ref(spark, tmpdir_path):
    """A tag/branch named like '123' must reach that ref through the lake
    format, mirroring LakeTable.manifest's resolution order — not be
    int-coerced into (a different) snapshot version 123."""
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [(1, 0, "I", "u1", TS, b"<p>a</p>", "en")])
    t = pipe.table
    v1 = t.current_version()
    t.create_tag("3", version=v1)  # digit-only name, legal ref
    _apply(spark, pipe, 1, [
        (2, 0, "U", "u1", TS + dt.timedelta(days=1), b"<p>b</p>", "de"),
    ])
    _apply(spark, pipe, 2, [
        (3, 0, "I", "u2", TS + dt.timedelta(days=2), b"<p>c</p>", "en"),
    ])
    assert t.current_version() >= 3  # version 3 exists — the trap is armed
    got = {
        (r.url, r.lang)
        for r in spark.read.format("lake")
        .option("path", path)
        .option("versionAsOf", "3")
        .load()
        .collect()
    }
    assert got == {("u1", "en")}  # the tag's snapshot, not version 3's


def test_lake_format_snapshot_pinned_across_schema_and_scan(spark, tmpdir_path):
    """schema() and reader() must read the SAME snapshot even when a
    commit (here: a rename + a data commit) lands between the two calls —
    snapshot isolation within one query."""
    from crypto_exchange_etl_spark.lake.batch_source import LakeDataSource

    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [(1, 0, "I", "u1", TS, b"<p>a</p>", "en")])
    t = pipe.table
    v_before = t.current_version()

    ds = LakeDataSource(options={"path": path})
    sch = ds.schema()
    assert "lang" in sch.fieldNames()
    # the race: a rename and new data land after schema() resolved
    t.rename_column("lang", "language")
    _apply(spark, pipe, 1, [
        (2, 0, "U", "u1", TS + dt.timedelta(days=1), b"<p>b</p>", "de"),
    ])
    r = ds.reader(sch)
    assert r.version == v_before  # scan pinned to the schema's snapshot
