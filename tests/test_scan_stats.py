"""Manifest column statistics + planning-time file pruning (scan()).

Iceberg-model file skipping: the merge records per-file min/max of
(key, warc_ts, lsn) in the manifest at write time, so time-range scans,
point lookups, and retention classify files WITHOUT opening footers.
Correctness first: every scan must equal read().where(range) exactly,
including under merge-on-read where the LWW fold must not lose
superseding rows to pruning.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.sources.binlog import (
    generate_changes,
    read_binlog,
    write_binlog_segments,
)
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

TS = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731


def _mk_cow(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=4000, n_segments=2, n_urls=300, seed=11)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=8)
    pipe.replay_all(binlog)
    return pipe.table


def _mk_mor_time_sliced(spark, tmpdir_path, n_events=6000, n_batches=3):
    """MOR table built from time-local micro-batches (lsn slices — the
    generator's event time advances with lsn)."""
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "pages_mor"), n_buckets=4, write_mode="mor",
        max_deltas=1000,  # keep every delta file (no minor compaction)
    )
    pipe.ensure_table()
    step = n_events // n_batches
    for i in range(n_batches):
        changes = generate_changes(
            spark, min((i + 1) * step, n_events), n_urls=400, seed=11,
            lsn_from=i * step,
        )
        pipe.apply_batch(changes, batch_id=i)
    return pipe.table


def test_merge_records_manifest_stats(spark, tmpdir_path):
    table = _mk_cow(spark, tmpdir_path)
    files = table.manifest()["files"]
    assert files
    for f in files:
        assert f["rows"] > 0
        st = f["stats"]
        assert set(st) >= {"url", "warc_ts", "lsn"}
        assert st["warc_ts"][0] <= st["warc_ts"][1]
        assert st["lsn"][0] <= st["lsn"][1]
        assert st["url"][0] <= st["url"][1]


def test_scan_equals_filtered_read_cow(spark, tmpdir_path):
    table = _mk_cow(spark, tmpdir_path)
    lo, hi = TS("2024-01-01 00:20:00"), TS("2024-01-01 00:45:00")
    got = table.scan(lo, hi).orderBy("url").collect()
    want = (
        table.read()
        .where((F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") < F.lit(hi)))
        .orderBy("url")
        .collect()
    )
    assert got == want
    # open-ended ranges too
    assert table.scan(ts_from=lo).count() == table.read().where(
        F.col("warc_ts") >= F.lit(lo)
    ).count()
    assert table.scan(ts_to=hi).count() == table.read().where(
        F.col("warc_ts") < F.lit(hi)
    ).count()


def test_scan_equals_filtered_read_mor(spark, tmpdir_path):
    table = _mk_mor_time_sliced(spark, tmpdir_path)
    for lo, hi in [
        (TS("2024-01-01 00:40:00"), None),          # tail scan
        (TS("2024-01-01 00:10:00"), TS("2024-01-01 01:00:00")),
        (None, TS("2024-01-01 00:30:00")),          # head scan
    ]:
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col("warc_ts") >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col("warc_ts") < F.lit(hi))
        got = table.scan(lo, hi).orderBy("url").collect()
        want = table.read().where(pred).orderBy("url").collect()
        assert got == want, (lo, hi)


def test_tail_scan_prunes_old_delta_files(spark, tmpdir_path):
    table = _mk_mor_time_sliced(spark, tmpdir_path)
    # a tail scan starting inside the LAST batch's time range must skip
    # the earlier batches' delta files at planning time
    plan = table.scan_file_plan(ts_from=TS("2024-01-01 01:20:00"))
    assert plan["n_chosen"] < plan["n_candidates"]
    # and an impossible future range chooses nothing
    empty = table.scan_file_plan(ts_from=TS("2030-01-01 00:00:00"))
    assert empty["n_chosen"] == 0
    assert table.scan(ts_from=TS("2030-01-01 00:00:00")).count() == 0


def test_tail_scan_does_not_resurrect_superseded_rows(spark, tmpdir_path):
    """A key updated ACROSS the pruning boundary: its old version lives in
    a pruned file, its superseding version in a chosen file — the scan
    must show only the winner; and a key whose winner is OLD must not
    appear in a tail scan at all."""
    table = _mk_mor_time_sliced(spark, tmpdir_path)
    lo = TS("2024-01-01 01:20:00")
    got = {r["url"]: r for r in table.scan(ts_from=lo).collect()}
    want = {
        r["url"]: r
        for r in table.read().where(F.col("warc_ts") >= F.lit(lo)).collect()
    }
    assert got == want
    # sanity: the full fold agrees key-by-key (no stale versions leaked)
    full = {r["url"]: r["warc_ts"] for r in table.read().collect()}
    for url, row in got.items():
        assert full[url] == row["warc_ts"]


def test_lookup_uses_manifest_stats(spark, tmpdir_path):
    table = _mk_cow(spark, tmpdir_path)
    some = table.read().select("url").orderBy("url").limit(3).collect()
    for r in some:
        got = table.lookup(r["url"]).collect()
        want = table.read().where(F.col("url") == r["url"]).collect()
        assert got == want
    assert table.lookup("https://nowhere.example.com/x").count() == 0


def test_expire_rows_metadata_only_from_manifest_stats(spark, tmpdir_path):
    """With time-sliced MOR deltas, a cutoff beyond an early batch drops
    its fully-expired files without reading them, using manifest stats."""
    table = _mk_mor_time_sliced(spark, tmpdir_path)
    # batch 0 spans lsn 0..1999 ⇒ event time up to ~00:33:19; a 00:35
    # cutoff makes its delta files fully-expired (metadata-only drop)
    cutoff = TS("2024-01-01 00:35:00")
    live_after = table.read().where(F.col("warc_ts") >= F.lit(cutoff)).count()
    out = table.expire_rows(cutoff)
    assert out["n_expired"] > 0
    assert out["files_dropped"] > 0  # metadata-only classification fired
    assert table.read().count() == live_after


def test_rewrite_clustered_enables_intra_bucket_pruning(spark, tmpdir_path):
    # wide key space so each bucket holds enough rows to roll files
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(
        spark, binlog, n_events=6000, n_segments=2, n_urls=4000, seed=11
    )
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=8)
    pipe.replay_all(binlog)
    table = pipe.table
    before = table.read().orderBy("url").collect()
    # a tail range: after clustering only each bucket's LAST rolled file
    # overlaps it (a mid-range straddles the roll boundary in every bucket)
    lo, hi = TS("2024-01-01 01:25:00"), None

    # key-sorted CoW buckets: every file spans ~the full time range, so a
    # narrow range prunes nothing
    plan0 = table.scan_file_plan(lo, hi)
    assert plan0["n_chosen"] == plan0["n_candidates"]

    out = table.rewrite_clustered(by="warc_ts", max_rows_per_file=200)
    assert out["files_after"] > plan0["n_candidates"]  # files rolled

    # state identical, scan still exact
    assert table.read().orderBy("url").collect() == before
    got = table.scan(lo, hi).orderBy("url").collect()
    want = (
        table.read()
        .where(F.col("warc_ts") >= F.lit(lo))
        .orderBy("url")
        .collect()
    )
    assert got == want

    # and now the same narrow range prunes within buckets
    plan1 = table.scan_file_plan(lo, hi)
    assert plan1["n_chosen"] < plan1["n_candidates"]

    # lookup pays the documented trade-off but stays correct
    some = table.read().select("url").limit(2).collect()
    for r in some:
        assert table.lookup(r["url"]).count() == 1


def test_history_lists_operations(spark, tmpdir_path):
    table = _mk_mor_time_sliced(spark, tmpdir_path, n_events=3000, n_batches=2)
    table.rewrite_clustered(max_rows_per_file=500)
    h = table.history()
    assert [r["version"] for r in h] == list(range(len(h)))
    ops = [r["operation"] for r in h]
    assert ops[0] == "create"
    assert ops.count("merge") == 2
    assert ops[-1] == "rewrite_clustered"
    assert all(r["committed_at_unix"] is not None for r in h)


def test_stats_total_rows_from_manifest(spark, tmpdir_path):
    table = _mk_cow(spark, tmpdir_path)
    st = table.stats(read_footers=True)
    # physical rows = live + tombstones
    assert st["total_rows"] == table.read_physical().count()


def test_scan_fuzz_random_ranges(spark, tmpdir_path):
    """Seeded sweep of random time ranges over a MOR table (the pruning
    rules' hardest case): every scan must equal the filtered full read."""
    import random

    table = _mk_mor_time_sliced(spark, tmpdir_path)
    base = TS("2024-01-01 00:00:00")
    rng = random.Random(1234)
    full = table.read().cache()
    try:
        for _ in range(10):
            a = base + dt.timedelta(seconds=rng.randint(-7200, 7200))
            b = base + dt.timedelta(seconds=rng.randint(-7200, 7200))
            lo, hi = (a, b) if a <= b else (b, a)
            if rng.random() < 0.25:
                lo = None
            if rng.random() < 0.25:
                hi = None
            pred = F.lit(True)
            if lo is not None:
                pred = pred & (F.col("warc_ts") >= F.lit(lo))
            if hi is not None:
                pred = pred & (F.col("warc_ts") < F.lit(hi))
            got = sorted(map(tuple, table.scan(lo, hi).collect()))
            want = sorted(map(tuple, full.where(pred).collect()))
            assert got == want, (lo, hi)
    finally:
        full.unpersist()


def test_zorder_rewrite_prunes_both_dimensions(spark, tmpdir_path):
    """Z-order clustering: after a Morton rewrite over (url, warc_ts),
    BOTH a narrow time-range scan and a point lookup prune files within
    a bucket — vs plain time clustering, where lookups read the whole
    bucket. State stays byte-identical and every read stays exact."""
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(
        spark, binlog, n_events=20000, n_segments=2, n_urls=12000, seed=13
    )
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=2)
    pipe.replay_all(binlog)
    table = pipe.table
    before = table.read().orderBy("url").collect()

    # z-order pruning power ~ sqrt(files/bucket): roll small files so each
    # covers a small Morton rectangle of the key×time space
    out = table.rewrite_clustered(
        by=["url", "warc_ts"], zorder=True, max_rows_per_file=100
    )
    assert out["zorder"] and out["cluster_by"] == "url+warc_ts"
    m = table.manifest()
    n_files = len(m["files"])
    assert out["files_after"] == n_files > 40
    # every z-ordered file carries hash bounds
    assert all("__key_hash__" in (f.get("stats") or {}) for f in m["files"])

    # state identity
    assert table.read().orderBy("url").collect() == before

    # time dimension: a narrow tail range prunes within buckets and the
    # scan stays exact
    lo = TS("2024-01-01 05:10:00")  # last ~7% of the 5.5h event span
    plan = table.scan_file_plan(lo, None)
    assert plan["n_chosen"] < plan["n_candidates"]
    got = table.scan(lo, None).orderBy("url").collect()
    want = (
        table.read().where(F.col("warc_ts") >= F.lit(lo)).orderBy("url").collect()
    )
    assert got == want

    # key dimension: lookups open strictly fewer files than the bucket
    # holds (plain time clustering reads them all), and stay correct
    per_bucket = {}
    for f in m["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    urls = [r["url"] for r in table.read().select("url").limit(8).collect()]
    pruned_any = False
    for u in urls:
        df = table.lookup(u)
        rows = df.collect()
        assert [r["url"] for r in rows] == [u]
        opened = len(df.inputFiles())
        assert opened <= max(per_bucket.values())
        if opened < min(per_bucket.values()):
            pruned_any = True
    assert pruned_any

    # a later merge into the z-ordered table keeps working (new files
    # simply lack hash bounds and are never hash-pruned)
    extra = generate_changes(spark, 500, n_urls=5000, seed=99)
    pipe.apply_batch(extra, batch_id=77)
    u = extra.where(F.col("op") != "D").select("url").first()["url"]
    assert (
        table.lookup(u).count()
        == table.read().where(F.col("url") == u).count()
    )


def test_zorder_rejects_bad_specs(spark, tmpdir_path):
    table = _mk_cow(spark, tmpdir_path)
    import pytest

    with pytest.raises(ValueError):
        table.rewrite_clustered(by=["warc_ts"], zorder=True)
    with pytest.raises(ValueError):
        table.rewrite_clustered(by=["url", "nope"], zorder=True)
    with pytest.raises(ValueError):
        table.rewrite_clustered(by=["a", "b", "c", "d", "e"], zorder=True)
