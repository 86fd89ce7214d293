"""Snapshot rollback, change-data-feed reads, and point-lookup file
skipping — the lake-table maintenance/consumption surface beyond MERGE.

Strategy: apply a deterministic multi-batch change sequence, then assert

- ``changes_between`` per-commit classification equals a brute-force diff
  of adjacent snapshot reads (the oracle is the time-travel read itself);
- the CDF scan touches only files of buckets changed at the audited
  commits (``inputFiles`` ⊆ changed-bucket files — manifest pruning);
- ``rollback`` restores state O(1) and reverts the exactly-once guard;
- ``lookup`` equals ``read().where(key=…)`` while opening strictly fewer
  files than the full table holds.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc


def _build(spark, path, n_batches=3, events_per_batch=1200, n_urls=150,
           write_mode="cow"):
    pipe = CdcPipeline(spark, path, n_buckets=8, write_mode=write_mode)
    df = generate_changes(
        spark, n_batches * events_per_batch, n_urls=n_urls, seed=11
    ).cache()
    for b in range(n_batches):
        lo, hi = b * events_per_batch, (b + 1) * events_per_batch
        batch = df.where((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        pipe.apply_batch(batch, batch_id=b)
    df.unpersist()
    return pipe.table


def _live_state(table: LakeTable, version: int) -> dict:
    """key -> (lsn, text) of live rows at a version."""
    rows = (
        table.read_physical(version=version)
        .where(~F.col("is_deleted"))
        .select("url", "lsn", "text")
        .collect()
    )
    return {r.url: (r.lsn, r.text) for r in rows}


def _expected_changes(table: LakeTable, v: int) -> set:
    old, new = _live_state(table, v - 1), _live_state(table, v)
    exp = set()
    for k in new.keys() - old.keys():
        exp.add((k, "insert", v, new[k][0]))
    for k in old.keys() - new.keys():
        exp.add((k, "delete", v, old[k][0]))
    for k in old.keys() & new.keys():
        if old[k][0] != new[k][0]:
            exp.add((k, "update_preimage", v, old[k][0]))
            exp.add((k, "update_postimage", v, new[k][0]))
    return exp


def _got_changes(cdf_rows) -> set:
    # lsn is not part of the public CDF payload; re-key on (url, type,
    # commit) and carry text for the value assertion separately.
    return {(r.url, r._change_type, r._commit_version) for r in cdf_rows}


# ----------------------------------------------------------------- CDF


def test_changes_between_matches_snapshot_diff(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    cur = table.current_version()
    assert cur >= 3
    cdf = table.changes_between(0, cur).collect()
    got = {(r.url, r._change_type, r._commit_version) for r in cdf}
    exp = set()
    for v in range(1, cur + 1):
        exp |= {(k, t, vv) for (k, t, vv, _lsn) in _expected_changes(table, v)}
    assert got == exp
    # images carry the right payload: postimage text equals the new
    # snapshot's text, preimage the old one's
    texts_new = {v: _live_state(table, v) for v in range(0, cur + 1)}
    for r in cdf:
        if r._change_type in ("insert", "update_postimage"):
            assert r.text == texts_new[r._commit_version][r.url][1]
        elif r._change_type == "update_preimage":
            assert r.text == texts_new[r._commit_version - 1][r.url][1]


def test_changes_between_subrange_and_empty(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    cur = table.current_version()
    # (v, v] is empty with the CDF schema intact
    empty = table.changes_between(cur, cur)
    assert empty.count() == 0
    assert "_change_type" in empty.columns and "_commit_version" in empty.columns
    # per-commit slices union to the full range
    full = _got_changes(table.changes_between(0, cur).collect())
    stitched = set()
    for v in range(cur):
        stitched |= _got_changes(table.changes_between(v, v + 1).collect())
    assert stitched == full


def test_changes_between_prunes_untouched_buckets(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    cur = table.current_version()
    # audit the LAST commit only: the scan must read only files whose
    # bucket changed at that commit (from either adjacent version)
    m_new, m_old = table.manifest(cur), table.manifest(cur - 1)
    old_paths = {f["path"] for f in m_old["files"]}
    new_paths = {f["path"] for f in m_new["files"]}
    changed_buckets = {
        f["bucket"] for f in m_old["files"] if f["path"] not in new_paths
    } | {f["bucket"] for f in m_new["files"] if f["path"] not in old_paths}
    allowed = {
        os.path.join(table.path, f["path"])
        for mm in (m_old, m_new)
        for f in mm["files"]
        if f["bucket"] in changed_buckets
    }
    read = set(table.changes_between(cur - 1, cur).inputFiles())
    read = {p.removeprefix("file://") for p in read}
    assert read, "CDF read no files"
    assert read <= allowed


def test_changes_between_mor(spark, tmpdir_path):
    """Merge-on-read commits (delta appends + minor compactions) produce
    the same CDF classification as the snapshot diff."""
    table = _build(spark, os.path.join(tmpdir_path, "t"), write_mode="mor")
    cur = table.current_version()
    got = _got_changes(table.changes_between(0, cur).collect())
    exp = set()
    for v in range(1, cur + 1):
        exp |= {(k, t, vv) for (k, t, vv, _l) in _expected_changes(table, v)}
    assert got == exp
    # a minor compaction rewrites files but changes no live row: the CDF
    # for that commit must be empty (lsn-based change detection, not
    # file-identity)
    table.minor_compact(max_deltas=1)
    v2 = table.current_version()
    assert v2 > cur
    assert table.changes_between(cur, v2).count() == 0


def test_changes_between_rejects_bad_range(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"), n_batches=1)
    cur = table.current_version()
    for frm, to in ((-1, cur), (0, cur + 5), (2, 1)):
        try:
            table.changes_between(frm, to)
            raise AssertionError(f"range ({frm},{to}] accepted")
        except ValueError:
            pass


# ------------------------------------------------------------- rollback


def test_rollback_restores_state_and_replay(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    table = _build(spark, path)
    cur = table.current_version()
    target = 1  # after batch 0
    want = sorted(_live_state(table, target).items())
    summary = table.rollback(target)
    assert summary["operation"] == "rollback"
    table = LakeTable.load(spark, path)
    assert table.current_version() == cur + 1
    assert sorted(_live_state(table, table.current_version()).items()) == want
    # exactly-once guard reverted: batches 1+ re-apply (not skipped)
    assert table.applied_batches() == {0}
    pipe = CdcPipeline(spark, path, n_buckets=8)
    df = generate_changes(spark, 3 * 1200, n_urls=150, seed=11)
    out = pipe.apply_batch(
        df.where((F.col("lsn") >= 1200) & (F.col("lsn") < 2400)), batch_id=1
    )
    assert not out.get("skipped")
    # history preserved across the rollback commit (time travel intact)
    assert _live_state(table, cur)  # still readable


def test_rollback_then_replay_converges(spark, tmpdir_path):
    """rollback(v) + re-applying the lost batches reproduces the original
    final state byte-for-byte (lsn set identical)."""
    path = os.path.join(tmpdir_path, "t")
    table = _build(spark, path)
    final = sorted(_live_state(table, table.current_version()).items())
    table.rollback(1)
    pipe = CdcPipeline(spark, path, n_buckets=8)
    df = generate_changes(spark, 3 * 1200, n_urls=150, seed=11)
    for b in (1, 2):
        lo, hi = b * 1200, (b + 1) * 1200
        pipe.apply_batch(
            df.where((F.col("lsn") >= lo) & (F.col("lsn") < hi)), batch_id=b
        )
    table = LakeTable.load(spark, path)
    assert sorted(_live_state(table, table.current_version()).items()) == final


# ---------------------------------------------------------- point lookup


def test_lookup_matches_filtered_read(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    live = table.read().select("url").limit(20).collect()
    assert live
    for r in live[:5]:
        got = table.lookup(r.url).collect()
        want = table.read().where(F.col("url") == r.url).collect()
        assert len(got) == len(want) == 1
        assert sorted(got[0].asDict().items()) == sorted(want[0].asDict().items())


def test_lookup_missing_and_deleted(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    assert table.lookup("https://nonexistent.example/none").count() == 0
    # a tombstoned key returns empty
    dead = (
        table.read_physical()
        .where(F.col("is_deleted"))
        .select("url")
        .limit(1)
        .collect()
    )
    if dead:
        assert table.lookup(dead[0].url).count() == 0


def test_lookup_skips_files(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    m = table.manifest()
    total = len(m["files"])
    url = table.read().select("url").first().url
    df = table.lookup(url)
    opened = {p.removeprefix("file://") for p in df.inputFiles()}
    # bucket pruning alone caps candidates at the key's bucket
    b = int(
        spark.createDataFrame([(url,)], "url string")
        .select(table.bucket_expr("url").alias("b"))
        .first()["b"]
    )
    bucket_files = [f for f in m["files"] if f["bucket"] == b]
    assert len(opened) <= len(bucket_files) < total
    assert df.count() == 1


# ---------------------------------------------------- rebucket + stats


def test_rebucket_preserves_state_and_serves_merges(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    table = _build(spark, path, n_batches=2)
    before = sorted(_live_state(table, table.current_version()).items())
    summary = table.rebucket(16)
    assert summary["n_buckets"] == 16 and summary["n_buckets_before"] == 8
    table = LakeTable.load(spark, path)
    assert table.n_buckets == 16
    assert {f["bucket"] for f in table.manifest()["files"]} <= set(range(16))
    assert sorted(_live_state(table, table.current_version()).items()) == before
    # merges keep working against the new layout (batch 2 of the same feed)
    pipe = CdcPipeline(spark, path, n_buckets=16)
    df = generate_changes(spark, 3 * 1200, n_urls=150, seed=11)
    pipe.apply_batch(
        df.where((F.col("lsn") >= 2400) & (F.col("lsn") < 3600)), batch_id=2
    )
    # final state == a never-rebucketed table fed the same three batches
    ref = _build(spark, os.path.join(tmpdir_path, "ref"), n_batches=3)
    got = sorted(_live_state(pipe.table, pipe.table.current_version()).items())
    want = sorted(_live_state(ref, ref.current_version()).items())
    assert got == want
    # lookup's bucket hash follows the new layout
    url = pipe.table.read().select("url").first().url
    assert pipe.table.lookup(url).count() == 1
    # rebucket to the same count is a metadata no-op
    assert pipe.table.rebucket(16).get("skipped")


def test_rebucket_folds_mor_deltas(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"), write_mode="mor")
    assert any(f.get("delta") for f in table.manifest()["files"])
    before = sorted(_live_state(table, table.current_version()).items())
    table.rebucket(4)
    m = table.manifest()
    assert not any(f.get("delta") for f in m["files"])  # major-compacted
    assert sorted(_live_state(table, table.current_version()).items()) == before


def test_stats_metadata_only(spark, tmpdir_path):
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    s = table.stats(read_footers=True)
    m = table.manifest()
    assert s["version"] == m["version"]
    assert s["total_files"] == len(m["files"])
    assert s["total_bytes"] == sum(f["bytes"] for f in m["files"])
    assert s["bucket_skew"] >= 1.0
    assert s["applied_batches"] == len(m["applied_batches"])
    # footer row count equals the physical row count (incl. tombstones)
    assert s["total_rows"] == table.read_physical(fold=False).count()


def test_changes_between_across_rollback(spark, tmpdir_path):
    """A rollback commit appears in the change feed as the state REVERT
    (deletes/inserts/updates undoing the rolled-back commits) — consumers
    downstream of the feed converge to the restored state instead of
    diverging silently."""
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    cur = table.current_version()
    target = 1
    table.rollback(target)
    v_rb = table.current_version()
    got = _got_changes(table.changes_between(cur, v_rb).collect())
    # expected: diff of live states cur -> target (what the revert did)
    old, new = _live_state(table, cur), _live_state(table, target)
    exp = set()
    for k in new.keys() - old.keys():
        exp.add((k, "insert", v_rb))
    for k in old.keys() - new.keys():
        exp.add((k, "delete", v_rb))
    for k in old.keys() & new.keys():
        if old[k][0] != new[k][0]:
            exp.add((k, "update_preimage", v_rb))
            exp.add((k, "update_postimage", v_rb))
    assert got == exp


def test_remove_orphans(spark, tmpdir_path):
    """Age-gated orphan GC: unreferenced files older than the threshold
    are deleted, recent ones and staged (WAP) snapshots survive, every
    retained version stays readable, and dry_run touches nothing."""
    table = _build(spark, os.path.join(tmpdir_path, "t"))
    states = {
        v: sorted(_live_state(table, v).items())
        for v in range(table.current_version() + 1)
    }

    # plant orphans: a crashed write (plain parquet under data/) and an
    # optimistic-concurrency loser shape (file in an existing bucket dir)
    crash_dir = os.path.join(table.path, "data", "merge-deadbeef", "bucket=0")
    os.makedirs(crash_dir)
    orphan_a = os.path.join(crash_dir, "part-crash.parquet")
    bucket_dirs = [
        os.path.join(r, d)
        for r, ds, _f in os.walk(os.path.join(table.path, "data"))
        for d in ds if d.startswith("bucket=")
    ]
    orphan_b = os.path.join(bucket_dirs[0], "part-loser.parquet")
    for p in (orphan_a, orphan_b):
        with open(p, "wb") as fh:
            fh.write(b"PAR1 not really parquet PAR1")

    # a staged WAP snapshot's files are unreferenced by the version chain
    # but must survive orphan GC at any age
    changes = generate_changes(spark, 300, n_urls=60, seed=77)
    out = table.merge_apply(changes, batch_id=99, publish=False)
    staged_files = {
        f["path"] for f in table.manifest(out["staged_token"])["files"]
    }
    old = 0.0  # epoch — older than any threshold
    for rel in staged_files:
        os.utime(os.path.join(table.path, rel), (old, old))

    # young orphans are skipped (in-flight-commit safety)...
    rep = table.remove_orphans(older_than_secs=3600)
    assert rep["removed"] == 0 and rep["skipped_recent"] == 2
    # ...then age them and dry-run: reported but not deleted
    for p in (orphan_a, orphan_b):
        os.utime(p, (old, old))
    rep = table.remove_orphans(older_than_secs=3600, dry_run=True)
    assert rep["removed"] == 2 and all(
        os.path.exists(p) for p in (orphan_a, orphan_b)
    )
    # real run deletes exactly the two orphans, never the staged files
    rep = table.remove_orphans(older_than_secs=3600)
    assert rep["removed"] == 2 and not any(
        os.path.exists(p) for p in (orphan_a, orphan_b)
    )
    assert all(
        os.path.exists(os.path.join(table.path, rel)) for rel in staged_files
    )

    # every retained version still reads back byte-identically, and the
    # staged snapshot still publishes
    for v, want in states.items():
        assert sorted(_live_state(table, v).items()) == want
    table.publish(out["staged_token"])
    assert table.manifest()["summary"]["operation"] == "merge"


def test_version_as_of_timestamp_travel(spark, tmpdir_path):
    """Timestamp time travel resolves the latest commit at-or-before ts,
    in every accepted form (float, naive-UTC datetime, aware datetime),
    respects snapshot expiry, and read_as_of equals read(version)."""
    table = _build(spark, os.path.join(tmpdir_path, "pages"), n_batches=3)
    hist = table.history()
    assert len(hist) >= 3
    # at / just-before every commit stamp: latest version whose stamp <= ts
    def expect(cutoff):
        vs = [h["version"] for h in hist if h["committed_at_unix"] <= cutoff]
        return max(vs) if vs else None

    for h in hist:
        for cutoff in (h["committed_at_unix"], h["committed_at_unix"] - 1e-4):
            want_v = expect(cutoff)
            if want_v is None:
                continue
            assert table.version_as_of(cutoff) == want_v
    # far future -> current; datetime forms agree with the float form
    last = hist[-1]
    assert table.version_as_of(last["committed_at_unix"] + 10) == last["version"]
    ts = dt.datetime.fromtimestamp(last["committed_at_unix"] + 1, tz=UTC)
    assert table.version_as_of(ts) == last["version"]
    naive = ts.astimezone(UTC).replace(tzinfo=None)
    assert table.version_as_of(naive) == last["version"]

    # read_as_of ≡ read(version) at an intermediate commit
    mid = hist[1]
    want = sorted(
        table.read(version=mid["version"]).select("url", "text").collect()
    )
    got = sorted(
        table.read_as_of(mid["committed_at_unix"]).select("url", "text").collect()
    )
    assert got == want

    # before the first retained commit -> error; expiry narrows the window
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        table.version_as_of(hist[0]["committed_at_unix"] - 5)
    table.expire_snapshots(keep_last=1)
    with _pytest.raises(FileNotFoundError):
        table.version_as_of(hist[0]["committed_at_unix"])
