"""Lazy partition-spec evolution (Iceberg partition evolution analogue).

``evolve_bucket_spec(n)`` is a METADATA-ONLY commit: future writes hash
the merge key into ``n`` buckets while existing files keep the spec they
were written under, and migrate lazily — a CoW merge rewrites every file
it touches under the current spec, and ``compact_files`` finishes the
migration in one pass. This is the layout-evolution path the eager
:meth:`LakeTable.rebucket` docstring deliberately traded away (one-shot
O(table) rewrite); at 100 TB the metadata-only variant is the only one a
production table can afford on a hot path.

Correctness invariants pinned here:

- evolution commits no data files and rewrites no history;
- merges after evolution produce EXACTLY the same logical table as an
  un-evolved twin replaying the same binlog (file-pruning across specs is
  exact because the batch's keys are hashed under every live spec);
- point lookups stay pruned (per-spec bucket of the probe key);
- merge-on-read minor compaction folds across specs without duplicating
  or losing key versions (intersection-closure of the touched buckets);
- ``compact_files`` migrates every file to the current spec.

Reference: the reference has no layout evolution at all — tables are
recreated by hand (/root/reference/fintick/bqloader/base.py:60-77).
"""

from __future__ import annotations

import os

import pytest

from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.model import PAGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import (
    read_binlog,
    write_binlog_segments,
)


def _segments(spark, path, n_segments=4, n_events=4000, n_urls=250, seed=7):
    write_binlog_segments(
        spark, path, n_events=n_events, n_segments=n_segments, n_urls=n_urls,
        seed=seed,
    )
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.startswith("seg=")
    )


def _mk(spark, base, name, n_buckets=4, write_mode="cow"):
    return LakeTable.create(
        spark, os.path.join(base, name), PAGES_SCHEMA,
        n_buckets=n_buckets, write_mode=write_mode,
    )


def _rows(df):
    return sorted(
        (r["url"], r["warc_ts"], r["text"], r["lang"]) for r in df.collect()
    )


def test_evolve_is_metadata_only(spark, tmp_path):
    segs = _segments(spark, str(tmp_path / "binlog"))
    t = _mk(spark, str(tmp_path), "t", n_buckets=4)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0)
    m_before = t.manifest()

    summary = t.evolve_bucket_spec(16)
    assert summary["operation"] == "evolve_bucket_spec"
    m = t.manifest()
    assert m["version"] == m_before["version"] + 1
    # no data files written, none dropped, none rewritten
    assert sorted(f["path"] for f in m["files"]) == sorted(
        f["path"] for f in m_before["files"]
    )
    assert m["n_buckets"] == 16 and m["current_spec"] == 1
    assert m["bucket_specs"] == {"0": 4, "1": 16}
    # old files still read under their own spec
    assert t.read().count() == t.read(version=m_before["version"]).count()
    # no-op / invalid evolutions
    assert t.evolve_bucket_spec(16).get("skipped") is True
    with pytest.raises(ValueError):
        t.evolve_bucket_spec(0)


def test_merged_state_equals_unevolved_twin(spark, tmp_path):
    """Replay the same binlog into an evolved table and an un-evolved twin;
    the logical tables must be identical (the exactness of cross-spec
    pruning is what this pins: a missed old-spec file would lose LWW
    versions, an over-pruned one would duplicate keys)."""
    segs = _segments(spark, str(tmp_path / "binlog"))
    ev = _mk(spark, str(tmp_path), "ev", n_buckets=4)
    tw = _mk(spark, str(tmp_path), "tw", n_buckets=4)

    for i, seg in enumerate(segs):
        if i == 2:
            ev.evolve_bucket_spec(10)  # non-multiple on purpose
        ev.merge_apply(read_binlog(spark, seg), batch_id=i)
        tw.merge_apply(read_binlog(spark, seg), batch_id=i)

    assert _rows(ev.read()) == _rows(tw.read())
    # lazy migration really happened for touched files only: both specs
    # should still be present in the file list (untouched spec-0 files
    # survive), and every NEW file carries the current spec
    m = ev.manifest()
    specs_present = {f.get("spec", 0) for f in m["files"]}
    assert 1 in specs_present, "post-evolution merges must write spec 1"
    # idempotent re-apply still holds after evolution
    again = ev.merge_apply(read_binlog(spark, segs[-1]), batch_id=len(segs) - 1)
    assert again.get("skipped") is True


def test_merge_prunes_exactly_across_specs(spark, tmp_path):
    """A single-key batch must touch at most one file PER LIVE SPEC (the
    key hashes to exactly one bucket under each spec)."""
    segs = _segments(spark, str(tmp_path / "binlog"))
    t = _mk(spark, str(tmp_path), "t", n_buckets=8)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0)
    t.compact_files()  # one file per occupied bucket, tight layout
    t.evolve_bucket_spec(32)

    seg1 = read_binlog(spark, segs[1])
    url = (
        seg1.join(t.read().select("url"), "url", "left_semi")
        .select("url").limit(1).collect()[0]["url"]
    )
    one = seg1.where(f"url = '{url}'").orderBy("lsn").limit(1)
    assert one.count() == 1
    m_before = t.manifest()
    t.merge_apply(one, batch_id=1)
    m_after = t.manifest()
    before_paths = {f["path"] for f in m_before["files"]}
    after_paths = {f["path"] for f in m_after["files"]}
    rewritten = before_paths - after_paths
    # exactly one spec-0 file held the key; it was rewritten under spec 1
    assert len(rewritten) <= 1
    new_files = [f for f in m_after["files"] if f["path"] not in before_paths]
    assert new_files and all(f.get("spec", 0) == 1 for f in new_files)


def test_lookup_prunes_per_spec(spark, tmp_path):
    segs = _segments(spark, str(tmp_path / "binlog"))
    t = _mk(spark, str(tmp_path), "t", n_buckets=8)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0)
    t.evolve_bucket_spec(16)
    # a tiny batch (3 keys over 8 spec-0 buckets): some spec-0 files stay un-migrated, so the lookups
    # below exercise BOTH specs' pruning paths
    small = read_binlog(spark, segs[1]).orderBy("lsn").limit(3)
    t.merge_apply(small, batch_id=1)

    m = t.manifest()
    live = t.read()
    for r in live.limit(5).collect():
        got = t.lookup(r["url"]).collect()
        assert len(got) == 1 and got[0]["url"] == r["url"]
    # a missing key returns empty (bucket candidates exist but stats prune)
    assert t.lookup("https://nope.invalid/never").count() == 0
    assert {f.get("spec", 0) for f in m["files"]} == {0, 1}


def test_mor_minor_compact_across_specs(spark, tmp_path):
    """MoR deltas written under a NEW spec must fold together with base
    files written under the OLD spec — the intersection-closure is what
    prevents a key's winner being written while its older base version
    survives in an untouched file (silent duplicate)."""
    segs = _segments(spark, str(tmp_path / "binlog"), n_segments=4)
    t = _mk(spark, str(tmp_path), "t", n_buckets=4, write_mode="mor")
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0)
    t.evolve_bucket_spec(8)
    for i, seg in enumerate(segs[1:], start=1):
        t.merge_apply(read_binlog(spark, seg), batch_id=i)

    before = _rows(t.read())
    t.minor_compact(max_deltas=1)  # fold everything foldable
    after_rows = _rows(t.read())
    assert after_rows == before
    # keys are unique post-compaction even with fold=False reads of
    # non-delta files (no silent duplicates across specs)
    m = t.manifest()
    nondelta = [f for f in m["files"] if not f.get("delta")]
    if nondelta:
        df = t.read_physical(fold=True).where("NOT is_deleted")
        assert df.count() == df.select("url").distinct().count()


def test_compact_files_finishes_migration(spark, tmp_path):
    segs = _segments(spark, str(tmp_path / "binlog"))
    t = _mk(spark, str(tmp_path), "t", n_buckets=4)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0)
    t.evolve_bucket_spec(12)
    before = _rows(t.read())
    t.compact_files()
    m = t.manifest()
    assert all(f.get("spec", 0) == m["current_spec"] for f in m["files"])
    assert {f["bucket"] for f in m["files"]} <= set(range(12))
    assert _rows(t.read()) == before


def test_changes_between_across_evolution(spark, tmp_path):
    """The incremental change feed must classify correctly across an
    evolution commit (old version's files under spec 0, new under 1)."""
    segs = _segments(spark, str(tmp_path / "binlog"))
    t = _mk(spark, str(tmp_path), "t", n_buckets=4)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0)
    v0 = t.current_version()
    t.evolve_bucket_spec(8)
    t.merge_apply(read_binlog(spark, segs[1]), batch_id=1)
    v1 = t.current_version()

    ch = t.changes_between(v0, v1)
    # replaying the change feed over the v0 state reproduces v1 state
    kinds = {r["_change_type"] for r in ch.select("_change_type").distinct().collect()}
    assert kinds <= {"insert", "update_preimage", "update_postimage", "delete"}
    old = {r["url"] for r in t.read(version=v0).select("url").collect()}
    new = {r["url"] for r in t.read(version=v1).select("url").collect()}
    ins = {r["url"] for r in ch.where("_change_type = 'insert'").collect()}
    dels = {r["url"] for r in ch.where("_change_type = 'delete'").collect()}
    assert (old | ins) - dels == new
