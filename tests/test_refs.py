"""Named snapshot refs: tags (immutable pins) and branches (staged chains).

Iceberg-style refs over the manifest chain: a tag pins a committed
version against snapshot expiry ("the snapshot this eval set was built
from"); a branch is a mutable head over a chain of staged snapshots that
``fast_forward`` publishes onto main — write-audit-publish generalized
from one staged snapshot to many. The reference has no snapshot model at
all (BigQuery WRITE_TRUNCATE clobbers partitions in place,
/root/reference/fintick/bqloader/base.py:79-112); refs are part of what
the lake format adds over it.
"""

from __future__ import annotations

import os

import pytest

from crypto_exchange_etl_spark.functions.extract import with_extracted_text
from crypto_exchange_etl_spark.lake.table import CommitConflictError, LakeTable
from crypto_exchange_etl_spark.model import PAGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import (
    read_binlog,
    write_binlog_segments,
)


def _segments(spark, path, n_segments=3, n_events=3000, n_urls=300):
    write_binlog_segments(
        spark, path, n_events=n_events, n_segments=n_segments, n_urls=n_urls, seed=11
    )
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.startswith("seg=")
    )


def _mk_table(spark, tmpdir_path, name="pages", n_buckets=4):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, name), PAGES_SCHEMA, n_buckets=n_buckets
    )


def _state(df):
    return {
        (r.url, str(r.warc_ts), r.text)
        for r in df.select("url", "warc_ts", "text").collect()
    }


def test_tag_pins_snapshot_through_expiry(spark, tmpdir_path):
    segs = _segments(spark, os.path.join(tmpdir_path, "binlog"))
    t = _mk_table(spark, tmpdir_path)
    for i, seg in enumerate(segs):
        t.merge_apply(read_binlog(spark, seg), batch_id=i, enrich=with_extracted_text)
    v_mid = t.current_version() - 1
    ref = t.create_tag("eval-corpus", version=v_mid, message="eval pin")
    assert ref["version"] == v_mid
    pinned = _state(t.read(version=v_mid))

    # resolution: read at the tag name ≡ read at the pinned version
    assert _state(t.read("eval-corpus")) == pinned

    # expiry keeps ONLY head + tagged version; the tag stays readable
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.manifest(v_mid - 1)
    assert _state(t.read("eval-corpus")) == pinned

    # rollback accepts the tag name and restores the pinned state
    t.rollback("eval-corpus")
    assert _state(t.read()) == pinned

    # dropping the tag releases the version for expiry
    t.drop_ref("eval-corpus")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.read("eval-corpus")


def test_tag_create_is_exclusive_and_validated(spark, tmpdir_path):
    t = _mk_table(spark, tmpdir_path)
    t.create_tag("v0-pin")
    with pytest.raises(FileExistsError):
        t.create_tag("v0-pin")
    with pytest.raises(ValueError):
        t.create_tag("bad name/with spaces")
    with pytest.raises(FileNotFoundError):
        t.create_tag("future", version=99)
    assert set(t.refs()) == {"v0-pin"}


def test_branch_writes_never_touch_main_and_fast_forward(spark, tmpdir_path):
    segs = _segments(spark, os.path.join(tmpdir_path, "binlog"))
    t = _mk_table(spark, tmpdir_path)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0, enrich=with_extracted_text)
    v_base = t.current_version()
    main_state = _state(t.read())

    # an identical second table replaying ALL batches on main is the oracle
    t2 = _mk_table(spark, tmpdir_path, name="oracle")
    for i, seg in enumerate(segs):
        t2.merge_apply(read_binlog(spark, seg), batch_id=i, enrich=with_extracted_text)

    t.create_branch("backfill")
    for i, seg in enumerate(segs[1:], start=1):
        out = t.merge_apply(
            read_binlog(spark, seg),
            batch_id=i,
            enrich=with_extracted_text,
            branch="backfill",
        )
        assert out["branch"] == "backfill" and out["staged_token"]

    # main is untouched; the branch head has the full replay state
    assert t.current_version() == v_base
    assert _state(t.read()) == main_state
    assert _state(t.read("backfill")) == _state(t2.read())

    # exactly-once is per-branch: re-applying a branch batch is a no-op,
    # while the same id was applied on main only for batch 0
    assert t.merge_apply(
        read_binlog(spark, segs[1]), batch_id=1, branch="backfill"
    ) == {"skipped": True, "batch_id": 1}

    # fast-forward publishes the chain; final state ≡ plain replay
    ff = t.fast_forward("backfill")
    assert [p["token"] for p in ff["published"]]
    assert "backfill" not in t.refs()
    assert t.list_staged() == []
    assert _state(t.read()) == _state(t2.read())
    assert t.applied_batches() == t2.applied_batches()


def test_fast_forward_conflicts_when_main_moves(spark, tmpdir_path):
    segs = _segments(spark, os.path.join(tmpdir_path, "binlog"))
    t = _mk_table(spark, tmpdir_path)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0, enrich=with_extracted_text)
    t.create_branch("risky")
    t.merge_apply(read_binlog(spark, segs[1]), batch_id=1, branch="risky")

    # main advances concurrently → the branch's rewrites are stale
    t.merge_apply(read_binlog(spark, segs[2]), batch_id=2, enrich=with_extracted_text)
    with pytest.raises(CommitConflictError):
        t.fast_forward("risky")

    # branch intact after the failed forward; dropping it cleans its files
    assert t.refs()["risky"]["tokens"]
    staged_before = t.list_staged()
    assert staged_before
    t.drop_ref("risky")
    assert t.list_staged() == []
    assert "risky" not in t.refs()


def test_fast_forward_resumes_after_crash_between_publish_and_advance(
    spark, tmpdir_path
):
    segs = _segments(spark, os.path.join(tmpdir_path, "binlog"))
    t = _mk_table(spark, tmpdir_path)
    t.merge_apply(read_binlog(spark, segs[0]), batch_id=0, enrich=with_extracted_text)
    t.create_branch("bf")
    t.merge_apply(read_binlog(spark, segs[1]), batch_id=1, branch="bf")
    t.merge_apply(read_binlog(spark, segs[2]), batch_id=2, branch="bf")
    branch_state = _state(t.read("bf"))

    # simulate the crash: first token published, ref NOT advanced
    first = t.refs()["bf"]["tokens"][0]
    t.publish(first)

    ff = t.fast_forward("bf")
    assert ff["published"][0]["summary"] == {"already_published": True}
    assert _state(t.read()) == branch_state
    assert "bf" not in t.refs()


def test_branch_guard_rails(spark, tmpdir_path):
    t = _mk_table(spark, tmpdir_path)
    t.create_tag("a-tag")
    t.create_branch("a-branch")
    with pytest.raises(ValueError):
        t.merge_apply(None, batch_id=0, branch="a-tag")  # tag is not writable
    with pytest.raises(ValueError):
        t.fast_forward("a-tag")
    with pytest.raises(FileNotFoundError):
        t.merge_apply(None, batch_id=0, branch="nope")
    with pytest.raises(FileExistsError):
        t.create_branch("a-tag")  # names share one namespace


def test_resolve_anchor_is_the_shared_ref_walk(spark, tmpdir_path):
    """``resolve_anchor`` is the ONE tag/branch→anchor resolution both
    ``manifest`` and the lake format's per-query pin use: a tag resolves
    to its committed version int, a fresh branch to its base version, a
    staged-token/unknown name returns unchanged (the caller's load
    raises), and a self-referential walk terminates."""
    segs = _segments(spark, os.path.join(tmpdir_path, "binlog"), n_segments=2)
    t = _mk_table(spark, tmpdir_path)
    for i, seg in enumerate(segs):
        t.merge_apply(
            read_binlog(spark, seg), batch_id=i, enrich=with_extracted_text
        )
    v = t.current_version()
    t.create_tag("release", version=v)
    assert t.resolve_anchor("release") == v
    t.create_branch("audit")
    assert int(t.resolve_anchor("audit")) == v  # fresh branch: base version
    assert t.resolve_anchor("no-such-ref") == "no-such-ref"
    assert t.resolve_anchor(3) == 3
    # manifest agrees with the anchor it resolves
    assert t.manifest("release")["version"] == v
