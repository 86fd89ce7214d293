"""Regression tests for the round-4 session-12 lake-core review findings.

Each test pins one fixed bug:

- ``publish()``'s commit-then-unlink crash window: a leftover staged
  file whose snapshot already landed on main must make ``publish``
  resume idempotently and ``discard_staged`` refuse to delete the
  committed snapshot's data dir (before the fix, re-running
  ``fast_forward`` wedged on CommitConflictError and the documented
  ``drop_ref`` recovery deleted committed data);
- ``rollback(<branch>)`` resolved the branch to its staged head and
  committed a manifest still carrying the ``staged`` pointer, so a later
  ``drop_ref`` rmtree'd the data dir the committed rollback references;
- a stray ``v5 copy.json`` in the metadata dir crashed
  ``current_version``/``history``/``expire_snapshots`` with a bare
  ValueError from ``int()`` (``earliest_version`` was already strict);
- decimal initial defaults round-tripped through Python float, losing
  precision below ~1e-16 (and corrupting integer defaults past 2^53);
- bloom dirs orphaned by a crashed ``build_blooms`` were invisible to
  ``remove_orphans`` (only data/ledger were walked) and accumulated
  forever.
"""

from __future__ import annotations

import datetime as dt
import decimal
import os
import time

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows, **kw):
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)
    if kw:
        pipe.table.merge_apply(df, batch_id=batch_id, **kw)
    else:
        pipe.apply_batch(df, batch_id=batch_id)


def _mk(spark, path, n=4):
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS, f"<p>{i}</p>".encode(), "en") for i in range(n)
    ])
    return pipe


def _stage_on_branch(spark, pipe, branch, batch_id=7):
    pipe.table.create_branch(branch)
    _apply(spark, pipe, batch_id, [
        (900 + batch_id, 0, "U", "u0", TS + dt.timedelta(days=1),
         b"<p>x</p>", "de"),
    ], branch=branch)
    return pipe.table._load_ref(branch)["tokens"][0]


def _simulate_publish_crash(t, tok):
    """Reproduce publish()'s crash window: manifest committed, staged
    file NOT unlinked."""
    sm = t.manifest(tok)
    committed = dict(sm)
    committed.pop("staged")
    t._write_manifest(committed)
    assert os.path.exists(os.path.join(t.meta_dir, f"staged-{tok}.json"))


def test_publish_resumes_after_commit_unlink_crash(spark, tmpdir_path):
    pipe = _mk(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    tok = _stage_on_branch(spark, pipe, "b1")
    v_before = t.current_version()
    _simulate_publish_crash(t, tok)
    assert t.current_version() == v_before + 1

    # re-publish (what a re-run of fast_forward does first) must resume
    # idempotently — before the fix it raised CommitConflictError
    summary = t.publish(tok)
    assert summary["operation"] == "merge"
    assert t.current_version() == v_before + 1  # no double commit
    assert not os.path.exists(os.path.join(t.meta_dir, f"staged-{tok}.json"))
    assert {r.url for r in t.read().where(F.col("lang") == "de").collect()} == {
        "u0"
    }
    # the branch ref is still around (crash was mid-fast_forward);
    # dropping it must not touch the published data
    t.drop_ref("b1")
    assert t.read().count() == 4


def test_discard_staged_refuses_published_snapshot(spark, tmpdir_path):
    pipe = _mk(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    tok = _stage_on_branch(spark, pipe, "b1")
    _simulate_publish_crash(t, tok)

    # before the fix this rmtree'd the COMMITTED snapshot's data dir
    t.discard_staged(tok)
    assert not os.path.exists(os.path.join(t.meta_dir, f"staged-{tok}.json"))
    got = {r.url: r.lang for r in t.read().select("url", "lang").collect()}
    assert got["u0"] == "de" and len(got) == 4


def test_rollback_to_branch_head_strips_staged_pointer(spark, tmpdir_path):
    pipe = _mk(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    _stage_on_branch(spark, pipe, "audit")

    s = t.rollback("audit")  # branch name resolves to its staged head
    assert s["operation"] == "rollback"
    assert "staged" not in t.manifest()
    want = {r.url: r.lang for r in t.read().select("url", "lang").collect()}
    assert want["u0"] == "de"

    # dropping the branch discards its staged chain — the committed
    # rollback's data must survive (before the fix the carried "staged"
    # pointer let discard_staged delete the referenced dir)
    t.drop_ref("audit")
    got = {r.url: r.lang for r in t.read().select("url", "lang").collect()}
    assert got == want


def test_stray_metadata_file_does_not_brick_the_table(spark, tmpdir_path):
    pipe = _mk(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    v = t.current_version()
    stray = os.path.join(t.meta_dir, "v5 copy.json")
    with open(stray, "w") as fh:
        fh.write("{}")
    assert t.current_version() == v
    assert t.earliest_version() == 0
    assert [h["version"] for h in t.history()] == list(range(v + 1))
    _apply(spark, pipe, 1, [
        (100, 0, "U", "u1", TS + dt.timedelta(days=1), b"<p>y</p>", "fr"),
    ])
    t.expire_snapshots(keep_last=1)
    assert os.path.exists(stray)  # never parsed, never deleted
    assert t.read().count() == 4


def test_decimal_initial_default_is_exact(spark, tmpdir_path):
    pipe = _mk(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    hi = "0.123456789012345678"
    t.add_column("fee", "decimal(38,18)", default=hi)
    got = {r.url: r.fee for r in t.read().select("url", "fee").collect()}
    assert got["u0"] == decimal.Decimal(hi)  # float round-trip loses tail
    big = str(2**60 + 1)
    t.add_column("units", "decimal(38,0)", default=big)
    got2 = t.read().select("units").distinct().collect()
    assert [r.units for r in got2] == [decimal.Decimal(big)]


def test_remove_orphans_sweeps_dead_bloom_dirs(spark, tmpdir_path):
    pipe = _mk(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.build_blooms()
    live_dir = t.manifest()["blooms"]["dir"]

    # a crashed/conflicted build leaves an unreferenced bloom dir
    dead = os.path.join(t.path, "blooms", "bloom-deadbeef")
    os.makedirs(dead)
    dead_file = os.path.join(dead, "part-0.parquet")
    with open(dead_file, "wb") as fh:
        fh.write(b"x")
    old = time.time() - 10 * 24 * 3600
    os.utime(dead_file, (old, old))

    res = t.remove_orphans()
    assert "blooms/bloom-deadbeef/part-0.parquet" in res["paths"]
    assert not os.path.exists(dead_file)
    # the referenced bloom dir is untouched and lookups keep pruning
    assert os.path.isdir(os.path.join(t.path, live_dir))
    assert t.lookup("u1").count() == 1
