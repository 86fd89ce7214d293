"""Optimistic-concurrency manifest commits.

The manifest version file is the commit CAS: ``os.link`` creates it
exclusively, so two writers racing to version N produce exactly one
winner and one :class:`CommitConflictError` — never a silent clobber.
LWW merges commute, so the documented recovery (recompute against the
new snapshot and retry) converges to the same final state; the injected
-race test pins that end to end through ``CdcPipeline.apply_batch``.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.table import CommitConflictError, LakeTable
from crypto_exchange_etl_spark.model import PAGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline


def _bump(m: dict) -> dict:
    nm = dict(m)
    nm.update(
        version=m["version"] + 1,
        snapshot_id=str(uuid.uuid4()),
        parent_version=m["version"],
        summary={"operation": "noop"},
        committed_at_unix=time.time(),
    )
    return nm


def test_version_cas_single_winner(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), PAGES_SCHEMA, n_buckets=4
    )
    m = t.manifest()
    t._write_manifest(_bump(m))
    # a second writer that read the SAME base version loses the CAS
    try:
        t._write_manifest(_bump(m))
        raise AssertionError("conflicting commit accepted")
    except CommitConflictError:
        pass
    # no tmp litter left behind by either attempt
    assert not [f for f in os.listdir(t.meta_dir) if f.startswith(".tmp")]
    assert t.current_version() == m["version"] + 1


def test_concurrent_create_if_not_exists(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    a = LakeTable.create(spark, path, PAGES_SCHEMA, n_buckets=4)
    # a second creator with if_not_exists must not clobber v0
    b = LakeTable.create(spark, path, PAGES_SCHEMA, n_buckets=4, if_not_exists=True)
    assert a.manifest()["snapshot_id"] == b.manifest()["snapshot_id"]


def test_merge_retry_after_injected_race(spark, tmpdir_path, monkeypatch):
    """A maintenance commit lands between a merge's manifest read and its
    commit: the merge loses the CAS once, apply_batch retries, and the
    final state equals the no-race replay."""
    path_r = os.path.join(tmpdir_path, "race")
    path_q = os.path.join(tmpdir_path, "quiet")
    df = generate_changes(spark, 2400, n_urls=120, seed=5).cache()
    b0 = df.where(F.col("lsn") < 1200)
    b1 = df.where(F.col("lsn") >= 1200)

    # reference: no race
    quiet = CdcPipeline(spark, path_q, n_buckets=4)
    quiet.apply_batch(b0, batch_id=0)
    quiet.apply_batch(b1, batch_id=1)
    want = sorted(
        (r.url, r.lsn)
        for r in quiet.table.read_physical().where(~F.col("is_deleted"))
        .select("url", "lsn").collect()
    )

    racy = CdcPipeline(spark, path_r, n_buckets=4)
    racy.apply_batch(b0, batch_id=0)

    orig = LakeTable._write_manifest
    state = {"armed": True}

    def hijack(self, manifest):
        if state["armed"] and manifest["summary"].get("operation") == "merge":
            state["armed"] = False  # fire once
            orig(self, _bump(self.manifest()))  # competing no-op commit
        orig(self, manifest)

    monkeypatch.setattr(LakeTable, "_write_manifest", hijack)
    out = racy.apply_batch(b1, batch_id=1)  # loses CAS once, retries
    monkeypatch.setattr(LakeTable, "_write_manifest", orig)
    assert not out.get("skipped")

    got = sorted(
        (r.url, r.lsn)
        for r in racy.table.read_physical().where(~F.col("is_deleted"))
        .select("url", "lsn").collect()
    )
    assert got == want
    # exactly-once survived the retry: re-applying batch 1 is a no-op
    assert racy.apply_batch(b1, batch_id=1).get("skipped")
    df.unpersist()
