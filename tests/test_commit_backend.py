"""Pluggable CommitBackend: the lake's commit CAS over object storage.

``LocalFSBackend`` is the historical hardlink CAS; ``ConditionalPutBackend``
emulates an object store's conditional PUT (``If-None-Match: *``) with NO
hardlinks and NO rename-onto-target in the exclusive path — the primitives
S3/GCS actually offer. These tests prove (a) both backends satisfy the
single-winner contract under real thread races with injected latency,
(b) a table created on one backend commits through it forever (persisted
marker), and (c) the merge CAS-conflict semantics
(:class:`CommitConflictError`, retry converges) hold unchanged on the
conditional-PUT backend.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.commit_backend import (
    ConditionalPutBackend,
    LocalFSBackend,
    resolve_backend,
)
from crypto_exchange_etl_spark.lake.table import CommitConflictError, LakeTable
from crypto_exchange_etl_spark.model import PAGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

BACKENDS = ["localfs", "conditional_put"]


# ------------------------------------------------------------ pure-FS unit


@pytest.mark.parametrize("name", BACKENDS)
def test_put_if_absent_single_winner_threads(tmpdir_path, name):
    """16 threads race one key through the backend CAS: exactly one wins,
    and the committed bytes are exactly the winner's complete payload
    (no torn/interleaved writes)."""
    b = resolve_backend(name)
    target = os.path.join(tmpdir_path, "v1.json")
    wins: list[int] = []
    barrier = threading.Barrier(16)

    def contender(i: int) -> None:
        barrier.wait()
        if b.put_if_absent(target, json.dumps({"writer": i}).encode()):
            wins.append(i)

    threads = [threading.Thread(target=contender, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    with open(target) as fh:
        assert json.load(fh) == {"writer": wins[0]}
    # no write-aside litter from the 15 losers
    assert sorted(os.listdir(tmpdir_path)) == ["v1.json"]


def test_conditional_put_claim_is_linearization_point(tmpdir_path):
    """Widen the emulated claim→body window: writer A is HELD between its
    conditional claim and its body upload while writer B attempts the same
    key. B must lose immediately (the claim, not the body, serializes) and
    A's payload must land intact afterwards — the schedule a slow
    multipart PUT against S3 would produce."""
    target = os.path.join(tmpdir_path, "v7.json")
    a_claimed = threading.Event()
    b_done = threading.Event()

    def hold(path: str) -> None:
        a_claimed.set()
        assert b_done.wait(10), "writer B never ran inside A's window"

    a = ConditionalPutBackend(after_claim=hold)
    b = ConditionalPutBackend(latency=0.01)
    results: dict[str, bool] = {}

    def writer_a() -> None:
        results["a"] = a.put_if_absent(target, b'{"writer": "a"}')

    ta = threading.Thread(target=writer_a)
    ta.start()
    assert a_claimed.wait(10)
    results["b"] = b.put_if_absent(target, b'{"writer": "b"}')
    b_done.set()
    ta.join()
    assert results == {"a": True, "b": False}
    with open(target) as fh:
        assert json.load(fh) == {"writer": "a"}


def test_conditional_put_uses_no_hardlinks(tmpdir_path):
    """The exclusive path must be implementable on a store with no link()
    — the committed object has link count 1 (a hardlink CAS would briefly
    create 2 and prove local-FS dependence)."""
    b = ConditionalPutBackend()
    target = os.path.join(tmpdir_path, "obj.json")
    assert b.put_if_absent(target, b"{}")
    assert os.stat(target).st_nlink == 1


# ------------------------------------------------------- table integration


@pytest.mark.parametrize("name", BACKENDS)
def test_table_backend_persisted_and_conflict(spark, tmpdir_path, name):
    """create(backend=...) persists the marker; a fresh opener resolves
    the same backend; the version CAS raises CommitConflictError on both
    implementations."""
    path = os.path.join(tmpdir_path, f"t_{name}")
    t = LakeTable.create(spark, path, PAGES_SCHEMA, n_buckets=4, backend=name)
    assert t.backend.name == name
    with open(os.path.join(t.meta_dir, "commit-backend.json")) as fh:
        assert json.load(fh)["backend"] == name
    # a fresh handle (no constructor arg) resolves from the marker
    t2 = LakeTable.load(spark, path)
    assert t2.backend.name == name

    m = t.manifest()

    def bump(base: dict) -> dict:
        nm = dict(base)
        nm.update(
            version=base["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=base["version"],
            summary={"operation": "noop"},
            committed_at_unix=time.time(),
        )
        return nm

    t._write_manifest(bump(m))
    with pytest.raises(CommitConflictError):
        t2._write_manifest(bump(m))  # same base version → CAS loss
    assert t.current_version() == m["version"] + 1


def test_two_writer_merge_race_conditional_put(spark, tmpdir_path, monkeypatch):
    """End to end on the conditional-PUT backend with injected latency:
    two pipelines over the SAME table apply disjoint batches concurrently.
    Exactly one per contested version wins the conditional PUT; the loser
    retries against the new snapshot (LWW merges commute), and the final
    state equals a quiet sequential replay."""
    path_r = os.path.join(tmpdir_path, "race")
    path_q = os.path.join(tmpdir_path, "quiet")
    df = generate_changes(spark, 2400, n_urls=120, seed=11).cache()
    b0 = df.where(F.col("lsn") < 1200)
    b1 = df.where(F.col("lsn") >= 1200)

    quiet = CdcPipeline(spark, path_q, n_buckets=4)
    quiet.apply_batch(b0, batch_id=0)
    quiet.apply_batch(b1, batch_id=1)
    want = sorted(
        (r.url, r.lsn)
        for r in quiet.table.read_physical().where(~F.col("is_deleted"))
        .select("url", "lsn").collect()
    )

    LakeTable.create(
        spark, path_r, PAGES_SCHEMA, n_buckets=4, backend="conditional_put"
    )
    # every handle the racing pipelines open resolves to a LATENCIED
    # conditional-PUT backend, so the conflict window is real (50 ms per
    # PUT), not a lucky interleaving
    import crypto_exchange_etl_spark.lake.table as table_mod

    monkeypatch.setattr(
        table_mod,
        "resolve_backend",
        lambda spec, default="localfs": ConditionalPutBackend(latency=0.05),
    )
    pa = CdcPipeline(spark, path_r, n_buckets=4)
    pb = CdcPipeline(spark, path_r, n_buckets=4)
    errs: list[Exception] = []

    def run(p: CdcPipeline, batch, bid: int) -> None:
        # apply_batch retries CAS losses internally; anything else is real
        try:
            p.apply_batch(batch, batch_id=bid)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    ta = threading.Thread(target=run, args=(pa, b0, 0))
    tb = threading.Thread(target=run, args=(pb, b1, 1))
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    assert not errs, errs
    got = sorted(
        (r.url, r.lsn)
        for r in LakeTable.load(spark, path_r).read_physical()
        .where(~F.col("is_deleted")).select("url", "lsn").collect()
    )
    assert got == want
    df.unpersist()
