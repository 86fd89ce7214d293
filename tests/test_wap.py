"""Write-audit-publish: staged merges, atomic publish, audited pipeline.

The WAP pattern (Iceberg's stage-then-publish workflow): a merge can land
its full file set WITHOUT advancing the committed version chain, an audit
inspects the would-be table state, and only a passing audit publishes.
The reference validates AFTER loading (ok-flag written post-load,
/root/reference/fintick/controllers/base.py:244-267) so bad rows are
briefly live; here they never enter the committed chain at all.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.table import (
    CommitConflictError,
    LakeTable,
)
from crypto_exchange_etl_spark.sources.binlog import (
    read_binlog,
    write_binlog_segments,
)
from crypto_exchange_etl_spark.functions.extract import with_extracted_text
from crypto_exchange_etl_spark.streaming.pipeline import (
    AuditFailedError,
    CdcPipeline,
)


def _mk_binlog(spark, path, n_events=3000, n_segments=3, n_urls=300):
    write_binlog_segments(
        spark, path, n_events=n_events, n_segments=n_segments, n_urls=n_urls, seed=7
    )
    return read_binlog(spark, path)


def test_stage_then_publish_is_atomic(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    changes = _mk_binlog(spark, binlog)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=8)
    table = pipe.ensure_table()
    v0 = table.current_version()

    out = table.merge_apply(
        changes, batch_id=0, enrich=with_extracted_text, publish=False
    )
    token = out["staged_token"]

    # committed chain untouched: same version, zero rows, batch unapplied
    assert table.current_version() == v0
    assert table.read().count() == 0
    assert 0 not in table.applied_batches()
    assert table.list_staged() == [token]

    # the staged read IS the would-be state
    staged_rows = table.read(version=token).count()
    assert staged_rows > 0

    summary = table.publish(token)
    assert summary["batch_id"] == 0
    assert table.current_version() == v0 + 1
    assert table.read().count() == staged_rows
    assert 0 in table.applied_batches()
    assert table.list_staged() == []

    # published state ≡ a straight (non-WAP) merge of the same batch
    ref = CdcPipeline(spark, os.path.join(tmpdir_path, "ref"), n_buckets=8)
    ref.replay_all(binlog)
    a = table.read().orderBy("url").collect()
    b = ref.table.read().select(*table.read().columns).orderBy("url").collect()
    assert a == b


def test_discard_staged_leaves_no_trace(spark, tmpdir_path):
    changes = _mk_binlog(spark, os.path.join(tmpdir_path, "binlog"))
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=8)
    table = pipe.ensure_table()
    out = table.merge_apply(changes, batch_id=0, publish=False)
    token = out["staged_token"]
    staged_dir = os.path.join(table.path, f"data/snap-{token}")
    assert os.path.isdir(staged_dir)

    table.discard_staged(token)
    assert not os.path.exists(staged_dir)
    assert table.list_staged() == []
    assert table.read().count() == 0
    # batch never applied ⇒ the same id merges cleanly afterwards
    table.merge_apply(changes, batch_id=0)
    assert table.read().count() > 0


def test_publish_conflict_when_table_advanced(spark, tmpdir_path):
    changes = _mk_binlog(spark, os.path.join(tmpdir_path, "binlog"))
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=8)
    table = pipe.ensure_table()
    out = table.merge_apply(changes, batch_id=0, publish=False)
    token = out["staged_token"]
    # another writer commits first — the staged file set is now stale
    table.merge_apply(changes, batch_id=1)
    with pytest.raises(CommitConflictError):
        table.publish(token)
    table.discard_staged(token)


def test_expire_snapshots_keeps_staged_files(spark, tmpdir_path):
    changes = _mk_binlog(spark, os.path.join(tmpdir_path, "binlog"))
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=8)
    table = pipe.ensure_table()
    table.merge_apply(changes, batch_id=0)
    out = table.merge_apply(changes, batch_id=1, publish=False)
    token = out["staged_token"]
    staged_dir = os.path.join(table.path, f"data/snap-{token}")
    n_before = len(
        [f for _r, _d, fs in os.walk(staged_dir) for f in fs if f.endswith(".parquet")]
    )
    table.expire_snapshots(keep_last=1)
    n_after = len(
        [f for _r, _d, fs in os.walk(staged_dir) for f in fs if f.endswith(".parquet")]
    )
    # staged data survived the GC and still publishes
    assert n_before == n_after > 0
    table.publish(token)
    assert table.read().count() > 0
    assert 1 in table.applied_batches()


def test_audited_pipeline_rejects_then_accepts(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    changes = _mk_binlog(spark, binlog)

    # audit: every live row must carry non-null extracted text
    def audit(staged_df, summary):
        bad = staged_df.where(F.col("text").isNull()).count()
        return bad == 0 and summary["n_events"] > 0

    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "pages"), n_buckets=8, audit=audit
    )
    pipe.ensure_table()
    pipe.apply_batch(changes, batch_id=0)
    assert pipe.table.read().count() > 0
    v_after = pipe.table.current_version()

    # an always-failing audit: staged snapshot discarded, state unchanged,
    # batch id NOT burned
    pipe_bad = CdcPipeline(
        spark,
        pipe.table_path,
        n_buckets=8,
        audit=lambda df, s: False,
    )
    before = pipe.table.read().count()
    with pytest.raises(AuditFailedError):
        pipe_bad.apply_batch(changes, batch_id=1)
    assert pipe.table.current_version() == v_after
    assert pipe.table.read().count() == before
    assert pipe.table.list_staged() == []
    assert 1 not in pipe.table.applied_batches()

    # corrected run re-uses the same batch id under exactly-once
    pipe.apply_batch(changes, batch_id=1)
    assert 1 in pipe.table.applied_batches()


def test_audited_pipeline_state_matches_unaudited(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    _mk_binlog(spark, binlog, n_events=4000, n_segments=4, n_urls=250)

    audited = CdcPipeline(
        spark,
        os.path.join(tmpdir_path, "pages_a"),
        n_buckets=8,
        audit=lambda df, s: True,
    )
    audited.run_stream(
        binlog, os.path.join(tmpdir_path, "ck"), available_now=True, timeout_secs=300
    )
    plain = CdcPipeline(spark, os.path.join(tmpdir_path, "pages_b"), n_buckets=8)
    plain.replay_all(binlog)

    cols = sorted(plain.table.read().columns)
    a = audited.table.read().select(*cols).orderBy("url").collect()
    b = plain.table.read().select(*cols).orderBy("url").collect()
    assert a == b
