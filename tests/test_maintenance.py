"""Policy-driven auto-maintenance: plan correctness, safe execution
order, one-pass convergence, and state preservation."""

from __future__ import annotations

import datetime as dt
import os

from crypto_exchange_etl_spark.lake.maintenance import (
    MaintenanceHook,
    MaintenancePolicy,
    plan_maintenance,
    run_maintenance,
    verify_table,
)
from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _mor_table(spark, path, n_batches=4, rows_per=6):
    """A merge-on-read table with one delta layer per batch (max_deltas
    high enough that the pipeline itself never compacts)."""
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode="mor",
                       max_deltas=1000)
    lsn = 0
    for b in range(n_batches):
        rows = []
        for i in range(rows_per):
            rows.append((lsn, 0, "I" if b == 0 else "U", f"u{i}",
                         TS + dt.timedelta(days=b), f"<p>{b}:{i}</p>".encode(),
                         "en"))
            lsn += 1
        _apply(spark, pipe, b, rows)
    return pipe.table


def _state(table):
    return sorted(
        (r.url, r.text, str(r.warc_ts)) for r in table.read().collect()
    )


def test_healthy_table_plans_nothing(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=2)
    plan = plan_maintenance(t, MaintenancePolicy(orphan_age_secs=None))
    assert plan == []


def test_backlog_plans_minor_compact_and_converges(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=5)
    before = _state(t)
    pol = MaintenancePolicy(
        minor_compact_max_deltas=3, small_files_per_bucket=None,
        bloom_stale_frac=None, orphan_age_secs=None,
    )
    plan = plan_maintenance(t, pol)
    assert [s["action"] for s in plan] == ["minor_compact"]
    rep = run_maintenance(t, pol, plan=plan)
    assert [e["action"] for e in rep["executed"]] == ["minor_compact"]
    assert rep["replan"] == []
    t2 = LakeTable.load(spark, t.path)
    assert t2.delta_file_counts() == {}
    assert _state(t2) == before


def test_small_files_prefer_binpack_over_backlog_drain(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=5)
    before = _state(t)
    pol = MaintenancePolicy(
        minor_compact_max_deltas=3, small_files_per_bucket=3,
        bloom_stale_frac=None, orphan_age_secs=None,
    )
    plan = plan_maintenance(t, pol)
    acts = [s["action"] for s in plan]
    assert acts == ["compact_files"]  # bin-pack folds the backlog too
    assert "drains" in plan[0]["reason"]
    rep = run_maintenance(t, pol, plan=plan)
    assert rep["replan"] == []
    t2 = LakeTable.load(spark, t.path)
    assert t2.delta_file_counts() == {}
    assert _state(t2) == before


def test_stale_blooms_replanned(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=2)
    t.build_blooms()
    t = LakeTable.load(spark, t.path)
    pol = MaintenancePolicy(
        minor_compact_max_deltas=None, small_files_per_bucket=None,
        bloom_stale_frac=0.3, orphan_age_secs=None,
    )
    assert plan_maintenance(t, pol) == []  # fresh build: full coverage
    pipe = CdcPipeline(spark, t.path, n_buckets=2, write_mode="mor",
                       max_deltas=1000)
    for b in range(2, 6):  # new deltas have no bloom rows
        _apply(spark, pipe, b, [
            (100 * b + i, 0, "U", f"u{i}", TS + dt.timedelta(days=b),
             f"<p>x{b}:{i}</p>".encode(), "en")
            for i in range(6)
        ])
    t = LakeTable.load(spark, t.path)
    plan = plan_maintenance(t, pol)
    assert [s["action"] for s in plan] == ["build_blooms"]
    rep = run_maintenance(t, pol, plan=plan)
    assert rep["replan"] == []
    t2 = LakeTable.load(spark, t.path)
    assert [r.text for r in t2.lookup("u3").collect()] == ["x5:3"]


def test_rewrite_pass_rebuilds_blooms_same_pass(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=4)
    t.build_blooms()
    t = LakeTable.load(spark, t.path)
    pol = MaintenancePolicy(
        minor_compact_max_deltas=2, small_files_per_bucket=None,
        bloom_stale_frac=0.99,  # coverage alone would never trigger
        orphan_age_secs=None,
    )
    plan = plan_maintenance(t, pol)
    assert [s["action"] for s in plan] == ["minor_compact", "build_blooms"]
    assert "supersedes" in plan[1]["reason"]
    rep = run_maintenance(t, pol, plan=plan)
    assert rep["replan"] == []


def test_snapshot_expiry_and_orphans(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=4)
    orphan = os.path.join(t.path, "data", "bucket=0", "junk-orphan.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    os.utime(orphan, (1, 1))  # ancient
    pol = MaintenancePolicy(
        minor_compact_max_deltas=None, small_files_per_bucket=None,
        bloom_stale_frac=None, keep_snapshots=2, orphan_age_secs=3600.0,
    )
    plan = plan_maintenance(t, pol)
    assert [s["action"] for s in plan] == ["expire_snapshots", "remove_orphans"]
    rep = run_maintenance(t, pol, plan=plan)
    assert not os.path.exists(orphan)
    t2 = LakeTable.load(spark, t.path)
    assert len(t2.history()) == 2
    assert rep["replan"] == []
    assert t2.read().count() == 6


def test_row_ttl(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode="cow")
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"old{i}", TS, b"<p>o</p>", "en") for i in range(4)
    ])
    _apply(spark, pipe, 1, [
        (10 + i, 0, "I", f"new{i}", TS + dt.timedelta(days=90), b"<p>n</p>", "en")
        for i in range(4)
    ])
    t = pipe.table
    pol = MaintenancePolicy(
        minor_compact_max_deltas=None, small_files_per_bucket=None,
        bloom_stale_frac=None, orphan_age_secs=None,
        row_ttl=dt.timedelta(days=30),
        now=TS + dt.timedelta(days=100),
    )
    plan = plan_maintenance(t, pol)
    assert [s["action"] for s in plan] == ["expire_rows"]
    rep = run_maintenance(t, pol, plan=plan)
    t2 = LakeTable.load(spark, path)
    assert sorted(r.url for r in t2.read().collect()) == [
        f"new{i}" for i in range(4)
    ]
    assert rep["replan"] == []


def test_compact_ledger(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=5)
    v_before = t.current_version()
    rows_before = sorted(
        (r.batch_id, r.partition, r.max_lsn, r.n_events, str(r.committed_at))
        for r in t.ledger().collect()
    )
    assert len(t.manifest()["ledger_files"]) == 5
    out = t.compact_ledger()
    assert (out["files_before"], out["files_after"]) == (5, 1)
    t = LakeTable.load(spark, t.path)
    assert len(t.manifest()["ledger_files"]) == 1
    rows_after = sorted(
        (r.batch_id, r.partition, r.max_lsn, r.n_events, str(r.committed_at))
        for r in t.ledger().collect()
    )
    assert rows_after == rows_before  # lineage carried verbatim
    # older snapshots keep the pre-compaction layout (files still on disk)
    old = t.manifest(v_before)
    assert len(old["ledger_files"]) == 5
    assert all(os.path.exists(os.path.join(t.path, p))
               for p in old["ledger_files"])
    # idempotent: already folded → metadata no-op, no new version
    v = t.current_version()
    again = t.compact_ledger()
    assert again["files_after"] == 1 and t.current_version() == v
    # a later merge appends normally alongside the compacted file
    pipe = CdcPipeline(spark, t.path, n_buckets=2, write_mode="mor",
                       max_deltas=1000)
    _apply(spark, pipe, 9, [(999, 0, "U", "u0", TS + dt.timedelta(days=9),
                             b"<p>z</p>", "en")])
    t2 = LakeTable.load(spark, t.path)
    assert len(t2.manifest()["ledger_files"]) == 2
    assert t2.ledger().count() == len(rows_before) + 1


def test_ledger_rule_in_planner(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=5)
    pol = MaintenancePolicy(
        minor_compact_max_deltas=None, small_files_per_bucket=None,
        bloom_stale_frac=None, orphan_age_secs=None, ledger_max_files=3,
    )
    plan = plan_maintenance(t, pol)
    assert [s["action"] for s in plan] == ["compact_ledger"]
    rep = run_maintenance(t, pol, plan=plan)
    assert rep["replan"] == []
    assert len(LakeTable.load(spark, t.path).manifest()["ledger_files"]) == 1


def test_verify_table_clean_and_corrupted(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=3)
    t.build_blooms()
    t = LakeTable.load(spark, t.path)
    rep = verify_table(t, deep=True)
    assert rep["ok"] and rep["findings"] == []
    assert rep["versions_checked"] >= 4 and rep["files_checked"] > 0

    # silent truncation: size mismatch (shallow) + unreadable footer (deep)
    victim = os.path.join(t.path, t.manifest()["files"][0]["path"])
    with open(victim, "r+b") as fh:
        fh.truncate(10)
    rep = verify_table(t, deep=True)
    kinds = {f["kind"] for f in rep["findings"]}
    assert not rep["ok"]
    assert "size_mismatch" in kinds and "unreadable_footer" in kinds

    # missing file
    os.remove(victim)
    rep = verify_table(t)
    assert not rep["ok"]
    assert any(f["kind"] == "missing_file" for f in rep["findings"])


def test_verify_table_stale_bloom_is_warning_only(spark, tmpdir_path):
    import shutil

    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=2)
    t.build_blooms()
    t = LakeTable.load(spark, t.path)
    shutil.rmtree(os.path.join(t.path, t.manifest()["blooms"]["dir"]))
    rep = verify_table(t)
    assert rep["ok"]  # degraded lookup path, not corruption
    assert [f["kind"] for f in rep["findings"]] == ["stale_bloom_dir"]
    assert t.lookup("u0").count() == 1  # and lookups indeed still work


def test_cli_inspect_verify_exit_codes(spark, tmpdir_path):
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "cdc_job_verify", os.path.join(repo, "scripts", "cdc_job.py")
    )
    cdc_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cdc_job)

    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=2)
    assert cdc_job.main(
        ["inspect", "--table", t.path, "--verify", "--deep"]) in (0, None)
    os.remove(os.path.join(t.path, t.manifest()["files"][0]["path"]))
    assert cdc_job.main(["inspect", "--table", t.path, "--verify"]) == 2


def test_metadata_tables(spark, tmpdir_path):
    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=3)
    t.create_tag("release-1")
    t = LakeTable.load(spark, t.path)
    m = t.manifest()

    files = t.metadata_table("files")
    assert files.count() == len(m["files"])
    agg = files.groupBy().sum("bytes").collect()[0][0]
    assert agg == t.stats()["total_bytes"]
    assert files.where("is_delta").count() == sum(
        1 for f in m["files"] if f.get("delta"))

    parts = t.metadata_table("partitions")
    rows_total = sum(r.rows for r in parts.collect())
    assert rows_total == sum(f["rows"] for f in m["files"])

    snaps = t.metadata_table("snapshots")
    assert snaps.count() == len(t.history())
    head = snaps.orderBy("version", ascending=False).first()
    assert head.version == t.current_version()

    refs = t.metadata_table("refs").collect()
    assert [(r.name, r.type, r.version) for r in refs] == [
        ("release-1", "tag", t.current_version())
    ]

    # composes with SQL like any table
    files.createOrReplaceTempView("t_files")
    hot = spark.sql(
        "select bucket, sum(bytes) b from t_files group by bucket "
        "order by b desc limit 1"
    ).collect()[0]
    assert hot.b > 0

    try:
        t.metadata_table("nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_in_stream_maintenance_hook(spark, tmpdir_path):
    from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=1500, n_segments=6,
                          n_urls=150, seed=3)
    tbl = os.path.join(tmpdir_path, "t")
    hook = MaintenanceHook(
        spark, tbl,
        policy=MaintenancePolicy(
            minor_compact_max_deltas=1, small_files_per_bucket=None,
            bloom_stale_frac=None, orphan_age_secs=None,
        ),
        every_n_batches=2,
    )
    pipe = CdcPipeline(spark, tbl, n_buckets=2, write_mode="mor",
                       max_deltas=1000, views=[hook])
    pipe.run_stream(binlog, os.path.join(tmpdir_path, "ck"),
                    available_now=True, timeout_secs=300)
    assert hook.last_report is not None  # ran inside the stream
    assert any(e["action"] == "minor_compact"
               for e in hook.last_report["executed"])
    # maintenance inside the loop never perturbs the replayed state
    ref = CdcPipeline(spark, os.path.join(tmpdir_path, "ref"), n_buckets=2)
    ref.replay_all(binlog)
    assert sorted((r.url, r.text) for r in pipe.table.read().collect()) == \
        sorted((r.url, r.text) for r in ref.table.read().collect())
    # the stream's own snapshot log shows interleaved maintenance commits
    ops = [h["operation"] for h in pipe.table.history()]
    assert "minor_compact" in ops


def test_cli_auto_plan_and_run(spark, tmpdir_path):
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "cdc_job_maint", os.path.join(repo, "scripts", "cdc_job.py")
    )
    cdc_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cdc_job)

    t = _mor_table(spark, os.path.join(tmpdir_path, "t"), n_batches=5)
    before = _state(t)
    argv_tail = ["maintain", "--table", t.path, "--auto-policy",
                 "minor_compact_max_deltas=3,small_files_per_bucket=0"]
    assert cdc_job.main([*argv_tail[:3], "--auto-plan",
                         *argv_tail[3:]]) in (0, None)
    assert LakeTable.load(spark, t.path).delta_file_counts() != {}  # plan only
    assert cdc_job.main([*argv_tail[:3], "--auto", *argv_tail[3:]]) in (0, None)
    t2 = LakeTable.load(spark, t.path)
    assert t2.delta_file_counts() == {}
    assert _state(t2) == before


def test_columns_metadata_table(spark, tmpdir_path):
    """metadata_table('columns'): schema + field ids + defaults as a
    queryable DataFrame (DESCRIBE EXTENDED face of the DDL machinery)."""
    import json as _json
    import datetime as _dt
    from crypto_exchange_etl_spark.model import CHANGES_SCHEMA as _CS
    from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline as _P

    path = f"{tmpdir_path}/t"
    pipe = _P(spark, path, n_buckets=2)
    pipe.apply_batch(
        spark.createDataFrame(
            [(1, 0, "I", "u0", _dt.datetime(2024, 1, 1), b"<p>0</p>", "en")],
            _CS,
        ),
        batch_id=0,
    )
    t = pipe.table
    t.add_column("score", "double", default=0.5)
    cols = {r.name: r for r in t.metadata_table("columns").collect()}
    assert cols["url"].is_structural and not cols["url"].is_internal
    assert cols["lsn"].is_internal
    assert cols["score"].type == "double"
    assert _json.loads(cols["score"].initial_default_json) == 0.5
    assert cols["score"].field_id == t.manifest()["field_ids"]["score"]
    # composes with SQL
    t.metadata_table("columns").createOrReplaceTempView("cols_meta")
    got = [r.name for r in
           spark.sql("select name from cols_meta where is_internal").collect()]
    assert got == ["lsn"]  # lineage col in the logical schema; is_deleted
    # is physical-only (added at write, hidden from the manifest schema)
