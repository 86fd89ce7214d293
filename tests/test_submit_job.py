"""The spark-submit entrypoint runs the engine end-to-end out-of-process.

north_rule: the engine must run "via spark-submit --py-files on a
multi-executor cluster". This test is the single-box form of that
deployment: the library is zipped by ``cdc_job.py package``, shipped via
``--py-files`` (NOT importable from the cwd — the subprocess runs from an
empty scratch dir), and the job replays a binlog it has never seen into a
fresh table. The resulting lake state must byte-match an in-process
replay of the same binlog — proving the packaged artifact is complete and
the entrypoint wires the same engine.
"""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "scripts", "cdc_job.py")


def _state_fingerprint(spark, table_path):
    df = LakeTable.load(spark, table_path).read()
    agg = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(agg["rows"]), int(agg["h"])


def test_spark_submit_pyfiles_replay(spark, tmpdir_path):
    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=6000, n_segments=3, n_urls=400)

    # packaging is pure stdlib — run it the way a user would
    out = subprocess.run(
        [sys.executable, JOB, "package", "--out", os.path.join(tmpdir_path, "dist")],
        check=True,
        capture_output=True,
        text=True,
    )
    zip_path = out.stdout.strip()
    assert os.path.exists(zip_path)

    # submit from a scratch cwd so the library can ONLY come from --py-files
    workdir = os.path.join(tmpdir_path, "empty")
    os.makedirs(workdir)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_MASTER")
    }
    submit = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
    if not os.path.exists(submit):
        submit = "spark-submit"
    table_sub = os.path.join(tmpdir_path, "pages_submitted")
    proc = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            JOB,
            "replay",
            "--binlog",
            binlog,
            "--table",
            table_sub,
            "--buckets",
            "8",
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "replayed 6000 events" in proc.stdout

    table_ref = os.path.join(tmpdir_path, "pages_inproc")
    CdcPipeline(spark, table_ref, n_buckets=8).replay_all(binlog)

    assert _state_fingerprint(spark, table_sub) == _state_fingerprint(spark, table_ref)


def test_cli_maintain_and_inspect(spark, tmpdir_path, capsys):
    """The maintenance/inspection subcommands drive the lake ops end-to-end
    (in-process: get_spark reuses the session via getOrCreate)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("cdc_job", JOB)
    cdc_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cdc_job)

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=3000, n_segments=3, n_urls=200)
    table_path = os.path.join(tmpdir_path, "pages")
    CdcPipeline(spark, table_path, n_buckets=4).replay_all(binlog)

    rc = cdc_job.main(
        ["maintain", "--table", table_path, "--compact-files",
         "--rewrite-clustered", "warc_ts", "--expire-snapshots", "2",
         "--build-blooms"]
    )
    assert rc == 0
    ops = [
        __import__("json").loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert [o.get("operation") for o in ops] == [
        "compact", "expire_snapshots", "rewrite_clustered", "build_blooms",
    ]

    rc = cdc_job.main(["inspect", "--table", table_path])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    hist = [__import__("json").loads(l) for l in lines[:-1]]
    stats = __import__("json").loads(lines[-1])
    assert hist[-1]["operation"] == "build_blooms"
    assert stats["total_files"] > 0

    # table still reads correctly after the maintenance chain
    assert LakeTable.load(spark, table_path).read().count() > 0


def test_cli_tail_with_view(spark, tmpdir_path, capsys):
    """tail --view PATH:GROUP maintains a materialized view in-stream."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location("cdc_job2", JOB)
    cdc_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cdc_job)

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=2000, n_segments=2, n_urls=150)
    table_path = os.path.join(tmpdir_path, "pages")
    view_path = os.path.join(tmpdir_path, "by_lang")
    metrics_dir = os.path.join(tmpdir_path, "metrics")
    rc = cdc_job.main(
        ["tail", "--binlog", binlog, "--table", table_path,
         "--checkpoint", os.path.join(tmpdir_path, "ck"), "--buckets", "4",
         "--view", f"{view_path}:lang", "--metrics-dir", metrics_dir,
         "--timeout-secs", "300"]
    )
    assert rc == 0
    capsys.readouterr()

    # --metrics-dir landed one doc per applied micro-batch
    mfiles = sorted(f for f in os.listdir(metrics_dir) if f.startswith("batch-"))
    assert len(mfiles) > 0
    with open(os.path.join(metrics_dir, mfiles[0])) as fh:
        mdoc = json.load(fh)
    assert mdoc["n_events"] > 0 and mdoc["version"] >= 1

    from crypto_exchange_etl_spark.lake.matview import MaterializedAggregate
    from crypto_exchange_etl_spark.lake.table import LakeTable as LT

    view = MaterializedAggregate(
        spark, table_path, view_path, group_col="lang",
        sums={"n_chars": "length(text)"},
    )
    got = {r["lang"]: (r["n_rows"], r["n_chars"]) for r in view.read().collect()}
    want = {
        r["lang"]: (r["n"], r["c"])
        for r in LT.load(spark, table_path)
        .read()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.expr("length(text)"), F.lit(0))).alias("c"),
        )
        .collect()
    }
    assert got == want


def test_cli_ddl_and_dml(spark, tmpdir_path, capsys):
    """The field-id DDL and row-level DML flags drive the table from the
    job CLI (in-process session reuse)."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location("cdc_job", JOB)
    cdc_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cdc_job)

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=2000, n_segments=2, n_urls=150)
    table_path = os.path.join(tmpdir_path, "pages")
    CdcPipeline(spark, table_path, n_buckets=4).replay_all(binlog)
    n0 = LakeTable.load(spark, table_path).read().count()

    rc = cdc_job.main(
        ["maintain", "--table", table_path,
         "--rename-column", "lang:language",
         "--delete-where", "pmod(xxhash64(url), 4) = 0",
         "--update-where", "length(text) >= 0::language='xx'"]
    )
    assert rc == 0
    ops = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [o.get("operation") for o in ops] == [
        "rename_column", "delete_where", "update_where",
    ]
    t = LakeTable.load(spark, table_path)
    df = t.read()
    assert "language" in df.columns and "lang" not in df.columns
    assert df.count() == n0 - ops[1]["n_delete"]
    assert df.where("language = 'xx'").count() == df.count()

    rc = cdc_job.main(
        ["maintain", "--table", table_path, "--drop-column", "language",
         "--add-column", "score:double:0.25"]
    )
    assert rc == 0
    df = LakeTable.load(spark, table_path).read()
    assert "language" not in df.columns and "score" in df.columns
    # initial default parsed from the CLI spec fills pre-add rows
    assert df.where("score = 0.25").count() == df.count()

    # complex DDL types carry their own colons (review fix: the default
    # split must not eat them)
    rc = cdc_job.main(
        ["maintain", "--table", table_path,
         "--add-column", "meta:struct<a:int,b:string>"]
    )
    assert rc == 0
    df = LakeTable.load(spark, table_path).read()
    assert dict(df.dtypes)["meta"] == "struct<a:int,b:string>"


def test_cli_merge_subcommand(spark, tmpdir_path, capsys):
    """merge --source drives MERGE INTO from a parquet snapshot: upsert
    by default, --sync makes the table equal the snapshot."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location("cdc_job", JOB)
    cdc_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cdc_job)

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=2000, n_segments=2, n_urls=150)
    table_path = os.path.join(tmpdir_path, "pages")
    CdcPipeline(spark, table_path, n_buckets=4).replay_all(binlog)
    t = LakeTable.load(spark, table_path)
    keys = [r.url for r in t.read().select("url").orderBy("url").limit(3).collect()]

    src_path = os.path.join(tmpdir_path, "src")
    spark.createDataFrame(
        [(k, None, "sync") for k in keys],
        "url string, warc_ts timestamp, lang string",
    ).write.parquet(src_path)

    rc = cdc_job.main(
        ["merge", "--table", table_path, "--source", src_path,
         "--sync", "--no-insert", "--batch-id", "4242"]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["operation"] == "merge_into" and out["n_update"] == 3
    t = LakeTable.load(spark, table_path)
    assert sorted(r.url for r in t.read().collect()) == sorted(keys)
    assert {r.lang for r in t.read().collect()} == {"sync"}

    # exactly-once: same batch id replays as a no-op
    v = t.current_version()
    rc = cdc_job.main(
        ["merge", "--table", table_path, "--source", src_path,
         "--sync", "--no-insert", "--batch-id", "4242"]
    )
    assert rc == 0
    assert LakeTable.load(spark, table_path).current_version() == v
