"""Regression tests for the round-4 CDF/sink/consumer review findings.

Each test pins one fixed bug:

- a capped tail-default stream restart seeds its admission-control floor
  from the CHECKPOINT, not from the table's (much newer) current version
  — the old max() seeding un-capped the whole backlog into one batch;
- checkpoint floor lookup is PATH-SCOPED (a query may union two lake_cdf
  feeds over one checkpoint; the lagging table must not inherit the
  other's version);
- ``startingVersion="earliest"`` bootstraps a non-empty base snapshot
  (clone v0 / post-expiry) as inserts; a numeric start at such a base
  raises instead of silently dropping the base rows (the batch consumer
  guard, now on the format faces too);
- the pandas diff kernel compares ``lsn`` exactly past 2^53 (nullable
  Int64 through the outer merge — float64 coercion rounded packed LSNs);
- ``lake_sink`` treats a NULL op as the documented absent-op upsert and
  truncates string key stats like the merge path;
- ``ChangeFeedConsumer.lag()`` is a pure metrics probe (never raises the
  bootstrap guard).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from crypto_exchange_etl_spark.lake.cdf_source import (
    LakeCdfDataSource,
    LakeCdfStreamReader,
    _last_checkpointed_version,
    cdf_schema,
)
from crypto_exchange_etl_spark.lake.consumer import (
    ChangeFeedConsumer,
    ChangeFeedLagError,
)
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _mk(spark, path, n=6, commits=1):
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en")
        for i in range(n)
    ])
    for b in range(1, commits):
        _apply(spark, pipe, b, [
            (1000 + b, 0, "U", f"u{b % n}",
             TS + dt.timedelta(days=b), b"<p>x</p>", f"l{b}"),
        ])
    return pipe


def _cdf_batch(spark, path, **opts):
    spark.dataSource.register(LakeCdfDataSource)
    r = spark.read.format("lake_cdf").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


# ------------------------------------------------- floor seeding / paths


def _fake_ck(tmpdir_path, lines):
    ck = os.path.join(tmpdir_path, "fakeck")
    os.makedirs(os.path.join(ck, "offsets"), exist_ok=True)
    with open(os.path.join(ck, "offsets", "7"), "w") as fh:
        fh.write("v1\n{}\n")
        for o in lines:
            fh.write(json.dumps(o) + "\n")
    return ck


def test_checkpoint_version_is_path_scoped(tmpdir_path):
    a, b = "/tables/a", "/tables/b"
    ck = _fake_ck(tmpdir_path, [
        {"version": 100, "path": a},
        {"version": 10, "path": b},
    ])
    assert _last_checkpointed_version(ck, a) == 100
    assert _last_checkpointed_version(ck, b) == 10
    # legacy (untagged) offsets only count when no tagged line matches
    ck2 = _fake_ck(tmpdir_path + "2", [{"version": 42}])
    assert _last_checkpointed_version(ck2, a) == 42
    ck3 = _fake_ck(tmpdir_path + "3", [
        {"version": 42},
        {"version": 7, "path": b},
    ])
    assert _last_checkpointed_version(ck3, b) == 7


def test_capped_tail_default_restart_seeds_floor_from_checkpoint(
    spark, tmpdir_path
):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk(spark, path, n=4, commits=8)  # current version >> 2
    cur = pipe.table.current_version()
    assert cur >= 8
    # a restart: checkpoint stands at v2, table has advanced to `cur`
    ck = _fake_ck(tmpdir_path, [{"version": 2, "path": path}])
    reader = LakeCdfStreamReader(
        cdf_schema(path),
        {"path": path, "maxVersionsPerBatch": "1", "checkpointLocation": ck},
    )
    # old behavior: floor = max(current, 2) = current → first micro-batch
    # spans the whole backlog. Fixed: the checkpoint wins.
    assert reader._floor == 2
    off = reader.latestOffset()
    assert off["version"] == 3  # pages one version, not `cur`
    assert off["path"] == path  # offsets are path-tagged for restarts


# ------------------------------------------------------ earliest / base


def test_batch_earliest_bootstraps_clone_base(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src, n=6, commits=3)
    clone = os.path.join(tmpdir_path, "clone")
    pipe.table.clone_to(clone)

    # the clone's v0 is non-empty: 'earliest' emits it as inserts
    got = _cdf_batch(spark, clone, startingVersion="earliest")
    rows = got.collect()
    assert len(rows) == pipe.table.read().count()
    assert {r._change_type for r in rows} == {"insert"}
    assert {r._commit_version for r in rows} == {0}
    assert sorted(r.url for r in rows) == sorted(
        r.url for r in pipe.table.read().collect()
    )

    # after a post-clone commit, 'earliest' = base inserts + the diff
    cpipe = CdcPipeline(spark, clone, n_buckets=2)
    _apply(spark, cpipe, 99, [
        (9000, 0, "U", "u0", TS + dt.timedelta(days=30), b"<p>z</p>", "fr"),
    ])
    got2 = _cdf_batch(spark, clone, startingVersion="earliest").collect()
    assert len(got2) == len(rows) + 2  # + update pre/post images
    assert sum(r._change_type == "update_postimage" for r in got2) == 1


def test_numeric_start_at_nonempty_base_raises(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src, n=4, commits=2)
    clone = os.path.join(tmpdir_path, "clone")
    pipe.table.clone_to(clone)
    cpipe = CdcPipeline(spark, clone, n_buckets=2)
    _apply(spark, cpipe, 99, [
        (9000, 0, "U", "u0", TS + dt.timedelta(days=30), b"<p>z</p>", "fr"),
    ])

    with pytest.raises(Exception, match="non-empty|earliest"):
        _cdf_batch(spark, clone, startingVersion=1).collect()
    # explicit ack: the consumer asserts it already holds the base state
    got = _cdf_batch(
        spark, clone, startingVersion=1, allowNonEmptyBase=True
    ).collect()
    assert sum(r._change_type == "update_postimage" for r in got) == 1
    assert not any(r._commit_version == 0 for r in got)  # base NOT emitted
    # on a normal table (empty v0) numeric start keeps working unguarded
    assert _cdf_batch(spark, src, startingVersion=1).count() > 0


def test_replica_of_clone_is_complete(spark, tmpdir_path):
    from crypto_exchange_etl_spark.lake.replicate import (
        create_replica,
        replicate_stream,
    )

    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src, n=8, commits=3)
    clone = os.path.join(tmpdir_path, "clone")
    pipe.table.clone_to(clone)

    dst = os.path.join(tmpdir_path, "dst")
    ck = os.path.join(tmpdir_path, "ck")
    rep = create_replica(spark, clone, dst)
    q = replicate_stream(spark, clone, dst, ck)  # default: "earliest"
    q.awaitTermination(300)

    def canon(df):
        return sorted(
            map(tuple, df.select("url", "warc_ts", "text", "lang").collect())
        )

    # the old default (startingVersion=1) silently produced an EMPTY
    # replica here: every row lives in the clone's non-empty v0
    assert canon(rep.read()) == canon(
        spark.read.format("lake").option("path", clone).load()
    )


# ---------------------------------------------------------- lsn exactness


def test_cdf_detects_lsn_update_past_2_53(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    big = 2**53  # float64 rounds big and big+1 to the same value
    _apply(spark, pipe, 0, [(big, 0, "I", "k", TS, b"<p>a</p>", "en")])
    v1 = pipe.table.current_version()
    _apply(spark, pipe, 1, [(big + 1, 0, "U", "k", TS, b"<p>b</p>", "de")])

    got = _cdf_batch(spark, path, startingVersion=v1 + 1).collect()
    kinds = sorted(r._change_type for r in got)
    # the pre-fix float64 merge saw equal lsns (same warc_ts) → no rows
    assert kinds == ["update_postimage", "update_preimage"]
    # and it matches the Spark kernel
    spark_kinds = sorted(
        r._change_type
        for r in pipe.table.changes_between(v1, v1 + 1).collect()
    )
    assert kinds == spark_kinds


# ----------------------------------------------------------------- sink


def test_sink_null_op_is_upsert_and_stats_truncate(spark, tmpdir_path):
    from pyspark.sql import types as T

    from crypto_exchange_etl_spark.lake.table import LakeTable

    path = os.path.join(tmpdir_path, "t")
    pipe = _mk(spark, path, n=3)
    t = pipe.table

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ])
    long_a = "https://example.com/" + "a" * 80
    long_z = "https://example.com/" + "z" * 80
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame(
        [
            (long_a, TS + dt.timedelta(days=3), "aaa", "en", None, 5000),
            (long_z, TS + dt.timedelta(days=3), "zzz", "de", None, 5001),
            ("u1", TS + dt.timedelta(days=3), None, None, "D", 5002),
        ],
        schema,
    ).write.parquet(feed)
    q = (
        spark.readStream.schema(schema)
        .parquet(feed)
        .writeStream.format("lake_sink")
        .option("path", path)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = {r.url: (r.text, r.lang) for r in t.read().collect()}
    # null op rows landed as plain upserts (not rejected as op='none')
    assert rows[long_a] == ("aaa", "en")
    assert rows[long_z] == ("zzz", "de")
    assert "u1" not in rows  # the real 'D' still deletes

    # key stats truncated like the merge path: bounded manifest bytes,
    # pruning stays sound (lo <= every key, hi >= every key)
    m = t.manifest()
    deltas = [f for f in m["files"] if f.get("delta") and "url" in f["stats"]]
    assert deltas
    for f in deltas:
        lo, hi = f["stats"]["url"]
        assert len(lo) <= LakeTable._STAT_TRUNC
        assert len(hi) <= LakeTable._STAT_TRUNC + 1
    all_lo = min(lo for f in deltas for lo, _ in [f["stats"]["url"]])
    all_hi = max(hi for f in deltas for _, hi in [f["stats"]["url"]])
    assert all_lo <= long_a and all_hi >= long_z


# ------------------------------------------------------------- consumer


def test_lag_is_a_pure_probe_on_fresh_clone_consumer(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src, n=4, commits=2)
    clone = os.path.join(tmpdir_path, "clone")
    pipe.table.clone_to(clone)

    c = ChangeFeedConsumer(spark, clone, os.path.join(tmpdir_path, "cur"))
    lag = c.lag()  # must not raise: it's a health check, not delivery
    assert lag["bootstrap_required"] is True
    assert lag["versions_behind"] == 0  # clone: earliest == current == 0
    with pytest.raises(ChangeFeedLagError):
        c.poll()  # the delivery path still guards the bootstrap


# ------------------------------------------- option parsing / emit dtypes


def test_cdf_boolean_options_parse_strictly(spark, tmpdir_path):
    """Both boolean options share one strict parser: a misspelled opt-out
    (``includePreimages=off``) raises instead of silently keeping the
    old-side payload decode ON."""
    from crypto_exchange_etl_spark.lake.cdf_source import LakeCdfBatchReader

    path = os.path.join(tmpdir_path, "t")
    _mk(spark, path, n=4, commits=2)
    sch = cdf_schema(path)

    r = LakeCdfBatchReader(
        sch, {"path": path, "startingVersion": "1", "includePreimages": "FALSE"}
    )
    assert r._preimages is False
    r = LakeCdfBatchReader(
        sch, {"path": path, "startingVersion": "1", "includepreimages": " 1 "}
    )
    assert r._preimages is True
    with pytest.raises(ValueError, match="includePreimages"):
        LakeCdfBatchReader(
            sch,
            {"path": path, "startingVersion": "1", "includePreimages": "off"},
        )
    with pytest.raises(ValueError, match="allowNonEmptyBase"):
        LakeCdfBatchReader(
            sch,
            {"path": path, "startingVersion": "1", "allowNonEmptyBase": "off"},
        )


def test_cdf_emit_dtype_stable_no_future_warnings(spark, tmpdir_path):
    """The vectorized emit kernel must not walk pandas' deprecated
    empty/all-NA concat path (FutureWarning per task today; dtype flip
    under pandas 3): zero-row frames are filtered before concat and
    absent old-side columns are typed with the new side's dtype when it
    holds NA natively (datetime/float). Pinned by reading the feed
    IN-PROCESS with FutureWarning escalated to an error, over a schema
    whose payload carries double + timestamp columns (the exact dtypes
    that used to warn next to an all-NA object column)."""
    import warnings

    from pyspark.sql import types as T

    from crypto_exchange_etl_spark.lake.cdf_source import LakeCdfBatchReader

    path = os.path.join(tmpdir_path, "t")
    pipe = _mk(spark, path, n=4)  # v1: u0..u3
    t = pipe.table
    # v2: schema evolution adds double + timestamp payload columns and
    # updates u0 — the v1 old side lacks them entirely (null-fill path)
    src = spark.createDataFrame(
        [("u0", TS + dt.timedelta(days=1), 0.5, TS)],
        T.StructType([
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("seen_at", T.TimestampType(), True),
        ]),
    )
    t.merge_into(src, batch_id=101)
    # v3: delete u1 (delete frames carry all-NA payload on the old side
    # with preimages off)
    _apply(spark, pipe, 2, [
        (300, 0, "D", "u1", TS + dt.timedelta(days=2), None, None),
    ])

    for pre in ("true", "false"):
        r = LakeCdfBatchReader(
            cdf_schema(path),
            {"path": path, "startingVersion": "2", "includePreimages": pre},
        )
        rows = []
        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            for p in r.partitions():
                for b in r.read(p):
                    rows.extend(b.to_pylist())
        by_type = {}
        for row in rows:
            by_type.setdefault(row["_change_type"], []).append(row)
        upd = by_type["update_postimage"]
        assert [u["url"] for u in upd] == ["u0"]
        assert upd[0]["score"] == 0.5
        dele = by_type["delete"]
        assert [d["url"] for d in dele] == ["u1"]
        assert dele[0]["score"] is None and dele[0]["seen_at"] is None
        assert ("update_preimage" in by_type) == (pre == "true")


def test_same_table_multi_source_checkpoint_is_ambiguous(tmpdir_path):
    """Two capped lake_cdf sources over the SAME table sharing one
    checkpoint cannot be attributed their own offset line (the Python
    source API gives a restarted reader no identity): differing
    positions raise instead of seeding the lagging source's floor past
    its checkpoint (max would un-cap its backlog; min can regress the
    offset log). Equal positions stay unambiguous and fine."""
    t = "/tables/same"
    ck = _fake_ck(tmpdir_path, [
        {"version": 100, "path": t},
        {"version": 10, "path": t},
    ])
    with pytest.raises(ValueError, match="different positions"):
        _last_checkpointed_version(ck, t)
    ck2 = _fake_ck(tmpdir_path + "_eq", [
        {"version": 7, "path": t},
        {"version": 7, "path": t},
    ])
    assert _last_checkpointed_version(ck2, t) == 7


def test_stream_restart_survives_expiry_past_starting_version(
    spark, tmpdir_path
):
    """A checkpointed stream created with a numeric startingVersion must
    restart after expire_snapshots passes its original start: the
    retention guard belongs to FRESH queries only (``initialOffset``) —
    a restart resumes from its checkpointed offsets and never reads the
    expired diff base. The eager constructor-time check wedged a healthy
    weeks-old stream the first time retention lapped its birth option. A
    fresh query with the same stale option must still fail loudly."""
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk(spark, path, n=4, commits=3)  # versions 0..3
    spark.dataSource.register(LakeCdfDataSource)
    df = (
        spark.readStream.format("lake_cdf")
        .option("path", path)
        .option("startingVersion", 2)
        .load()
    )
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")

    def drain():
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    n0 = spark.read.schema(df.schema).parquet(out).count()
    assert n0 > 0  # consumed (1, 3]

    # retention laps the original start: v1 (the diff base of
    # startingVersion=2) is expired
    _apply(spark, pipe, 50, [
        (9000, 0, "U", "u0", TS + dt.timedelta(days=40), b"<p>n</p>", "fr"),
    ])
    pipe.table.expire_snapshots(keep_last=2)
    assert int(pipe.table.earliest_version()) > 1

    drain()  # restart on the SAME checkpoint: resumes past the guard
    n1 = spark.read.schema(df.schema).parquet(out).count()
    assert n1 > n0

    # the guard still protects a FRESH query (new checkpoint)
    with pytest.raises(Exception, match="outpaced|resync|earliest"):
        q2 = (
            df.writeStream.format("parquet")
            .option("path", os.path.join(tmpdir_path, "out2"))
            .option("checkpointLocation", os.path.join(tmpdir_path, "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(300)
