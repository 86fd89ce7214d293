"""The lake's Spark-format faces: ``format("lake")`` batch source with
pushdown file pruning, and ``format("lake_sink")`` exactly-once
streaming sink — plus the pure-Python XXH64 parity both rely on.

Oracles: ``LakeTable.read`` / ``scan`` / ``lookup`` (themselves verified
against brute-force reads elsewhere), and Spark's own ``xxhash64``.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import random

import pytest
from pyspark.sql import functions as F, types as T
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    IsNull,
    LessThan,
    StringStartsWith,
)

from crypto_exchange_etl_spark.lake.batch_source import (
    LakeDataSource,
    LakeReader,
    lake_schema,
)
from crypto_exchange_etl_spark.lake.stream_sink import LakeSinkDataSource, LakeSinkWriter
from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.lake.xxh64 import bucket_of, spark_xxhash64
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)

SINK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ]
)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _mk_table(spark, path, n=20, n_buckets=4, mode="cow"):
    pipe = CdcPipeline(spark, path, n_buckets=n_buckets, write_mode=mode)
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"u{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en")
        for i in range(n)
    ])
    _apply(spark, pipe, 1, [
        (1000, 0, "U", "u0", TS + dt.timedelta(days=2), b"<p>v2</p>", "de"),
        (1001, 0, "D", "u1", TS + dt.timedelta(days=2), None, None),
    ])
    return pipe


def _canon(df):
    return sorted(map(tuple, df.collect()))


def _lake(spark, path, **opts):
    reader = spark.read.format("lake").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


# ---------------------------------------------------------------- xxh64


def test_xxh64_matches_spark_xxhash64(spark):
    rnd = random.Random(7)
    strs = ["", "a", "hello", "héllo wörld 𝄞", "x" * 31, "y" * 32, "z" * 100]
    strs += [
        "".join(chr(rnd.randint(32, 0x2FFF)) for _ in range(rnd.randint(0, 80)))
        for _ in range(25)
    ]
    df = spark.createDataFrame(
        [(s,) for s in strs], T.StructType([T.StructField("s", T.StringType())])
    )
    got = df.select(
        F.xxhash64("s").alias("h"),
        F.xxhash64(F.lit(LakeTable._BLOOM_SALT), F.col("s")).alias("h2"),
    ).collect()
    salt_seed = spark_xxhash64(LakeTable._BLOOM_SALT) & 0xFFFFFFFFFFFFFFFF
    for s, r in zip(strs, got):
        assert spark_xxhash64(s) == r["h"]
        assert spark_xxhash64(s, seed=salt_seed) == r["h2"]


def test_xxh64_matches_spark_for_longs_and_binary(spark):
    longs = [0, 1, -1, 42, 2**62, -(2**62), 123456789]
    df = spark.createDataFrame(
        [(x,) for x in longs], T.StructType([T.StructField("v", T.LongType())])
    )
    for x, r in zip(longs, df.select(F.xxhash64("v").alias("h")).collect()):
        assert spark_xxhash64(x) == r["h"]
    bins = [b"", b"\x00", bytes(range(256)), b"abc" * 11]
    dfb = spark.createDataFrame(
        [(x,) for x in bins], T.StructType([T.StructField("v", T.BinaryType())])
    )
    for x, r in zip(bins, dfb.select(F.xxhash64("v").alias("h")).collect()):
        assert spark_xxhash64(x) == r["h"]


def test_bucket_of_matches_table_bucket_expr(spark):
    urls = [f"https://e{i}.com/p{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(u,) for u in urls], T.StructType([T.StructField("url", T.StringType())])
    )
    got = df.select(
        F.pmod(F.xxhash64("url"), F.lit(8)).cast("int").alias("b")
    ).collect()
    for u, r in zip(urls, got):
        assert bucket_of(u, 8) == r["b"]


# ---------------------------------------------------------- lake source


def test_lake_source_full_read_parity_cow(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path)
    df = _lake(spark, path)
    assert _canon(df) == _canon(pipe.table.read())
    # Python data sources surface every column nullable — names and types
    # must still match the table's logical schema exactly
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in pipe.table.read().schema.fields
    ]


def test_lake_source_full_read_parity_mor(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, mode="mor")
    t = pipe.table
    assert any(f.get("delta") for f in t.manifest()["files"])
    df = _lake(spark, path)
    assert _canon(df) == _canon(t.read())
    # key with base+delta versions folds to the delta winner through the
    # source even when the equality predicate prunes to one bucket class
    got = _lake(spark, path).where(F.col("url") == "u0").collect()
    assert len(got) == 1 and bytes(got[0].html) == b"<p>v2</p>"
    assert _lake(spark, path).where(F.col("url") == "u1").count() == 0


def test_lake_source_sql_face(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    _mk_table(spark, path)
    _lake(spark, path).createOrReplaceTempView("pages_v")
    got = {
        r.lang: r.n
        for r in spark.sql(
            "SELECT lang, count(*) AS n FROM pages_v GROUP BY lang"
        ).collect()
    }
    assert got == {"en": 18, "de": 1}


def test_lake_source_time_travel(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path)
    t = pipe.table
    assert _canon(_lake(spark, path, versionAsOf=1)) == _canon(t.read(version=1))
    t.create_tag("rel", version=1)
    assert _canon(_lake(spark, path, versionAsOf="rel")) == _canon(t.read(version=1))
    when = t.manifest(1)["committed_at_unix"]
    assert _canon(_lake(spark, path, timestampAsOf=str(when))) == _canon(
        t.read(version=1)
    )
    with pytest.raises(Exception):
        _lake(spark, path, versionAsOf=1, timestampAsOf=str(when)).collect()


def test_lake_source_after_ddl(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path)
    t = pipe.table
    t.rename_column("lang", "language")
    t.add_column("grade", T.DoubleType(), default=1.5)
    df = _lake(spark, path)
    assert _canon(df) == _canon(t.read())
    r = df.where(F.col("url") == "u5").collect()[0]
    assert r.language == "en" and r.grade == 1.5


def _planned_files(path, filters):
    rd = LakeReader(lake_schema({"path": path}), {"path": path})
    if filters:
        rd.pushFilters(filters)
    parts = rd.partitions()
    return sum(len(p.files) for p in parts), parts


def test_lake_source_key_pruning(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=40)
    total, _ = _planned_files(path, None)
    pruned, _ = _planned_files(path, [EqualTo(("url",), "u5")])
    assert pruned < total and pruned >= 1
    # absent key with blooms built: every file pruned
    pipe.table.build_blooms()
    none_left, parts = _planned_files(path, [EqualTo(("url",), "nope://x")])
    assert none_left == 0
    # IN keeps files for every probed key
    k, _ = _planned_files(path, [In(("url",), ("u5", "u6"))])
    assert 1 <= k <= total
    got = _lake(spark, path).where(F.col("url").isin("u5", "u6"))
    assert _canon(got) == _canon(
        pipe.table.read().where(F.col("url").isin("u5", "u6"))
    )


def test_lake_source_prefix_pruning(spark, tmpdir_path):
    # url LIKE 'prefix%' — the dominant selective predicate on a
    # url-keyed web-pages table (domain scans). Planning prunes files
    # whose manifest key min/max range cannot contain ANY key matching
    # every pushed prefix; per-key predicate ⇒ safe even in MOR folds.
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=8, write_mode="mor")
    _apply(spark, pipe, 0, [
        (i, 0, "I", f"https://{d}.example/p{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en")
        for i, d in enumerate(["aaa"] * 6 + ["zzz"] * 6)
    ])
    # a MOR delta touching both domains: update one zzz key, delete another
    _apply(spark, pipe, 1, [
        (100, 0, "U", "https://zzz.example/p6", TS + dt.timedelta(days=1),
         b"<p>v2</p>", "de"),
        (101, 0, "D", "https://zzz.example/p7", TS + dt.timedelta(days=1),
         None, None),
    ])
    total, _ = _planned_files(path, None)
    pruned, _ = _planned_files(
        path, [StringStartsWith(("url",), "https://zzz")]
    )
    assert pruned < total
    got = _lake(spark, path).where(F.col("url").startswith("https://zzz"))
    want = pipe.table.read().where(F.col("url").startswith("https://zzz"))
    assert _canon(got) == _canon(want)
    r = {x.url: x for x in got.collect()}
    assert bytes(r["https://zzz.example/p6"].html) == b"<p>v2</p>"  # LWW won
    assert "https://zzz.example/p7" not in r  # tombstone not resurrected
    # prefix matching nothing: stats alone prune every file
    n0, _ = _planned_files(path, [StringStartsWith(("url",), "urn:")])
    assert n0 == 0
    # conjunctive prefixes: contradictory pair prunes everything too
    n1, _ = _planned_files(
        path,
        [
            StringStartsWith(("url",), "https://aaa"),
            StringStartsWith(("url",), "https://zzz"),
        ],
    )
    assert n1 == 0


def test_lake_source_generic_column_pruning(spark, tmpdir_path):
    # Iceberg-column-metrics tier: ANY pushed predicate prunes on the
    # manifest's per-file min/max. Payload columns prune only standalone
    # base files (MOR fold groups unsafe); the key column stays fold-safe.
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=30)
    total, _ = _planned_files(path, None)
    assert total > 0
    # lang='fr' appears nowhere: stats alone prune every file (CoW table
    # has no deltas, every base file is standalone)
    n0, _ = _planned_files(path, [EqualTo(("lang",), "fr")])
    assert n0 == 0
    # in-range predicate keeps files and result parity holds end-to-end
    got = _lake(spark, path).where(F.col("lang") == "de")
    assert _canon(got) == _canon(pipe.table.read().where(F.col("lang") == "de"))
    # text-column stats are truncated in the manifest but remain sound:
    # a startswith on text still prunes when the range excludes it
    for f in pipe.table.manifest()["files"]:
        st = (f.get("stats") or {}).get("text")
        if st is not None:
            assert len(st[0]) <= 32 and len(st[1]) <= 33
    n1, _ = _planned_files(path, [StringStartsWith(("text",), "zzzz-no-such")])
    assert n1 == 0
    # MOR: payload pruning must not reach into fold groups — u0's lang
    # changed en→de in a delta; filtering the OLD value must not
    # resurrect the old row, and the NEW value must fold through
    mor = os.path.join(tmpdir_path, "mor")
    mpipe = _mk_table(spark, mor, n=30, mode="mor")
    for pred in ("en", "de"):
        got = _lake(spark, mor).where(F.col("lang") == pred)
        want = mpipe.table.read().where(F.col("lang") == pred)
        assert _canon(got) == _canon(want)
    urls_de = {r.url for r in _lake(spark, mor).where(F.col("lang") == "de").collect()}
    assert urls_de == {"u0"}
    # null-count tier: only the tombstone-bearing file has lang nulls, so
    # IS NULL prunes the rest; result parity (empty — tombstones hidden)
    n_null, _ = _planned_files(path, [IsNull(("lang",))])
    assert 0 < n_null < total
    assert _lake(spark, path).where(F.col("lang").isNull()).count() == 0
    got = _lake(spark, path).where(F.col("lang").isNotNull())
    assert _canon(got) == _canon(pipe.table.read().where(F.col("lang").isNotNull()))


def test_lake_source_pruned_to_zero_executes(spark, tmpdir_path):
    # planning that prunes EVERY file must still execute: Spark hands
    # read(None) to a source whose partitions() returned an empty list
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=8)
    df = _lake(spark, path)
    assert df.where(F.col("url") == "nope://x").count() == 0
    assert df.where(F.col("lang") == "fr").count() == 0
    # lake_cdf batch face over a metadata-only commit range, same shape
    pipe.table.rename_column("lang", "language")
    v = pipe.table.current_version()
    n = (
        spark.read.format("lake_cdf")
        .option("path", path)
        .option("startingVersion", v)
        .load()
        .count()
    )
    assert n == 0


def test_stat_excludes_unit():
    from crypto_exchange_etl_spark.lake.batch_source import (
        _stat_excludes,
        _norm_stat_probe,
    )
    from crypto_exchange_etl_spark.lake.table import LakeTable

    assert _stat_excludes(10, 20, "eq", 25) and not _stat_excludes(10, 20, "eq", 15)
    assert _stat_excludes(10, 20, "gt", 20) and not _stat_excludes(10, 20, "gt", 19)
    assert _stat_excludes(10, 20, "ge", 21) and not _stat_excludes(10, 20, "ge", 20)
    assert _stat_excludes(10, 20, "lt", 10) and not _stat_excludes(10, 20, "lt", 11)
    assert _stat_excludes(10, 20, "le", 9) and not _stat_excludes(10, 20, "le", 10)
    assert _stat_excludes(10, 20, "in", [1, 30]) and not _stat_excludes(10, 20, "in", [1, 15])
    # type mismatch keeps the file
    assert not _stat_excludes(10, 20, "eq", "x")
    assert not _stat_excludes("a", "b", "gt", 5)
    # timestamp probes compare in the stats' micros encoding
    mu = _norm_stat_probe(dt.datetime(2024, 1, 1))
    assert _stat_excludes(mu + 1, mu + 9, "eq", dt.datetime(2024, 1, 1))
    # truncation soundness: bounds widen, never shrink
    long_s = "x" * 100 + "tail"
    up = LakeTable._stat_upper(long_s)
    assert len(up) <= 32 and up > long_s
    assert long_s[:32] <= long_s


def test_lake_source_ts_pruning_cow_and_mor(spark, tmpdir_path):
    cow = os.path.join(tmpdir_path, "cow")
    pipe = _mk_table(spark, cow, n=40)
    hi = dt.datetime(2023, 12, 31)  # everything is later
    n, _ = _planned_files(cow, [LessThan(("warc_ts",), hi)])
    assert n == 0
    lo = dt.datetime(2024, 6, 1)  # only the day-2 update is NOT before this
    n2, total = _planned_files(cow, [GreaterThanOrEqual(("warc_ts",), lo)])
    assert n2 == 0  # update rewrote its bucket; files all end before June
    # MOR: an upper bound may NOT prune delta-affected buckets
    mor = os.path.join(tmpdir_path, "mor")
    mpipe = _mk_table(spark, mor, n=40, mode="mor")
    want = mpipe.table.read().where(F.col("warc_ts") < dt.datetime(2024, 1, 1, 12))
    got = _lake(spark, mor).where(F.col("warc_ts") < dt.datetime(2024, 1, 1, 12))
    assert _canon(got) == _canon(want)
    # lower bound still prunes settled delta files safely
    want2 = mpipe.table.read().where(
        F.col("warc_ts") >= dt.datetime(2024, 1, 2)
    )
    got2 = _lake(spark, mor).where(F.col("warc_ts") >= dt.datetime(2024, 1, 2))
    assert _canon(got2) == _canon(want2)


def test_lake_source_registered_by_session(spark, tmpdir_path):
    # get_spark auto-registers the formats — no manual register() needed
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=5)
    assert _canon(spark.read.format("lake").option("path", path).load()) == _canon(
        pipe.table.read()
    )


# ------------------------------------------------------------ lake sink


def _run_sink(spark, feed, path, ck, sink_id=None):
    w = (
        spark.readStream.schema(SINK_SCHEMA)
        .parquet(feed)
        .writeStream.format("lake_sink")
        .option("path", path)
        .option("checkpointLocation", ck)
    )
    if sink_id:
        w = w.option("sinkId", sink_id)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(300)


def test_sink_upsert_delete_insert(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=10)
    t = pipe.table
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame(
        [
            ("u2", TS + dt.timedelta(days=3), "fresh", "de", "U", 5000),
            ("u3", TS + dt.timedelta(days=3), None, None, "D", 5001),
            ("unew", TS + dt.timedelta(days=3), "brand new", "fr", "I", 5002),
        ],
        SINK_SCHEMA,
    ).write.parquet(feed)
    v0 = t.current_version()
    _run_sink(spark, feed, path, os.path.join(tmpdir_path, "ck"))
    assert t.current_version() == v0 + 1
    assert t.manifest()["summary"]["operation"] == "sink_append"
    rows = {r.url: (r.text, r.lang) for r in t.read().collect()}
    assert rows["u2"] == ("fresh", "de")
    assert "u3" not in rows
    assert rows["unew"] == ("brand new", "fr")
    # untouched keys keep their payload; sink-absent columns null out only
    # on the keys the sink rewrote
    html = {r.url: r.html for r in t.read_physical().collect()}
    assert bytes(html["u5"]) == b"<p>5</p>" and html["u2"] is None
    # appended as MOR deltas with manifest stats (pruning stays armed)
    added = [f for f in t.manifest()["files"] if f.get("delta")]
    assert added and all("stats" in f and f["rows"] >= 1 for f in added)
    # ledger row recorded under the external-sink lineage partition; ops
    # classified by the feed's own codes (U tallies as upsert, not insert)
    led = t.ledger().where(F.col("partition") == -2).collect()
    assert len(led) == 1 and led[0].n_events == 3 and led[0].n_delete == 1
    assert led[0].n_insert == 1 and led[0].n_update == 1
    summ = t.manifest()["summary"]
    assert summ["n_insert"] == 1 and summ["n_update"] == 1


def test_sink_exactly_once_and_guard(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=6)
    t = pipe.table
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame(
        [("u0", TS + dt.timedelta(days=3), "x", "en", "U", 9000)], SINK_SCHEMA
    ).write.parquet(feed)
    ck = os.path.join(tmpdir_path, "ck")
    _run_sink(spark, feed, path, ck)
    v1 = t.current_version()
    state = _canon(t.read())
    # same checkpoint: the stream has nothing new — no commit
    _run_sink(spark, feed, path, ck)
    assert t.current_version() == v1
    # fresh checkpoint, same sinkId: batch 0 replays, the applied-batches
    # guard eats it and its files
    _run_sink(spark, feed, path, os.path.join(tmpdir_path, "ck2"))
    assert t.current_version() == v1 and _canon(t.read()) == state
    files_on_disk = glob.glob(os.path.join(path, "data", "sink-*", "*", "*.parquet"))
    assert len(files_on_disk) == sum(
        1 for f in t.manifest()["files"] if f["path"].startswith("data/sink-")
    )
    # a DIFFERENT sinkId is a different producer: its batch 0 applies
    _run_sink(spark, feed, path, os.path.join(tmpdir_path, "ck3"), sink_id="other")
    assert t.current_version() == v1 + 1
    assert _canon(t.read()) == state  # same rows → same LWW state


def test_sink_without_op_and_lsn_upserts(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=4)
    t = pipe.table
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    feed = os.path.join(tmpdir_path, "feed")
    late = TS + dt.timedelta(days=5)
    spark.createDataFrame([("u0", late, "plain upsert")], schema).write.parquet(feed)
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
    r = {x.url: x for x in t.read().collect()}["u0"]
    assert r.text == "plain upsert" and r.lang is None
    phys = t.read_physical().where(F.col("url") == "u0").collect()[0]
    # derived lsn = warc_ts unix micros
    assert phys.lsn == int(late.timestamp() * 1_000_000)


def test_sink_validates_input(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    _mk_table(spark, path, n=3)
    bad = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("bogus", T.StringType()),
        ]
    )
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame([("u0", TS, "x")], bad).write.parquet(feed)
    with pytest.raises(Exception, match="outside the table schema"):
        q = (
            spark.readStream.schema(bad)
            .parquet(feed)
            .writeStream.format("lake_sink")
            .option("path", path)
            .option("checkpointLocation", os.path.join(tmpdir_path, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    no_key = T.StructType([T.StructField("warc_ts", T.TimestampType())])
    feed2 = os.path.join(tmpdir_path, "feed2")
    spark.createDataFrame([(TS,)], no_key).write.parquet(feed2)
    with pytest.raises(Exception, match="must carry"):
        q = (
            spark.readStream.schema(no_key)
            .parquet(feed2)
            .writeStream.format("lake_sink")
            .option("path", path)
            .option("checkpointLocation", os.path.join(tmpdir_path, "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


def test_sink_precomputed_bucket_column(spark, tmpdir_path):
    """option('bucketColumn'): a JVM-precomputed pmod(xxhash64(key), n)
    column replaces the sink task's per-row Python hash — final state
    identical to the Python-hash path — while a column computed under a
    WRONG n fails the batch loudly and commits nothing."""
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=10)
    t = pipe.table
    n_buckets = int(t.manifest()["n_buckets"])
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame(
        [
            ("u2", TS + dt.timedelta(days=3), "fresh", "de", "U", 5000),
            ("u3", TS + dt.timedelta(days=3), None, None, "D", 5001),
            ("unew", TS + dt.timedelta(days=3), "brand new", "fr", "I", 5002),
        ],
        SINK_SCHEMA,
    ).write.parquet(feed)

    def _stream(n, ck, sink_id):
        q = (
            spark.readStream.schema(SINK_SCHEMA)
            .parquet(feed)
            .withColumn(
                "__bucket__",
                F.pmod(F.xxhash64(F.col("url")), F.lit(n)).cast("long"),
            )
            .writeStream.format("lake_sink")
            .option("path", path)
            .option("bucketColumn", "__bucket__")
            .option("sinkId", sink_id)
            .option("checkpointLocation", os.path.join(tmpdir_path, ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _stream(n_buckets, "ck", "s1")
    rows = {r.url: (r.text, r.lang) for r in t.read().collect()}
    assert rows["u2"] == ("fresh", "de")
    assert "u3" not in rows
    assert rows["unew"] == ("brand new", "fr")
    # the landed delta files sit in the buckets the MERGE PATH would pick
    # (folds/lookups depend on it)
    from crypto_exchange_etl_spark.lake.xxh64 import bucket_of

    for f in t.manifest()["files"]:
        if f.get("delta"):
            key_lo = f["stats"]["url"][0]
            assert f["bucket"] == bucket_of(key_lo, n_buckets)
    # wrong n: sample verification fails the batch, nothing commits
    v = t.current_version()
    # (either check can fire first: out-of-range for claims ≥ n, or the
    # sampled hash mismatch — both carry the option name)
    with pytest.raises(Exception, match="bucketColumn"):
        _stream(n_buckets + 3, "ck_bad", "s2")
    assert t.current_version() == v
    # missing column: rejected at plan time
    with pytest.raises(Exception, match="not in the input schema"):
        q = (
            spark.readStream.schema(SINK_SCHEMA)
            .parquet(feed)
            .writeStream.format("lake_sink")
            .option("path", path)
            .option("bucketColumn", "__bucket__")
            .option("sinkId", "s3")
            .option("checkpointLocation", os.path.join(tmpdir_path, "ck3"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


def test_sink_preserves_big_longs_alongside_tombstones(spark, tmpdir_path):
    # nulling tombstone payloads must not upcast sibling int64 values
    # through float64 (2^53+1 would silently round to 2^53)
    path = os.path.join(tmpdir_path, "t")
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("big", T.LongType()),
    ])
    LakeTable.create(spark, path, schema, key="url", n_buckets=2)
    feed_schema = T.StructType([
        *schema.fields,
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ])
    big = (1 << 53) + 1
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame(
        [
            ("a", TS, big, "U", 1),
            ("b", TS, 7, "D", 2),
            ("c", TS, -big, "I", 3),
        ],
        feed_schema,
    ).write.parquet(feed)
    q = (
        spark.readStream.schema(feed_schema).parquet(feed)
        .writeStream.format("lake_sink")
        .option("path", path)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.url: r.big for r in LakeTable.load(spark, path).read().collect()}
    assert got == {"a": big, "c": -big}


def test_sink_rejects_mistyped_columns(spark, tmpdir_path):
    # a mis-typed key/payload would hash to the wrong bucket and be
    # coerced silently by the arrow cast — the writer must refuse upfront
    path = os.path.join(tmpdir_path, "t")
    _mk_table(spark, path, n=3)
    bad = T.StructType([
        T.StructField("url", T.LongType()),  # table key is string
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
    ])
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame([(123, TS, "en")], bad).write.parquet(feed)
    with pytest.raises(Exception, match="types do not match"):
        q = (
            spark.readStream.schema(bad).parquet(feed)
            .writeStream.format("lake_sink")
            .option("path", path)
            .option("checkpointLocation", os.path.join(tmpdir_path, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


def test_cdf_detects_equal_lsn_warc_ts_update(spark, tmpdir_path):
    # an update that won LWW on warc_ts with an EQUAL lsn must still
    # emit a change (rank compare, not lsn compare)
    path = os.path.join(tmpdir_path, "t")
    pipe = CdcPipeline(spark, path, n_buckets=2)
    _apply(spark, pipe, 0, [(5, 0, "I", "k", TS, b"<p>v1</p>", "en")])
    _apply(spark, pipe, 1, [
        (5, 0, "U", "k", TS + dt.timedelta(hours=1), b"<p>v2</p>", "en")
    ])
    assert bytes(pipe.table.read().collect()[0].html) == b"<p>v2</p>"
    ch = pipe.table.changes_between(1, 2).collect()
    kinds = {r._change_type for r in ch}
    assert kinds == {"update_preimage", "update_postimage"}
    post = [r for r in ch if r._change_type == "update_postimage"][0]
    assert bytes(post.html) == b"<p>v2</p>"
    # and the streaming CDF worker applies the same rank rule
    n = (
        spark.read.format("lake_cdf")
        .option("path", path)
        .option("startingVersion", 2)
        .load()
        .count()
    )
    assert n == 2


def test_sink_commit_is_idempotent_and_compactable(spark, tmpdir_path):
    """Direct driver-side commit replay: the second commit of one batch
    id drops its own files and leaves the version chain alone; a later
    minor_compact folds the sink deltas like any merge delta."""
    import pyarrow as pa

    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=8, mode="mor")
    t = pipe.table
    w = LakeSinkWriter(SINK_SCHEMA, {"path": path})
    batch = pa.record_batch(
        {
            "url": ["u0", "zz-new"],
            "warc_ts": pa.array(
                [TS + dt.timedelta(days=9)] * 2, pa.timestamp("us", tz="UTC")
            ),
            "text": ["sinked", "other"],
            "lang": ["en", "en"],
            "op": ["U", "I"],
            "lsn": pa.array([7000, 7001], pa.int64()),
        }
    )
    msg = w.write(iter([batch]))
    v0 = t.current_version()
    w.commit([msg], batchId=0)
    assert t.current_version() == v0 + 1
    # replay: same batch id, freshly written files
    msg2 = w.write(iter([batch]))
    staged = [e["path"] for e in msg2.entries]
    w.commit([msg2], batchId=0)
    assert t.current_version() == v0 + 1
    assert all(not os.path.exists(os.path.join(path, p)) for p in staged)
    state = _canon(t.read())
    t.minor_compact()
    assert _canon(t.read()) == state
    assert {r.url: r.text for r in t.read().collect()}["u0"] == "sinked"


def test_lake_source_metadata_tables(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=10)
    t = pipe.table
    t.create_tag("rel", version=1)
    for kind in ("files", "snapshots", "refs", "partitions", "columns", "ledger"):
        got = (
            spark.read.format("lake")
            .option("path", path)
            .option("metadataTable", kind)
            .load()
        )
        want = t.metadata_table(kind)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), kind
        assert [f.name for f in got.schema.fields] == [f.name for f in want.schema.fields]
    # SQL-composable: files-per-bucket straight from SQL
    (
        spark.read.format("lake").option("path", path)
        .option("metadataTable", "files").load()
        .createOrReplaceTempView("t_files")
    )
    n = spark.sql("SELECT sum(bytes) FROM t_files").collect()[0][0]
    assert n == sum(f["bytes"] for f in t.manifest()["files"])


def test_sink_after_schema_evolution_column_order(spark, tmpdir_path):
    """Evolved tables interleave lsn between payload columns in the
    stored physical schema; the sink's parquet layout must follow it
    (the arrow cast is order-sensitive — regression guard)."""
    import pyarrow as pa

    path = os.path.join(tmpdir_path, "t")
    pipe = _mk_table(spark, path, n=4)
    t = pipe.table
    extra = spark.createDataFrame(
        [("u9", TS + dt.timedelta(days=1), 0.7)],
        T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("grade", T.DoubleType()),
        ]),
    )
    t.merge_into(extra, when_matched_update="*", when_not_matched_insert="*")
    in_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("grade", T.DoubleType()),
        T.StructField("lsn", T.LongType()),
    ])
    w = LakeSinkWriter(in_schema, {"path": path})
    batch = pa.record_batch({
        "url": ["u0"],
        "warc_ts": pa.array([TS + dt.timedelta(days=3)], pa.timestamp("us", tz="UTC")),
        "grade": pa.array([0.25], pa.float64()),
        "lsn": pa.array([8000], pa.int64()),
    })
    msg = w.write(iter([batch]))
    w.commit([msg], batchId=0)
    rows = {r.url: r for r in t.read().collect()}
    assert rows["u0"].grade == 0.25 and rows["u9"].grade == 0.7
    # full read still parses every file (mixed pre/post-evolution
    # layouts); u1 was deleted in _mk_table → u0, u2, u3, u9 live
    assert t.read().count() == 4


def test_sink_bucket_column_reserved_names_rejected(spark, tmpdir_path):
    """bucketColumn='lsn'/'op' is rejected at plan time: write() pops both
    for their own semantics BEFORE bucketing, so accepting them used to
    silently degrade every batch to the per-row Python hash with the
    option ignored — the opposite of the option's fail-loud contract."""
    path = os.path.join(tmpdir_path, "t")
    _mk_table(spark, path, n=4)
    feed = os.path.join(tmpdir_path, "feed")
    spark.createDataFrame(
        [("u0", TS + dt.timedelta(days=1), "x", "en", "U", 100)],
        SINK_SCHEMA,
    ).write.parquet(feed)
    for reserved in ("lsn", "op"):
        with pytest.raises(Exception, match="dedicated column"):
            q = (
                spark.readStream.schema(SINK_SCHEMA)
                .parquet(feed)
                .writeStream.format("lake_sink")
                .option("path", path)
                .option("bucketColumn", reserved)
                .option("sinkId", f"s_{reserved}")
                .option(
                    "checkpointLocation",
                    os.path.join(tmpdir_path, f"ck_{reserved}"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
