"""Field-id schema evolution: rename/drop columns as metadata-only DDL.

Iceberg-style: every column carries a FIELD ID; data files record the
schema epoch they were written under, and the read path resolves physical
names per epoch by id (``LakeTable._read_raw``). Reference analogue: the
static schema-family splicing between table generations
(/root/reference/fintick/bqloader/schema.py:23-47) — here made dynamic
with ids so renames/drops never rewrite history and re-added names never
resurrect dropped values.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _batch(spark, rows, extra_fields=()):
    schema = T.StructType(list(CHANGES_SCHEMA.fields) + list(extra_fields))
    return spark.createDataFrame(rows, schema)


def _seed(spark, path, write_mode="cow", n=3):
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode=write_mode)
    rows = [
        (i + 1, 0, "I", f"u{i}", TS + dt.timedelta(hours=i), f"<p>{i}</p>".encode(), "en")
        for i in range(n)
    ]
    pipe.apply_batch(_batch(spark, rows), batch_id=0)
    return pipe


def test_rename_is_metadata_only(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    files_before = [f["path"] for f in t.manifest()["files"]]
    s = t.rename_column("lang", "language")
    assert s["operation"] == "rename_column" and s["field_id"] == s["field_id"]

    m = t.manifest()
    # no data file touched or re-stamped
    assert [f["path"] for f in m["files"]] == files_before
    assert all("epoch" not in f for f in m["files"])  # still epoch 0
    assert len(m["schema_epochs"]) == 2

    out = {r.url: r.language for r in t.read().collect()}
    assert out == {"u0": "en", "u1": "en", "u2": "en"}
    assert "lang" not in t.read().columns


def test_merge_after_rename_binds_by_current_name(spark, tmpdir_path):
    """After lang→language, a batch still carrying 'lang' evolves a NEW
    column 'lang' (fresh field id) — old values never leak into it, and
    the renamed column survives for untouched rows."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.rename_column("lang", "language")
    pipe.apply_batch(
        _batch(spark, [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "fr")]),
        batch_id=1,
    )
    t = pipe.table
    rows = {r.url: (r.language, r.lang) for r in t.read().collect()}
    # updated row: incoming batch bound 'lang' (new id), 'language' null
    assert rows["u0"] == (None, "fr")
    # untouched rows keep the renamed value; new 'lang' is null (no leak)
    assert rows["u1"] == ("en", None)
    assert rows["u2"] == ("en", None)
    # ids: 'lang' was re-minted, not reused
    m = t.manifest()
    assert m["field_ids"]["lang"] != m["field_ids"]["language"]
    assert len(m["schema_epochs"]) == 3  # create, rename, add


def test_drop_then_readd_never_resurrects(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    # add content_type via batch evolution
    pipe.apply_batch(
        _batch(
            spark,
            [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>a</p>", "en", "text/html")],
            extra_fields=[T.StructField("content_type", T.StringType(), True)],
        ),
        batch_id=1,
    )
    t = pipe.table
    assert {r.url: r.content_type for r in t.read().collect()}["u0"] == "text/html"

    t.drop_column("content_type")
    assert "content_type" not in t.read().columns

    # re-add the same name: fresh field id ⇒ pre-drop bytes stay invisible
    pipe.apply_batch(
        _batch(
            spark,
            [(20, 0, "U", "u1", TS + dt.timedelta(days=2), b"<p>b</p>", "en", "app/json")],
            extra_fields=[T.StructField("content_type", T.StringType(), True)],
        ),
        batch_id=2,
    )
    t = pipe.table
    rows = {r.url: r.content_type for r in t.read().collect()}
    assert rows["u1"] == "app/json"
    assert rows["u0"] is None  # NOT "text/html" — no resurrection
    assert rows["u2"] is None


def test_structural_columns_are_protected(spark, tmpdir_path):
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    for col in ("url", "warc_ts"):
        with pytest.raises(ValueError, match="structural"):
            t.rename_column(col, "x")
        with pytest.raises(ValueError, match="structural"):
            t.drop_column(col)
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("lang", "text")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")


def test_time_travel_sees_pre_ddl_schema(spark, tmpdir_path):
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    v0 = t.current_version()
    t.rename_column("lang", "language")
    t.drop_column("html")
    cur = t.read()
    assert "language" in cur.columns and "html" not in cur.columns
    old = t.read(version=v0)
    assert "lang" in old.columns and "html" in old.columns
    assert {r.url: r.lang for r in old.collect()} == {"u0": "en", "u1": "en", "u2": "en"}


def test_mor_delta_folds_across_epochs(spark, tmpdir_path):
    """Merge-on-read: base files at epoch 0, a rename, then delta files at
    epoch 2 — the LWW fold runs over the union of both epochs with the
    renamed column resolved by id."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"), write_mode="mor")
    t = pipe.table
    t.rename_column("lang", "language")
    pipe.apply_batch(
        _batch(spark, [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "de")]),
        batch_id=1,
    )
    t = pipe.table
    m = t.manifest()
    assert any(f.get("delta") and f.get("epoch") == 2 for f in m["files"])
    rows = {r.url: (r.language, r.lang) for r in t.read().collect()}
    assert rows["u0"] == (None, "de")  # delta winner, name-bound 'lang'
    assert rows["u1"] == ("en", None)

    # point lookup goes through the same epoch-aware read
    assert t.lookup("u1").collect()[0].language == "en"

    # compaction rewrites everything at the CURRENT epoch; the fast
    # single-scan path applies again afterwards
    t.compact_files(target_file_bytes=1 << 30)
    t = pipe.table
    m = t.manifest()
    cur = len(m["schema_epochs"]) - 1
    assert all(f.get("epoch", 0) == cur for f in m["files"])
    rows2 = {r.url: (r.language, r.lang) for r in t.read().collect()}
    assert rows2 == rows


def test_scan_prunes_with_renamed_stats(spark, tmpdir_path):
    """Manifest ts stats were recorded under write-time names; pruning and
    range scans must keep working across epochs (warc_ts itself is
    structural, so this exercises the epoch-stat lookup path staying
    consistent for unrenamed columns after OTHER columns changed)."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.rename_column("lang", "language")
    pipe.apply_batch(
        _batch(spark, [(10, 0, "I", "u9", TS + dt.timedelta(days=30), b"<p>9</p>", "fr")]),
        batch_id=1,
    )
    t = pipe.table
    plan = t.scan_file_plan(ts_from=TS + dt.timedelta(days=29))
    assert plan["n_chosen"] < plan["n_candidates"]
    got = t.scan(ts_from=TS + dt.timedelta(days=29)).collect()
    assert [r.url for r in got] == ["u9"]


def test_changes_between_across_rename(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.rename_column("lang", "language")
    v_ddl = t.current_version()
    # DDL touches no data: the change feed for that version is empty
    assert t.changes_between(v_ddl - 1, v_ddl).count() == 0
    pipe.apply_batch(
        _batch(spark, [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "fr")]),
        batch_id=1,
    )
    t = pipe.table
    cdf = t.changes_between(v_ddl, t.current_version())
    chg = {(r.url, r._change_type) for r in cdf.collect()}
    assert ("u0", "update_postimage") in chg or ("u0", "insert") in chg
    # the old side's renamed column mapped by id — u0's preimage carries
    # language='en', not null
    pre = [r for r in cdf.collect() if r._change_type == "update_preimage"]
    if pre:
        assert pre[0].language == "en"


def test_add_column_is_metadata_only(spark, tmpdir_path):
    """Explicit addColumn DDL: nullable column appended with a fresh
    field id; no data file touched; existing rows read null; the next
    merge batch carrying the column binds to the SAME id (no re-add)."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    files_before = [f["path"] for f in t.manifest()["files"]]
    s = t.add_column("content_type", "string")
    assert s["operation"] == "add_column" and s["type"] == "string"

    m = t.manifest()
    assert [f["path"] for f in m["files"]] == files_before
    assert m["field_ids"]["content_type"] == s["field_id"]
    assert m["next_field_id"] == s["field_id"] + 1

    rows = {r.url: r.content_type for r in t.read().collect()}
    assert rows == {"u0": None, "u1": None, "u2": None}

    # a batch now carrying the column binds to the declared id — the
    # epoch count stays put (no implicit add on top of the DDL add)
    epochs_before = len(m["schema_epochs"])
    pipe.apply_batch(
        _batch(
            spark,
            [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>a</p>", "en", "text/html")],
            extra_fields=[T.StructField("content_type", T.StringType(), True)],
        ),
        batch_id=1,
    )
    t = pipe.table
    m = t.manifest()
    assert m["field_ids"]["content_type"] == s["field_id"]
    assert len(m["schema_epochs"]) == epochs_before
    got = {r.url: r.content_type for r in t.read().collect()}
    assert got["u0"] == "text/html" and got["u1"] is None


def test_add_after_drop_never_resurrects(spark, tmpdir_path):
    """DDL re-add of a previously dropped name mints a fresh id — the
    dropped bytes stay invisible (same property as batch-evolved re-add,
    here via the explicit DDL path)."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    pipe.apply_batch(
        _batch(
            spark,
            [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>a</p>", "en", "text/html")],
            extra_fields=[T.StructField("content_type", T.StringType(), True)],
        ),
        batch_id=1,
    )
    t = pipe.table
    dropped = t.drop_column("content_type")
    s = t.add_column("content_type", T.StringType())
    assert s["field_id"] != dropped["field_id"]
    rows = {r.url: r.content_type for r in t.read().collect()}
    assert rows["u0"] is None  # NOT "text/html"


def test_add_column_validation(spark, tmpdir_path):
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("lang", "string")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("lsn", "bigint")  # internal lineage name


def test_add_column_initial_default(spark, tmpdir_path):
    """Iceberg-v3 initial default: pre-add rows read the default from
    METADATA (no rewrite); post-add writers own the value — a batch that
    omits the column writes a physical null that STAYS null (initial-,
    not write-, default); compaction materializes the default physically
    without changing what readers see."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    s = t.add_column("score", "double", default=0.5)
    assert s["default"] == 0.5
    assert {r.url: r.score for r in t.read().collect()} == {
        "u0": 0.5, "u1": 0.5, "u2": 0.5
    }

    # u0 updated WITH a score; u1 updated WITHOUT one (physical null)
    pipe.apply_batch(
        _batch(
            spark,
            [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>a</p>", "en", 0.9)],
            extra_fields=[T.StructField("score", T.DoubleType(), True)],
        ),
        batch_id=1,
    )
    pipe.apply_batch(
        _batch(spark, [(11, 0, "U", "u1", TS + dt.timedelta(days=1), b"<p>b</p>", "en")]),
        batch_id=2,
    )
    t = pipe.table
    rows = {r.url: r.score for r in t.read().collect()}
    assert rows["u0"] == 0.9
    assert rows["u1"] is None  # writer omitted it post-add: stays null
    assert rows["u2"] == 0.5   # pre-add row: default from metadata

    # rewrite reads through the default and materializes it
    t.compact_files(target_file_bytes=1 << 30)
    t = pipe.table
    assert {r.url: r.score for r in t.read().collect()} == rows

    # time travel to the pre-add snapshot has no column at all
    assert "score" not in t.read(version=0).columns


def test_default_follows_rename_and_dies_with_drop(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.add_column("score", "double", default=0.25)
    t.rename_column("score", "quality")
    assert {r.quality for r in t.read().collect()} == {0.25}
    t.drop_column("quality")
    # re-add the same name WITHOUT a default: fresh id, no default leaks
    t.add_column("quality", "double")
    assert {r.quality for r in t.read().collect()} == {None}
    with pytest.raises(ValueError, match="plain scalar"):
        t.add_column("bad", "array<double>", default=[1.0])


def test_default_visible_in_change_feed(spark, tmpdir_path):
    """changes_between resolves pre/post images through _read_raw, so a
    pre-add preimage carries the initial default, not null."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.add_column("score", "double", default=0.5)
    v_add = t.current_version()
    pipe.apply_batch(
        _batch(spark, [(10, 0, "U", "u0", TS + dt.timedelta(days=1), b"<p>x</p>", "fr")]),
        batch_id=1,
    )
    t = pipe.table
    cdf = t.changes_between(v_add, t.current_version()).collect()
    pre = [r for r in cdf if r._change_type == "update_preimage"]
    assert pre and pre[0].score == 0.5


def test_add_column_reserved_and_bad_defaults(spark, tmpdir_path):
    """Review hardening: write-path names are reserved, and defaults are
    validated eagerly at DDL time (a bad default would otherwise brick
    or silently null every multi-epoch read)."""
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    for bad in ("op", "partition", "bucket", "__key_hash__"):
        with pytest.raises(ValueError, match="reserved"):
            t.add_column(bad, "string")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("lang", "bucket")
    with pytest.raises(ValueError, match="not castable"):
        t.add_column("n", "bigint", default="abc")
    with pytest.raises(ValueError, match="atomic"):
        t.add_column("v", "array<double>", default=1.0)
    # canonicalization: an int default onto double is stored as float
    s = t.add_column("score", "double", default=1)
    assert s["default"] == 1.0 and isinstance(s["default"], float)
    assert {r.score for r in t.read().collect()} == {1.0}


def test_expire_rows_refuses_defaulted_ts_col(spark, tmpdir_path):
    import datetime as _dt
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    t.add_column("seen_ts", "string", default="2020-01-01")
    with pytest.raises(ValueError, match="initial default"):
        t.expire_rows(_dt.datetime(2024, 6, 1, tzinfo=UTC), ts_col="seen_ts")
