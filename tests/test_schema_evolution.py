"""Schema-evolution resolver + evolved-table read tests (SURVEY.md M5).

Reference analogue: the static schema-family splicing between table
generations (/root/reference/fintick/bqloader/schema.py:23-47), made
dynamic: new columns nullable, int→long / float→double widening, narrowing
rejected, history never rewritten.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crypto_exchange_etl_spark.lake.schema_evolution import (
    SchemaEvolutionError,
    conform,
    resolve_schema,
)
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc


def _schema(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def test_resolve_additive_column():
    t = _schema(("a", T.IntegerType()), ("b", T.StringType()))
    b = _schema(("a", T.IntegerType()), ("c", T.DoubleType()))
    r = resolve_schema(t, b)
    assert [f.name for f in r.schema.fields] == ["a", "b", "c"]
    assert r.schema["c"].nullable
    assert [c.kind for c in r.changes] == ["add"]


def test_resolve_widening():
    t = _schema(("a", T.IntegerType()), ("f", T.FloatType()))
    b = _schema(("a", T.LongType()), ("f", T.DoubleType()))
    r = resolve_schema(t, b)
    assert r.schema["a"].dataType == T.LongType()
    assert r.schema["f"].dataType == T.DoubleType()
    assert {c.kind for c in r.changes} == {"widen"}


def test_resolve_narrower_batch_is_noop():
    t = _schema(("a", T.LongType()))
    b = _schema(("a", T.IntegerType()))
    r = resolve_schema(t, b)
    assert r.schema["a"].dataType == T.LongType() and not r.changed


def test_resolve_decimal_growth_and_rejects():
    t = _schema(("d", T.DecimalType(10, 2)))
    assert resolve_schema(t, _schema(("d", T.DecimalType(20, 4)))).changed
    with pytest.raises(SchemaEvolutionError):
        resolve_schema(t, _schema(("d", T.StringType())))
    with pytest.raises(SchemaEvolutionError):
        resolve_schema(_schema(("a", T.LongType())), _schema(("a", T.BooleanType())))


def test_conform_adds_nulls_and_casts(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    out = conform(df, _schema(("a", T.LongType()), ("b", T.StringType()), ("c", T.DoubleType())))
    assert out.schema["a"].dataType == T.LongType()
    row = out.collect()[0]
    assert row.a == 1 and row.c is None


def test_merge_with_new_column_evolves_table(spark, tmpdir_path):
    """A batch carrying an extra nullable column widens the table schema;
    rows written before the evolution read back with null for it."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    b0 = spark.createDataFrame([(1, 0, "I", "a", ts, b"<p>1</p>", "en")], CHANGES_SCHEMA)
    pipe.apply_batch(b0, batch_id=0)

    evolved_schema = T.StructType(
        list(CHANGES_SCHEMA.fields) + [T.StructField("content_type", T.StringType(), True)]
    )
    b1 = spark.createDataFrame(
        [(2, 0, "I", "b", ts + dt.timedelta(hours=1), b"<p>2</p>", "en", "text/html")],
        evolved_schema,
    )
    s = pipe.apply_batch(b1, batch_id=1)
    assert any(c["kind"] == "add" and c["column"] == "content_type"
               for c in s["schema_changes"])

    out = {r.url: r.content_type for r in pipe.table.read().collect()}
    assert out == {"a": None, "b": "text/html"}

    # and a later batch WITHOUT the column still works (missing → null)
    b2 = spark.createDataFrame(
        [(3, 0, "I", "c", ts + dt.timedelta(hours=2), b"<p>3</p>", "en")], CHANGES_SCHEMA
    )
    pipe.apply_batch(b2, batch_id=2)
    out = {r.url: r.content_type for r in pipe.table.read().collect()}
    assert out == {"a": None, "b": "text/html", "c": None}


def test_merge_rejects_incompatible_change(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    pipe.apply_batch(
        spark.createDataFrame([(1, 0, "I", "a", ts, b"<p>1</p>", "en")], CHANGES_SCHEMA),
        batch_id=0,
    )
    bad_schema = T.StructType(
        [f if f.name != "lang" else T.StructField("lang", T.LongType(), True)
         for f in CHANGES_SCHEMA.fields]
    )
    bad = spark.createDataFrame([(2, 0, "I", "b", ts, b"x", 7)], bad_schema)
    with pytest.raises(SchemaEvolutionError):
        pipe.apply_batch(bad, batch_id=1)
    # failed batch must not have committed anything
    assert pipe.table.applied_batches() == {0}
    assert pipe.table.read().count() == 1


def test_widened_numeric_column_reads_old_files(spark, tmpdir_path):
    """int-typed parquet files must read back under the widened long schema
    without history rewrite (Spark 4 parquet widening read)."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    s_int = T.StructType(
        list(CHANGES_SCHEMA.fields) + [T.StructField("fetch_status", T.IntegerType(), True)]
    )
    pipe.apply_batch(
        spark.createDataFrame([(1, 0, "I", "a", ts, b"x", "en", 200)], s_int), batch_id=0
    )
    s_long = T.StructType(
        list(CHANGES_SCHEMA.fields) + [T.StructField("fetch_status", T.LongType(), True)]
    )
    s = pipe.apply_batch(
        spark.createDataFrame(
            [(2, 0, "I", "b", ts + dt.timedelta(hours=1), b"y", "en", 5_000_000_000)], s_long
        ),
        batch_id=1,
    )
    assert any(c["kind"] == "widen" for c in s["schema_changes"])
    out = {r.url: r.fetch_status for r in pipe.table.read().collect()}
    assert out == {"a": 200, "b": 5_000_000_000}
    assert dict(pipe.table.schema["fetch_status"].jsonValue().items())["type"] == "long"
