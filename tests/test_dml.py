"""Row-level DML: delete_where / update_where (Iceberg DELETE/UPDATE).

Both ride the engine's own LWW merge path (bucket-pruned, ledgered,
exactly-once), so they interleave safely with the CDC feed: a later feed
event for a deleted/updated key wins normally.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _seed(spark, path, write_mode="cow"):
    pipe = CdcPipeline(spark, path, n_buckets=2, write_mode=write_mode,
                       max_deltas=1000)
    rows = [
        (i + 1, 0, "I", f"u{i}", TS + dt.timedelta(hours=i),
         f"<p>{i}</p>".encode(), "en" if i % 2 == 0 else "de")
        for i in range(6)
    ]
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=0)
    return pipe


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where(spark, tmpdir_path, mode):
    pipe = _seed(spark, os.path.join(tmpdir_path, mode), write_mode=mode)
    t = pipe.table
    v0 = t.current_version()
    s = t.delete_where("lang = 'de'")
    assert s["operation"] == "delete_where" and s["n_delete"] == 3
    t = pipe.table
    assert {r.url for r in t.read().select("url").collect()} == {"u0", "u2", "u4"}
    # time travel still sees the pre-delete rows
    assert t.read(version=v0).count() == 6
    # tombstones carry no payload bytes
    stones = t.read_physical(fold=True).where(F.col("is_deleted"))
    assert all(r.html is None and r.text is None for r in stones.collect())
    # a LATER feed event for a deleted key wins back normally
    pipe.apply_batch(
        spark.createDataFrame(
            [(500, 0, "I", "u1", TS + dt.timedelta(days=2), b"<p>back</p>", "fr")],
            CHANGES_SCHEMA,
        ),
        batch_id=1,
    )
    rows = {r.url: r.lang for r in pipe.table.read().collect()}
    assert rows["u1"] == "fr" and len(rows) == 4


def test_delete_where_idempotent_and_empty(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    s = t.delete_where("lang = 'de'", batch_id=-7)
    assert s["n_delete"] == 3
    # replay with the same batch id is the exactly-once no-op
    assert pipe.table.delete_where("lang = 'de'", batch_id=-7).get("skipped")
    # nothing matches: no commit at all
    v = pipe.table.current_version()
    assert pipe.table.delete_where("lang = 'zz'").get("skipped")
    assert pipe.table.current_version() == v


def test_update_where(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    s = t.update_where("lang = 'de'", {"lang": F.lit("fr"),
                                       "text": "concat(text, '!')"})
    assert s["operation"] == "update_where" and s["n_update"] == 3
    rows = {r.url: (r.lang, r.text) for r in pipe.table.read().collect()}
    assert rows["u1"] == ("fr", "1!")
    assert rows["u0"] == ("en", "0")  # untouched
    assert len(rows) == 6
    # ledger carries the maintenance lineage row
    led = pipe.table.ledger().where(F.col("partition") == -1)
    assert led.count() >= 1
    # feed watermarks were NOT polluted by the synthetic partition
    assert "-1" not in pipe.table.watermarks()


def test_update_where_rejects_structural(spark, tmpdir_path):
    t = _seed(spark, os.path.join(tmpdir_path, "t")).table
    with pytest.raises(ValueError, match="structural|row identity"):
        t.update_where("lang = 'de'", {"url": F.lit("x")})
    with pytest.raises(ValueError, match="unknown"):
        t.update_where("lang = 'de'", {"nope": F.lit("x")})
