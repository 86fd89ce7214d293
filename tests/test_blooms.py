"""Per-file key Bloom filters (LakeTable.build_blooms + lookup tier 3).

Invariants:
- lookup stays semantically identical to read().where(key = value) for
  present, absent, and deleted keys, blooms or not;
- a bloom-covered absent key prunes EVERY candidate file (no read);
- blooms are built from physical rows, tombstones included — a MOR
  delete must not be resurrected by bloom-pruning the delta file;
- files written after the build degrade gracefully (no bloom row ⇒
  never pruned by this tier).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline


def _lookup_rows(table, url):
    return sorted(map(tuple, table.lookup(url).collect()))


def _read_rows(table, url):
    return sorted(
        map(tuple, table.read().where(F.col("url") == url).collect())
    )


def test_bloom_lookup_equivalence_and_absent_prune(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    pipe.apply_batch(generate_changes(spark, 3000, n_urls=300, seed=21), 0)
    pipe.apply_batch(
        generate_changes(spark, 6000, n_urls=300, seed=21, lsn_from=3000), 1
    )
    t = pipe.table
    out = t.build_blooms()
    assert out["operation"] == "build_blooms" and out["files"] > 0
    t = pipe.table  # reload at the new version

    urls = [r["url"] for r in t.read().select("url").limit(5).collect()]
    for u in urls:
        got = _lookup_rows(t, u)
        assert got == _read_rows(t, u) and got

    # absent key: bloom must prune every candidate (deterministic for
    # this fixed data+key; a false positive would only add a file read)
    m = t.manifest()
    absent = "https://definitely-absent.example.com/nope"
    cand = [f for f in m["files"]]
    assert t._bloom_prune(m, absent, cand) == []
    assert _lookup_rows(t, absent) == []


def test_bloom_covers_tombstones_no_resurrection(spark, tmpdir_path):
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "pages"), n_buckets=2, write_mode="mor"
    )
    pipe.ensure_table()
    ts = dt.datetime(2024, 4, 1)
    pipe.apply_batch(
        spark.createDataFrame(
            [(1, 0, "I", "https://b.example.com/x", ts,
              b"<p>page to be deleted later</p>", "en"),
             (2, 0, "I", "https://b.example.com/y", ts,
              b"<p>page that stays alive</p>", "en")],
            CHANGES_SCHEMA,
        ),
        0,
    )
    # delete /x via a MOR delta, then build blooms over base + delta
    pipe.apply_batch(
        spark.createDataFrame(
            [(3, 0, "D", "https://b.example.com/x",
              ts + dt.timedelta(hours=1), None, None)],
            CHANGES_SCHEMA,
        ),
        1,
    )
    t = pipe.table
    t.build_blooms()
    t = pipe.table
    assert _lookup_rows(t, "https://b.example.com/x") == []
    got = _lookup_rows(t, "https://b.example.com/y")
    assert got == _read_rows(t, "https://b.example.com/y") and got

    # the tombstone-bearing delta file has a bloom row containing /x:
    # pruning candidates for /x must KEEP at least one file (the delta),
    # otherwise the lookup would fall through to the stale base row.
    m = t.manifest()
    cand = [f for f in m["files"]]
    kept = t._bloom_prune(m, "https://b.example.com/x", cand)
    assert any(f.get("delta") for f in kept)


def test_files_after_build_degrade_gracefully(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=2)
    pipe.ensure_table()
    pipe.apply_batch(generate_changes(spark, 1500, n_urls=150, seed=22), 0)
    pipe.table.build_blooms()

    # a merge AFTER the build rewrites buckets; new files have no bloom
    pipe.apply_batch(
        generate_changes(spark, 3000, n_urls=150, seed=22, lsn_from=1500), 1
    )
    t = pipe.table
    assert t.manifest().get("blooms"), "bloom reference survives merges"
    urls = [r["url"] for r in t.read().select("url").limit(3).collect()]
    for u in urls:
        got = _lookup_rows(t, u)
        assert got == _read_rows(t, u) and got
    # rebuilding re-covers the new files and supersedes the old dir
    old_dir = t.manifest()["blooms"]["dir"]
    t.build_blooms()
    t = pipe.table
    assert t.manifest()["blooms"]["dir"] != old_dir
    assert not os.path.isdir(os.path.join(t.path, old_dir))
    m = t.manifest()
    assert t._bloom_prune(m, "https://definitely-absent.example.com/no", list(m["files"])) == []
