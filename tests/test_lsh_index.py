"""Incrementally-maintained MinHash-LSH index (MaterializedLshIndex).

Invariants under test:
- after any sequence of CDC batches (inserts, text-changing updates,
  deletes) the incrementally refreshed index equals the band rows a
  from-scratch rebuild derives from the table's live state (bit-identical
  — both paths share minhash_signature/lsh_band_rows);
- a refresh rewrites ONLY the lake buckets its changed keys fall in;
- probing a batch of new docs returns exactly the cross pairs the batch
  operator (lsh_candidate_pairs) finds over corpus ∪ batch;
- the cursor survives restarts, double refreshes are no-ops, and the
  index plugs into CdcPipeline's in-stream view maintenance.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

import pytest

from crypto_exchange_etl_spark.lake.lsh_index import (
    MaterializedLshIndex,
    NearDupMonitor,
)
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.operators.dedup import (
    lsh_band_rows,
    lsh_candidate_pairs,
    minhash_signature,
)
from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

K, BANDS = 8, 4


def _mk_index(spark, pipe, tmpdir_path):
    return MaterializedLshIndex(
        spark,
        pipe.table_path,
        os.path.join(tmpdir_path, "lsh"),
        text_col="text",
        k=K,
        bands=BANDS,
    )


def _expected_rows(table):
    """Band rows straight off the table's live state — the oracle."""
    live = table.read().select("url", "text")
    sig = minhash_signature(live, id_col="url", text_col="text", k=K)
    return lsh_band_rows(sig, id_col="url", k=K, bands=BANDS)


def _assert_matches(index, table):
    got = sorted(map(tuple, index.read().collect()))
    want = sorted(map(tuple, _expected_rows(table).collect()))
    assert got == want and got, "index diverged from live-state band rows"


def test_incremental_equals_rebuild_across_batches(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    idx = _mk_index(spark, pipe, tmpdir_path)
    step = 1500
    for i in range(3):
        changes = generate_changes(
            spark, (i + 1) * step, n_urls=300, seed=11, lsn_from=i * step
        )
        pipe.apply_batch(changes, batch_id=i)
        out = idx.refresh()
        assert out["refreshed"]
        _assert_matches(idx, pipe.table)
    assert idx.refresh() == {
        "refreshed": False,
        "source_version": pipe.table.current_version(),
    }


def test_update_replaces_and_delete_removes(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=2)
    pipe.ensure_table()
    ts = dt.datetime(2024, 1, 1)

    def batch(rows, bid):
        pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), bid)

    batch(
        [
            (1, 0, "I", "https://a.example.com/1", ts,
             b"<p>the quick brown fox jumps over the lazy dog</p>", "en"),
            (2, 0, "I", "https://a.example.com/2", ts,
             b"<p>pack my box with five dozen liquor jugs</p>", "en"),
            (3, 0, "I", "https://a.example.com/3", ts,
             b"<p>sphinx of black quartz judge my vow</p>", "de"),
        ],
        0,
    )
    idx = _mk_index(spark, pipe, tmpdir_path)
    idx.refresh()
    _assert_matches(idx, pipe.table)
    before = {
        tuple(r)
        for r in idx.read().where(F.col("url").endswith("/2")).collect()
    }

    # update /2's text (its band rows must be REPLACED), delete /3
    batch(
        [
            (4, 0, "U", "https://a.example.com/2", ts + dt.timedelta(hours=1),
             b"<p>a completely different body of page text now</p>", "en"),
            (5, 0, "D", "https://a.example.com/3", ts + dt.timedelta(hours=1),
             None, None),
        ],
        1,
    )
    idx.refresh()
    _assert_matches(idx, pipe.table)
    after = {
        tuple(r)
        for r in idx.read().where(F.col("url").endswith("/2")).collect()
    }
    assert after and after != before, "update must replace the key's band rows"
    assert idx.read().where(F.col("url").endswith("/3")).count() == 0


def test_refresh_rewrites_only_touched_buckets(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=8)
    pipe.ensure_table()
    pipe.apply_batch(generate_changes(spark, 4000, n_urls=400, seed=12), 0)
    idx = _mk_index(spark, pipe, tmpdir_path)
    idx.refresh()
    import json

    with open(os.path.join(idx.view_path, "index.json")) as fh:
        m0 = json.load(fh)["buckets"]

    # touch ONE url → exactly one lake bucket
    ts = dt.datetime(2024, 2, 1)
    one = spark.createDataFrame(
        [(10_000, 0, "U", "https://one.example.com/solo", ts,
          b"<p>single touched page</p>", "en")],
        CHANGES_SCHEMA,
    )
    pipe.apply_batch(one, batch_id=1)
    out = idx.refresh()
    assert len(out["touched_buckets"]) == 1
    with open(os.path.join(idx.view_path, "index.json")) as fh:
        m1 = json.load(fh)["buckets"]
    changed = {b for b in set(m0) | set(m1) if m0.get(b) != m1.get(b)}
    assert changed == {str(out["touched_buckets"][0])}
    _assert_matches(idx, pipe.table)


def test_probe_matches_batch_operator(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    pipe.apply_batch(generate_changes(spark, 3000, n_urls=250, seed=13), 0)
    idx = _mk_index(spark, pipe, tmpdir_path)
    idx.refresh()

    corpus = pipe.table.read().select("url", "text")
    # new batch: near-dups of real corpus pages + one unrelated doc
    sample = [r["text"] for r in corpus.limit(3).collect()]
    new = spark.createDataFrame(
        [(f"probe-{i}", t) for i, t in enumerate(sample)]
        + [("probe-x", "zz entirely unrelated text qq")],
        "doc_id string, text string",
    )
    got = {
        (r["probe_id"], r["index_id"])
        for r in idx.probe(new, id_col="doc_id").collect()
    }

    union = corpus.select(F.col("url").alias("doc_id"), "text").unionByName(new)
    pairs = lsh_candidate_pairs(
        minhash_signature(union, id_col="doc_id", text_col="text", k=K),
        id_col="doc_id",
        k=K,
        bands=BANDS,
    )
    new_ids = {r["doc_id"] for r in new.collect()}
    want = set()
    for r in pairs.collect():
        a, b = r["id_a"], r["id_b"]
        if (a in new_ids) != (b in new_ids):  # cross pairs only
            want.add((a, b) if a in new_ids else (b, a))
    assert got == want and got, "probe must equal batch cross pairs"


def test_cursor_restart_and_pipeline_views(spark, tmpdir_path):
    idx_path = os.path.join(tmpdir_path, "lsh")
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    idx = MaterializedLshIndex(spark, pipe.table_path, idx_path, text_col="text")
    pipe2 = CdcPipeline(
        spark, os.path.join(tmpdir_path, "pages"), n_buckets=4, views=[idx]
    )
    pipe2.apply_batch(generate_changes(spark, 1500, n_urls=150, seed=14), 0)
    pipe2.apply_batch(
        generate_changes(spark, 3000, n_urls=150, seed=14, lsn_from=1500), 1
    )
    # in-stream maintenance kept the index at the table head
    assert idx.position() == pipe2.table.current_version()
    _assert_matches(idx, pipe2.table)

    # restart: fresh object sees the cursor; refresh is a no-op
    idx2 = MaterializedLshIndex(spark, pipe2.table_path, idx_path, text_col="text")
    assert idx2.position() == idx.position()
    assert idx2.refresh()["refreshed"] is False

    # rebuild from a full read lands on identical rows
    got_inc = sorted(map(tuple, idx2.read().collect()))
    idx2.rebuild()
    assert sorted(map(tuple, idx2.read().collect())) == got_inc


# --------------------------------------------------------------- monitor


def _page_batch(spark, rows):
    ts = dt.datetime(2024, 3, 1)
    return spark.createDataFrame(
        [(lsn, 0, op, url, ts, html, "en") for lsn, op, url, html in rows],
        CHANGES_SCHEMA,
    )


def test_monitor_flags_ingest_near_dups(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    mon = NearDupMonitor(
        spark, pipe.table_path, os.path.join(tmpdir_path, "mon"), text_col="text"
    )
    pipe2 = CdcPipeline(
        spark, os.path.join(tmpdir_path, "pages"), n_buckets=4, views=[mon]
    )

    # batch 0: distinct corpus — bootstrap span, zero flags
    pipe2.apply_batch(
        _page_batch(
            spark,
            [
                (1, "I", "https://s.example.com/a",
                 b"<p>the quick brown fox jumps over the lazy dog</p>"),
                (2, "I", "https://s.example.com/b",
                 b"<p>pack my box with five dozen liquor jugs</p>"),
            ],
        ),
        0,
    )
    assert mon.position() == pipe2.table.current_version()
    assert mon.flags().count() == 0

    # batch 1: one page duplicating /a's content, one unrelated page
    pipe2.apply_batch(
        _page_batch(
            spark,
            [
                (3, "I", "https://mirror.example.com/a-copy",
                 b"<p>the quick brown fox jumps over the lazy dog</p>"),
                (4, "I", "https://s.example.com/c",
                 b"<p>how vexingly quick daft zebras jump today</p>"),
            ],
        ),
        1,
    )
    got = {(r["url"], r["match_url"]) for r in mon.flags().collect()}
    assert ("https://mirror.example.com/a-copy", "https://s.example.com/a") in got
    assert not any(u == "https://s.example.com/c" for u, _ in got)
    # flags are strictly new-vs-pre-existing, never self
    assert all(u != m for u, m in got)


def test_monitor_crash_between_index_advance_and_commit(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    mon = NearDupMonitor(
        spark, pipe.table_path, os.path.join(tmpdir_path, "mon"), text_col="text"
    )
    pipe.apply_batch(
        _page_batch(
            spark,
            [(1, "I", "https://s.example.com/a",
              b"<p>the quick brown fox jumps over the lazy dog</p>")],
        ),
        0,
    )
    mon.refresh()
    pos = mon.position()

    pipe.apply_batch(
        _page_batch(
            spark,
            [(2, "I", "https://mirror.example.com/a2",
              b"<p>the quick brown fox jumps over the lazy dog</p>")],
        ),
        1,
    )
    # crash simulation: span log written, index advanced, manifest NOT
    real_commit = mon._commit
    calls = {"n": 0}

    def boom(cur, spans):
        calls["n"] += 1
        raise OSError("simulated crash before manifest commit")

    mon._commit = boom
    with pytest.raises(OSError):
        mon.refresh()
    mon._commit = real_commit
    assert mon.position() == pos  # cursor did not move
    assert mon.index.position() > pos  # but the index did

    out = mon.refresh()  # recovery: replay the span from its log
    assert out["refreshed"] and mon.position() == mon.index.position()
    got = {(r["url"], r["match_url"]) for r in mon.flags().collect()}
    assert got == {("https://mirror.example.com/a2", "https://s.example.com/a")}

    # losing the span log in that state is detected, not papered over
    pipe.apply_batch(
        _page_batch(
            spark,
            [(3, "I", "https://s.example.com/d",
              b"<p>entirely new and unrelated page content here</p>")],
        ),
        2,
    )
    mon._commit = boom
    with pytest.raises(OSError):
        mon.refresh()
    mon._commit = real_commit
    import shutil as _sh

    for d in os.listdir(mon.view_path):
        if d.startswith(f"span-{mon.position()}-"):
            _sh.rmtree(os.path.join(mon.view_path, d))
    with pytest.raises(RuntimeError, match="lost span"):
        mon.refresh()
