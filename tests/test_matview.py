"""Incrementally-maintained aggregate views (MaterializedAggregate).

The invariant under test: after any sequence of CDC batches — inserts,
updates (including group-moving ones), deletes — the incrementally
refreshed view equals a full groupBy recompute of the source's live
state, and the refresh cursor survives process "restarts" (re-creating
the object from disk) and double refreshes (idempotence).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.consumer import ChangeFeedLagError
from crypto_exchange_etl_spark.lake.matview import MaterializedAggregate
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

SUMS = {"n_chars": "length(text)"}


def _mk_view(spark, pipe, tmpdir_path):
    return MaterializedAggregate(
        spark,
        pipe.table_path,
        os.path.join(tmpdir_path, "view"),
        group_col="lang",
        sums=SUMS,
    )


def _recompute(table):
    return (
        table.read()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.coalesce(F.expr("length(text)"), F.lit(0))).alias("n_chars"),
        )
    )


def _assert_matches(view, table):
    got = sorted(map(tuple, view.read().collect()))
    want = sorted(map(tuple, _recompute(table).collect()))
    assert got == want


def test_incremental_equals_recompute_across_batches(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    view = _mk_view(spark, pipe, tmpdir_path)
    step = 1500
    for i in range(3):
        changes = generate_changes(
            spark, (i + 1) * step, n_urls=300, seed=5, lsn_from=i * step
        )
        pipe.apply_batch(changes, batch_id=i)
        out = view.refresh()
        assert out["refreshed"]
        _assert_matches(view, pipe.table)
    # caught-up refresh is a no-op
    assert view.refresh() == {
        "refreshed": False,
        "source_version": pipe.table.current_version(),
    }


def test_group_moving_update_and_delete(spark, tmpdir_path):
    """Hand-built batches: an update that MOVES a key between groups must
    decrement the old group and increment the new one; a delete must
    drop a group whose count reaches zero."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=2)
    pipe.ensure_table()
    ts = dt.datetime(2024, 1, 1)

    def batch(rows, bid):
        df = spark.createDataFrame(rows, CHANGES_SCHEMA)
        pipe.apply_batch(df, batch_id=bid)

    batch(
        [
            (1, 0, "I", "https://a.example.com/1", ts, b"<p>alpha</p>", "en"),
            (2, 0, "I", "https://a.example.com/2", ts, b"<p>beta</p>", "en"),
            (3, 0, "I", "https://a.example.com/3", ts, b"<p>gamma</p>", "de"),
        ],
        0,
    )
    view = _mk_view(spark, pipe, tmpdir_path)
    view.refresh()
    _assert_matches(view, pipe.table)
    st = {r["lang"]: r["n_rows"] for r in view.read().collect()}
    assert st == {"en": 2, "de": 1}

    # move /2 from en→fr, delete /3 (de group must vanish)
    batch(
        [
            (4, 0, "U", "https://a.example.com/2", ts + dt.timedelta(hours=1),
             b"<p>beta v2</p>", "fr"),
            (5, 0, "D", "https://a.example.com/3", ts + dt.timedelta(hours=1),
             None, None),
        ],
        1,
    )
    view.refresh()
    _assert_matches(view, pipe.table)
    st = {r["lang"]: r["n_rows"] for r in view.read().collect()}
    assert st == {"en": 1, "fr": 1}


def test_cursor_survives_restart_and_is_idempotent(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    pipe.apply_batch(generate_changes(spark, 2000, n_urls=200, seed=6), 0)
    view = _mk_view(spark, pipe, tmpdir_path)
    view.refresh()
    pos = view.position()

    # "restart": a fresh object over the same view path sees the cursor
    view2 = _mk_view(spark, pipe, tmpdir_path)
    assert view2.position() == pos
    assert view2.refresh()["refreshed"] is False
    _assert_matches(view2, pipe.table)

    # more data → exactly one incremental step, same result as recompute
    pipe.apply_batch(
        generate_changes(spark, 4000, n_urls=200, seed=6, lsn_from=2000), 1
    )
    out = view2.refresh()
    assert out["from_version"] == pos
    _assert_matches(view2, pipe.table)


def test_lag_error_and_rebuild(spark, tmpdir_path):
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    pipe.ensure_table()
    pipe.apply_batch(generate_changes(spark, 1000, n_urls=100, seed=7), 0)
    view = _mk_view(spark, pipe, tmpdir_path)
    view.refresh()

    pipe.apply_batch(
        generate_changes(spark, 2000, n_urls=100, seed=7, lsn_from=1000), 1
    )
    pipe.apply_batch(
        generate_changes(spark, 3000, n_urls=100, seed=7, lsn_from=2000), 2
    )
    pipe.table.expire_snapshots(keep_last=1)  # retention outruns the cursor
    with pytest.raises(ChangeFeedLagError):
        view.refresh()
    view.rebuild()
    _assert_matches(view, pipe.table)
    # after the resync, incremental refresh works again
    pipe.apply_batch(
        generate_changes(spark, 4000, n_urls=100, seed=7, lsn_from=3000), 3
    )
    view.refresh()
    _assert_matches(view, pipe.table)


def test_views_maintained_inside_the_stream(spark, tmpdir_path):
    """views=[...] on the pipeline: after a checkpointed streaming drain,
    every view matches a recompute of the final table — derived tables
    ride the same exactly-once apply loop."""
    from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments

    binlog = os.path.join(tmpdir_path, "binlog")
    write_binlog_segments(spark, binlog, n_events=4000, n_segments=4, n_urls=250, seed=9)
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "pages"), n_buckets=4)
    view = _mk_view(spark, pipe, tmpdir_path)
    pipe.views = [view]
    pipe.run_stream(
        binlog, os.path.join(tmpdir_path, "ck"), available_now=True,
        timeout_secs=300,
    )
    _assert_matches(view, pipe.table)
    assert view.position() == pipe.table.current_version()
