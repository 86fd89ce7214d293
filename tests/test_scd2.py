"""SCD2 history consumer: validity intervals maintained from the CDF.

Oracle: hand-computed interval tables over explicit event scenarios, plus
the convergence identities (incremental ≡ single-shot, crash-replay ≡
uninterrupted) the other consumers are held to.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake.consumer import ChangeFeedLagError
from crypto_exchange_etl_spark.lake.scd2 import Scd2History
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

T0 = dt.datetime(2024, 1, 1)


def _t(h):
    return T0 + dt.timedelta(hours=h)


def _apply(spark, pipe, batch_id, rows):
    pipe.apply_batch(spark.createDataFrame(rows, CHANGES_SCHEMA), batch_id=batch_id)


def _mk(spark, path, mode="cow"):
    """Three batches: A inserted/updated/updated, B inserted/deleted/re-
    inserted — every interval kind (open, update-close, delete-close,
    revival) in one small table with strictly increasing event times."""
    pipe = CdcPipeline(spark, path, n_buckets=4, write_mode=mode)
    _apply(spark, pipe, 0, [
        (1, 0, "I", "A", _t(1), b"<p>a1</p>", "en"),
        (2, 0, "I", "B", _t(2), b"<p>b1</p>", "en"),
    ])
    _apply(spark, pipe, 1, [
        (3, 0, "U", "A", _t(3), b"<p>a2</p>", "en"),
        (4, 0, "D", "B", _t(4), None, None),
    ])
    _apply(spark, pipe, 2, [
        (5, 0, "I", "B", _t(5), b"<p>b2</p>", "de"),
        (6, 0, "U", "A", _t(6), b"<p>a3</p>", "en"),
    ])
    return pipe


#: (url, valid_from, valid_to, src_lsn) for the _mk scenario
EXPECTED = {
    ("A", _t(1), _t(3), 1),
    ("A", _t(3), _t(6), 3),
    ("A", _t(6), None, 6),
    ("B", _t(2), _t(4), 2),
    ("B", _t(5), None, 5),
}


def _ivals(h):
    return {
        (r.url, r.valid_from, r.valid_to, r.src_lsn)
        for r in h.history().collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_scd2_intervals_match_reference(spark, tmpdir_path, mode):
    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src, mode=mode)
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    out = h.refresh()
    assert out["refreshed"] and out["source_version"] == pipe.table.current_version()
    assert _ivals(h) == EXPECTED
    # as_of: between events the reconstruction matches the LWW evolution
    at = {r.url: r.lang for r in h.as_of(_t(2)).collect()}
    assert at == {"A": "en", "B": "en"}
    mid = {(r.url, r.src_lsn) for r in h.as_of(_t(4) + dt.timedelta(minutes=30)).collect()}
    assert mid == {("A", 3)}  # B deleted at t4, not yet revived
    # current() ≡ the source's live state on the shared columns
    cur = {(r.url, r.lang) for r in h.current().collect()}
    live = {(r.url, r.lang) for r in pipe.table.read().collect()}
    assert cur == live
    # payload carried: text extracted from the winning html
    a_now = h.current().where(F.col("url") == "A").collect()[0]
    assert a_now.text == "a3"
    # idempotent no-op when the source did not advance
    assert h.refresh()["refreshed"] is False


def test_scd2_incremental_equals_single_shot_and_crash_replay(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    inc = Scd2History(spark, src, os.path.join(tmpdir_path, "inc"))
    _apply(spark, pipe, 0, [
        (1, 0, "I", "A", _t(1), b"<p>a1</p>", "en"),
        (2, 0, "I", "B", _t(2), b"<p>b1</p>", "en"),
    ])
    inc.refresh()
    _apply(spark, pipe, 1, [
        (3, 0, "U", "A", _t(3), b"<p>a2</p>", "en"),
        (4, 0, "D", "B", _t(4), None, None),
    ])
    inc.refresh()
    # crash between history commit and cursor write: wind the cursor back
    # one refresh — the overlapping span must re-derive identical rows
    inc._write_cursor(1)
    _apply(spark, pipe, 2, [
        (5, 0, "I", "B", _t(5), b"<p>b2</p>", "de"),
        (6, 0, "U", "A", _t(6), b"<p>a3</p>", "en"),
    ])
    inc.refresh()
    assert _ivals(inc) == EXPECTED
    # single-shot consumer over the full feed lands on the same history
    one = Scd2History(spark, src, os.path.join(tmpdir_path, "one"))
    one.refresh()
    assert _ivals(one) == EXPECTED


def test_scd2_stale_event_leaves_history_unchanged(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    _apply(spark, pipe, 0, [(10, 0, "I", "A", _t(5), b"<p>a1</p>", "en")])
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    before = _ivals(h)
    # older warc_ts loses LWW ⇒ no state change ⇒ empty CDF ⇒ no new rows
    _apply(spark, pipe, 1, [(11, 0, "U", "A", _t(2), b"<p>old</p>", "en")])
    h.refresh()
    assert _ivals(h) == before
    assert h.position() == pipe.table.current_version()


def test_scd2_bootstrap_over_nonempty_earliest(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src)
    pipe.table.expire_snapshots(keep_last=1)  # earliest snapshot now has rows
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    # pre-cut history is unknowable; the live state opens intervals
    assert _ivals(h) == {
        ("A", _t(6), None, 6),
        ("B", _t(5), None, 5),
    }
    # and the feed continues incrementally from there
    _apply(spark, pipe, 3, [(7, 0, "U", "A", _t(7), b"<p>a4</p>", "en")])
    h.refresh()
    assert ("A", _t(6), _t(7), 6) in _ivals(h)
    assert ("A", _t(7), None, 7) in _ivals(h)


def test_scd2_lag_then_resync(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    _apply(spark, pipe, 0, [
        (1, 0, "I", "A", _t(1), b"<p>a1</p>", "en"),
        (2, 0, "I", "B", _t(2), b"<p>b1</p>", "en"),
        (3, 0, "I", "C", _t(3), b"<p>c1</p>", "en"),
    ])
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    # the lag window: A updated (supersessor live), B deleted (tombstone
    # survives), C's update + compaction is simulated by update-then-TTL?
    _apply(spark, pipe, 1, [
        (4, 0, "U", "A", _t(4), b"<p>a2</p>", "en"),
        (5, 0, "D", "B", _t(5), None, None),
    ])
    pipe.table.expire_snapshots(keep_last=1)
    with pytest.raises(ChangeFeedLagError):
        h.refresh()
    out = h.resync()
    assert out["resynced"]
    iv = _ivals(h)
    # captured history kept; stale opens closed at the best-known time
    assert ("A", _t(1), _t(4), 1) in iv  # closed at supersessor's time
    assert ("B", _t(2), _t(5), 2) in iv  # closed at surviving tombstone
    assert ("A", _t(4), None, 4) in iv   # new live version opened
    assert ("C", _t(3), None, 3) in iv   # untouched key untouched
    cur = {(r.url, r.src_lsn) for r in h.current().collect()}
    assert cur == {("A", 4), ("C", 3)}
    # consumer is live again
    _apply(spark, pipe, 2, [(6, 0, "U", "C", _t(6), b"<p>c2</p>", "en")])
    h.refresh()
    assert ("C", _t(6), None, 6) in _ivals(h)


def test_scd2_source_schema_evolution(spark, tmpdir_path):
    from pyspark.sql import types as T

    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src)
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    # source gains a column AFTER intervals were captured: reads must
    # neither crash nor hide captured columns (payload comes from the
    # history table's own schema)
    pipe.table.add_column("grade", T.DoubleType(), default=1.5)
    hist_before = _ivals(h)
    assert hist_before == EXPECTED  # no crash, nothing lost
    assert "grade" not in h.history().columns  # not captured yet
    # a post-DDL change flows the new column into new intervals only
    _apply(spark, pipe, 3, [(7, 0, "U", "A", _t(7), b"<p>a4</p>", "en")])
    h.refresh()
    rows = {r.src_lsn: r for r in h.history().collect()}
    assert "grade" in h.history().columns
    # post-add rows stay null unless the feed supplies a value (the
    # engine's documented add_column semantics); pre-DDL intervals were
    # captured without the column and read null too
    assert rows[7].grade is None and rows[1].grade is None
    assert rows[7].text == "a4"  # the new interval itself is correct
    # mirrored rename keeps every interval under one column
    pipe.table.rename_column("lang", "language")
    h._history_table(h._source()).rename_column("lang", "language")
    langs = {r.src_lsn: r.language for r in h.history().collect()}
    assert langs[1] == "en" and langs[5] == "de"


def test_scd2_bootstrap_after_ddl_on_expired_source(spark, tmpdir_path):
    from pyspark.sql import types as T

    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src)
    pipe.table.add_column("grade", T.DoubleType(), default=1.5)
    pipe.table.expire_snapshots(keep_last=1)
    # bootstrap over the non-empty earliest snapshot must fill the
    # post-cut column with its declared initial default, not crash
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    cur = {(r.url, r.grade) for r in h.current().collect()}
    assert cur == {("A", 1.5), ("B", 1.5)}


def test_scd2_row_ttl_closes_interval(spark, tmpdir_path):
    # a row physically dropped by retention (expire_rows) produces a CDF
    # delete with NO tombstone timestamp — the interval must still close
    # (at the commit's wall time), never stay "current" forever
    src = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    _apply(spark, pipe, 0, [
        (1, 0, "I", "A", _t(1), b"<p>a1</p>", "en"),
        (2, 0, "I", "B", dt.datetime(2025, 6, 1), b"<p>b1</p>", "en"),
    ])
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    pipe.table.expire_rows(older_than=dt.datetime(2025, 1, 1))
    h.refresh()
    rows = {r.url: r for r in h.history().collect()}
    assert rows["A"].valid_to is not None and not rows["A"].is_current
    assert rows["B"].is_current
    assert {r.url for r in h.current().collect()} == {"B"}


def test_scd2_refresh_span_across_rename(spark, tmpdir_path):
    # one refresh span containing a rename commit: pre-rename intervals
    # must keep their values under the current column name (field-id
    # coalesce), not null out
    src = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    _apply(spark, pipe, 0, [
        (1, 0, "I", "A", _t(1), b"<p>a1</p>", "en"),
        (2, 0, "I", "B", _t(2), b"<p>b1</p>", "de"),
    ])
    pipe.table.rename_column("lang", "language")
    _apply(spark, pipe, 1, [(3, 0, "U", "A", _t(3), b"<p>a2</p>", "fr")])
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()  # single span (0, 3]
    # by-field-id resolution: pre-rename intervals keep their values
    # under the renamed column...
    langs = {r.src_lsn: r.language for r in h.history().collect()}
    assert langs == {1: "en", 2: "de", 3: None}
    # ...and the feed's re-added 'lang' (a NEW field id) is a separate
    # column — history's current face mirrors the source's live state
    # exactly, including the split
    cur = {
        (r.url, r.language, r.lang) for r in h.current().collect()
    }
    live = {
        (r.url, r.language, r.lang) for r in pipe.table.read().collect()
    }
    assert cur == live
    assert ("A", None, "fr") in cur


def test_scd2_equal_lsn_warc_ts_win_splits_interval(spark, tmpdir_path):
    # an update that wins LWW on warc_ts with an EQUAL lsn (rank-based
    # change detection emits these, e.g. a feed with a coarse derived
    # lsn) must close the old interval AND open a new one — the history
    # identity is the full LWW rank (key, warc_ts, lsn), so the two rows
    # cannot collide on one _hist_id and race in the max_by collapse
    src = os.path.join(tmpdir_path, "src")
    pipe = CdcPipeline(spark, src, n_buckets=4)
    _apply(spark, pipe, 0, [(1, 0, "I", "A", _t(1), b"<p>a1</p>", "en")])
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    _apply(spark, pipe, 1, [(1, 0, "U", "A", _t(2), b"<p>a2</p>", "de")])
    h.refresh()
    assert _ivals(h) == {
        ("A", _t(1), _t(2), 1),  # old version closed at the winner's ts
        ("A", _t(2), None, 1),   # new version open, same lsn
    }
    cur = h.current().collect()
    assert len(cur) == 1 and cur[0].lang == "de" and cur[0].text == "a2"
    # single-shot consumer over the full feed converges identically
    one = Scd2History(spark, src, os.path.join(tmpdir_path, "one"))
    one.refresh()
    assert _ivals(one) == _ivals(h)


def test_scd2_bootstrap_after_rename_on_expired_source(spark, tmpdir_path):
    # rename AFTER the earliest retained snapshot: bootstrap reads the
    # snapshot's OLD physical name by field id (like _interval_rows),
    # instead of silently opening intervals with the default/null
    src = os.path.join(tmpdir_path, "src")
    pipe = _mk(spark, src)
    pipe.table.expire_snapshots(keep_last=1)  # earliest snapshot has rows
    pipe.table.rename_column("lang", "language")
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"))
    h.refresh()
    cur = {(r.url, r.language, r.text) for r in h.current().collect()}
    assert cur == {("A", "en", "a3"), ("B", "de", "b2")}


def test_scd2_cli_subcommand(spark, tmpdir_path):
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import scripts.cdc_job as cli

    src = os.path.join(tmpdir_path, "src")
    _mk(spark, src)
    hist = os.path.join(tmpdir_path, "hist")
    rc = cli.main(
        ["scd2", "--source", src, "--history", hist, "--payload-cols", "lang"]
    )
    assert rc == 0
    h = Scd2History(spark, src, hist, payload_cols=["lang"])
    assert {(r.url, r.valid_from, r.valid_to, r.src_lsn)
            for r in h.history().collect()} == EXPECTED
    # no-advance re-run is a no-op with the same interval count
    assert rc == cli.main(
        ["scd2", "--source", src, "--history", hist, "--payload-cols", "lang"]
    )


def test_scd2_in_stream_maintenance(spark, tmpdir_path):
    # plugs into CdcPipeline(views=[...]) like the other consumers
    import tempfile

    from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments

    tmp = tempfile.mkdtemp(dir=tmpdir_path)
    binlog = os.path.join(tmp, "binlog")
    write_binlog_segments(
        spark, binlog, n_events=400, n_segments=2, n_urls=60, seed=11
    )
    src = os.path.join(tmp, "pages")
    h = Scd2History(spark, src, os.path.join(tmp, "hist"), payload_cols=["lang"])
    pipe = CdcPipeline(spark, src, n_buckets=4, views=[h])
    pipe.run_stream(binlog, os.path.join(tmp, "ck"), available_now=True,
                    timeout_secs=300)
    assert h.position() == pipe.table.current_version()
    cur = {(r.url, r.lang) for r in h.current().collect()}
    live = {(r.url, r.lang) for r in pipe.table.read().collect()}
    assert cur == live
    # every key's intervals chain: closes equal the next open's start
    rows = sorted(
        ((r.url, r.valid_from, r.valid_to) for r in h.history().collect())
    )
    by_key: dict[str, list] = {}
    for u, vf, vt in rows:
        by_key.setdefault(u, []).append((vf, vt))
    for u, ivs in by_key.items():
        ivs.sort()
        assert sum(1 for _vf, vt in ivs if vt is None) <= 1
        for (vf1, vt1), (vf2, _vt2) in zip(ivs, ivs[1:]):
            assert vt1 is not None and vt1 <= vf2


def test_hist_id_format_guard(spark, tmpdir_path):
    """A history written under an older _hist_id generation refuses to
    refresh/resync (mixed ids would strand legacy open intervals), while
    a current-format cursor carries the stamp and keeps working."""
    import json

    src = os.path.join(tmpdir_path, "src")
    _mk(spark, src)
    h = Scd2History(spark, src, os.path.join(tmpdir_path, "hist"),
                    payload_cols=["lang"])
    h.refresh()
    with open(h._cursor_path) as fh:
        cur = json.load(fh)
    assert cur["hist_id_format"] == 2
    h.refresh()  # idempotent no-op under the current stamp

    # simulate a pre-stamp (format-1) history: key absent -> format 1
    del cur["hist_id_format"]
    with open(h._cursor_path, "w") as fh:
        json.dump(cur, fh)
    with pytest.raises(ValueError, match="_hist_id format 1"):
        h.refresh()
    with pytest.raises(ValueError, match="_hist_id format 1"):
        h.resync()
