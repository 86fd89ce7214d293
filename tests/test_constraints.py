"""CHECK constraints + data-quality expectations (Delta `ADD CONSTRAINT`
/ DLT expectations analogue).

Declared once on the table (metadata-only commit), enforced on every
merge-path write — CDC pipeline, MERGE INTO, row-level DML, SCD2 — under
a per-writer policy: fail (abort, nothing commits), quarantine (violators
divert to parquet with the violated names), drop (filter silently). SQL
CHECK semantics: only FALSE violates, NULL passes; delete tombstones are
exempt. Referenced columns are rename/drop-protected; `lake_sink` fails
closed (its Arrow tasks evaluate no SQL).

Reference analogue: the post-load row-count validation flag the reference
sets in Firestore (/root/reference/fintick/controllers/base.py:244-267) —
but there bad rows are already live; here they never land.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.lake import ConstraintViolationError, LakeTable
from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _rows(spark, spec):
    return spark.createDataFrame(
        [
            (lsn, 0, op, u, TS + dt.timedelta(hours=h), html, lang)
            for (lsn, op, u, h, html, lang) in spec
        ],
        CHANGES_SCHEMA,
    )


def _seed(spark, path, **kw):
    pipe = CdcPipeline(spark, path, n_buckets=2, **kw)
    pipe.apply_batch(
        _rows(
            spark,
            [
                (1, "I", "u1", 0, b"<p>a</p>", "en"),
                (2, "I", "u2", 1, b"<p>b</p>", "de"),
            ],
        ),
        batch_id=0,
    )
    return pipe


def test_add_constraint_metadata_only_and_introspection(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    v0 = t.current_version()
    n_files0 = len(t.manifest()["files"])
    s = t.add_constraint("lang_known", "lang in ('en','de','fr')")
    assert s["operation"] == "add_constraint" and s["validated"]
    assert sorted(s["refs"]) == ["lang"]
    t = pipe.table
    # one JSON commit, zero data files touched
    assert t.current_version() == v0 + 1
    assert len(t.manifest()["files"]) == n_files0
    assert t.constraints == {"lang_known": "lang in ('en','de','fr')"}
    meta = {r.name: r.expr for r in t.metadata_table("constraints").collect()}
    assert meta == {"lang_known": "lang in ('en','de','fr')"}
    # duplicate name / bad expressions refused
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("lang_known", "1=1")
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_constraint("bad", "nope > 3")
    with pytest.raises(ValueError, match="must be boolean"):
        t.add_constraint("bad", "length(lang)")


def test_add_constraint_validates_live_rows(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    v0 = t.current_version()
    with pytest.raises(ConstraintViolationError, match="1 live row"):
        t.add_constraint("only_en", "lang = 'en'")
    assert pipe.table.current_version() == v0  # refused DDL commits nothing
    # validate=False records it anyway (caller owns the risk)
    s = t.add_constraint("only_en", "lang = 'en'", validate=False)
    assert not s["validated"]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_fail_mode_aborts_batch_exactly_once(spark, tmpdir_path, mode):
    pipe = _seed(spark, os.path.join(tmpdir_path, mode), write_mode=mode,
                 max_deltas=1000)
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    v1 = pipe.table.current_version()
    with pytest.raises(ConstraintViolationError, match="lang_known"):
        pipe.apply_batch(
            _rows(spark, [(4, "U", "u2", 3, b"<p>d</p>", "xx")]), batch_id=2
        )
    t = pipe.table
    assert t.current_version() == v1  # nothing committed
    assert 2 not in t.applied_batches()  # corrected feed can re-run the id
    # corrected batch under the SAME id applies cleanly
    pipe.apply_batch(
        _rows(spark, [(4, "U", "u2", 3, b"<p>d</p>", "fr")]), batch_id=2
    )
    assert {r.lang for r in pipe.table.read().collect()} == {"en", "fr"}


def test_null_passes_and_deletes_exempt(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    # NULL lang → expression UNKNOWN → passes (SQL CHECK semantics)
    pipe.apply_batch(
        _rows(spark, [(5, "I", "u3", 4, b"<p>n</p>", None)]), batch_id=1
    )
    # delete tombstones carry no payload and are exempt
    pipe.apply_batch(_rows(spark, [(6, "D", "u1", 5, None, None)]), batch_id=2)
    live = {r.url for r in pipe.table.read().collect()}
    assert live == {"u2", "u3"}


def test_quarantine_mode(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"), on_violation="quarantine",
                 metrics_dir=os.path.join(tmpdir_path, "m"))
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    pipe.table.add_constraint("has_text", "length(text) > 0")
    out = pipe.apply_batch(
        _rows(
            spark,
            [
                (6, "I", "u3", 5, b"<p>e</p>", "zz"),
                (7, "I", "u4", 6, b"<p>f</p>", "en"),
                (8, "I", "u5", 7, b"<p></p>", "zz"),  # violates both
            ],
        ),
        batch_id=4,
    )
    assert out["n_quarantined"] == 2
    assert out["quarantine_path"] == "quarantine/batch-4"
    assert out["constraints_checked"] == ["has_text", "lang_known"]
    # clean row landed, violators did not
    assert {r.url for r in pipe.table.read().collect()} == {"u1", "u2", "u4"}
    q = {r.url: sorted(r._violated) for r in pipe.table.quarantine().collect()}
    assert q == {"u3": ["lang_known"], "u5": ["has_text", "lang_known"]}
    # quarantined rows carry the enriched payload (extraction ran)
    qe = {r.url: r.text for r in pipe.table.quarantine().collect()}
    assert qe["u3"] == "e"
    # metrics feed records the count
    import json

    docs = [
        json.load(open(os.path.join(tmpdir_path, "m", f)))
        for f in os.listdir(os.path.join(tmpdir_path, "m"))
    ]
    b4 = next(d for d in docs if d["batch_id"] == 4)
    assert b4["n_quarantined"] == 2
    # exactly-once: replaying the batch is a no-op that keeps quarantine
    out2 = pipe.apply_batch(
        _rows(spark, [(6, "I", "u3", 5, b"<p>e</p>", "zz")]), batch_id=4
    )
    assert out2["skipped"]
    assert pipe.table.quarantine().count() == 2


def test_quarantine_clean_batch_leaves_no_trace(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"), on_violation="quarantine")
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    out = pipe.apply_batch(
        _rows(spark, [(9, "I", "u9", 8, b"<p>x</p>", "en")]), batch_id=5
    )
    assert out["n_quarantined"] == 0 and "quarantine_path" not in out
    assert not os.path.exists(
        os.path.join(pipe.table_path, "quarantine", "batch-5")
    )
    assert pipe.table.quarantine().count() == 0


def test_drop_mode_filters_silently(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"), on_violation="drop")
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    pipe.apply_batch(
        _rows(
            spark,
            [(6, "I", "u3", 5, b"<p>e</p>", "zz"), (7, "I", "u4", 6, b"<p>f</p>", "en")],
        ),
        batch_id=1,
    )
    assert {r.url for r in pipe.table.read().collect()} == {"u1", "u2", "u4"}
    assert pipe.table.quarantine().count() == 0


def test_constraint_on_derived_column_bootstrap(spark, tmpdir_path):
    """A constraint on the enrich-DERIVED column (text) gates the very
    first (bootstrap) batch. The deferred-enrich fast path STAYS active
    on constrained tables — the gate moves past the exchange, where the
    bootstrap invariant guarantees only batch winners — so it must see
    post-enrich values there."""
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=2)
    pipe.ensure_table().add_constraint("has_text", "length(text) > 0")
    with pytest.raises(ConstraintViolationError, match="has_text"):
        pipe.apply_batch(
            _rows(spark, [(1, "I", "u1", 0, b"<p></p>", "en")]), batch_id=0
        )
    pipe.apply_batch(
        _rows(spark, [(1, "I", "u1", 0, b"<p>ok</p>", "en")]), batch_id=0
    )
    assert pipe.table.read().count() == 1


def test_quarantine_on_bootstrap_deferred_gate(spark, tmpdir_path):
    """Quarantine through the post-exchange (deferred-enrich bootstrap)
    gate: violators divert with post-enrich payload and NO merge-internal
    columns; clean rows land; equivalent to the pre-exchange placement."""
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=2,
        on_violation="quarantine",
    )
    pipe.ensure_table().add_constraint("has_text", "length(text) > 0")
    out = pipe.apply_batch(
        _rows(
            spark,
            [
                (1, "I", "u1", 0, b"<p></p>", "en"),  # violates
                (2, "I", "u2", 1, b"<p>ok</p>", "de"),
            ],
        ),
        batch_id=0,
    )
    assert out["n_quarantined"] == 1
    assert {r.url for r in pipe.table.read().collect()} == {"u2"}
    q = pipe.table.quarantine()
    assert not {"bucket", "_pk"} & set(q.columns)
    row = q.collect()[0]
    assert row.url == "u1" and row._violated == ["has_text"]
    assert row.text == ""  # gate saw the post-enrich (extracted) value
    # pre-exchange placement (forced via env) quarantines identically
    os.environ["SPARK_CDC_DEFER_ENRICH"] = "0"
    try:
        pipe2 = CdcPipeline(
            spark, os.path.join(tmpdir_path, "t2"), n_buckets=2,
            on_violation="quarantine",
        )
        pipe2.ensure_table().add_constraint("has_text", "length(text) > 0")
        out2 = pipe2.apply_batch(
            _rows(
                spark,
                [
                    (1, "I", "u1", 0, b"<p></p>", "en"),
                    (2, "I", "u2", 1, b"<p>ok</p>", "de"),
                ],
            ),
            batch_id=0,
        )
    finally:
        os.environ.pop("SPARK_CDC_DEFER_ENRICH", None)
    assert out2["n_quarantined"] == 1
    assert {r.url for r in pipe2.table.read().collect()} == {"u2"}
    assert sorted(pipe2.table.quarantine().columns) == sorted(q.columns)


def test_lww_superseded_violator_still_fails_but_loser_semantics_hold(
    spark, tmpdir_path
):
    """Batch-local LWW: a violating event that LOSES within the batch is
    superseded before the gate and never trips it."""
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    # same key: bad lang at h=3 LOSES to good lang at h=4 → batch applies
    pipe.apply_batch(
        _rows(
            spark,
            [(10, "U", "u1", 3, b"<p>x</p>", "xx"), (11, "U", "u1", 4, b"<p>y</p>", "fr")],
        ),
        batch_id=1,
    )
    assert {r.lang for r in pipe.table.read().where("url='u1'").collect()} == {"fr"}


def test_merge_into_and_dml_honor_constraints(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.add_constraint("lang_known", "lang in ('en','de','fr')")
    src = spark.createDataFrame(
        [("u1", TS + dt.timedelta(days=1), "xx")], "url string, warc_ts timestamp, lang string"
    )
    with pytest.raises(ConstraintViolationError):
        t.merge_into(src, when_matched_update=True, when_not_matched_insert=True)
    # update_where writing a violating value is refused too
    with pytest.raises(ConstraintViolationError):
        pipe.table.update_where("url = 'u1'", {"lang": F.lit("zz")})
    assert {r.lang for r in pipe.table.read().collect()} == {"en", "de"}


def test_ddl_protection_and_release(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    t = pipe.table
    t.add_constraint("lang_known", "lang in ('en','de','fr')")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        pipe.table.rename_column("lang", "language")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        pipe.table.drop_column("lang")
    pipe.table.drop_constraint("lang_known")
    pipe.table.rename_column("lang", "language")  # released
    assert "language" in [f.name for f in pipe.table.schema.fields]
    with pytest.raises(ValueError, match="no constraint"):
        pipe.table.drop_constraint("lang_known")


def test_constraints_survive_merges_and_time_travel(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    pipe.apply_batch(
        _rows(spark, [(3, "U", "u1", 2, b"<p>c</p>", "fr")]), batch_id=1
    )
    t = pipe.table
    # the merge commit carried the constraint forward
    assert t.constraints == {"lang_known": "lang in ('en','de','fr')"}
    # still enforced after the merge
    with pytest.raises(ConstraintViolationError):
        pipe.apply_batch(
            _rows(spark, [(4, "U", "u2", 3, b"<p>d</p>", "xx")]), batch_id=2
        )


def test_lake_sink_fails_closed_on_constrained_table(spark, tmpdir_path):
    from crypto_exchange_etl_spark.lake.stream_sink import LakeSinkWriter
    from pyspark.sql import types as T

    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    pipe.table.add_constraint("lang_known", "lang in ('en','de','fr')")
    schema = T.StructType([T.StructField("url", T.StringType())])
    with pytest.raises(ValueError, match="lake_sink cannot"):
        LakeSinkWriter(schema, {"path": pipe.table_path})
    # explicit opt-out is honored: init proceeds PAST the constraint
    # guard to the ordinary input-schema validation
    with pytest.raises(ValueError, match="must carry 'warc_ts'"):
        LakeSinkWriter(
            schema, {"path": pipe.table_path, "skipConstraints": "true"}
        )


def test_empty_quarantine_read(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    q = pipe.table.quarantine()
    assert q.count() == 0 and "_batch_id" in q.columns


def test_bad_policy_rejected(spark, tmpdir_path):
    pipe = _seed(spark, os.path.join(tmpdir_path, "t"))
    pipe.table.add_constraint("c", "lang is not null")
    t = LakeTable.load(spark, pipe.table_path)
    with pytest.raises(ValueError, match="on_violation"):
        t.merge_apply(
            _rows(spark, [(9, "I", "u9", 9, b"<p>z</p>", "en")]),
            batch_id=9,
            on_violation="explode",
        )
