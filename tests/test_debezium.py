"""Debezium ndjson source: parse parity, dead letters, end-to-end stream.

The conversion contract: a Debezium-encoded feed of the SAME logical
changes must drive the pipeline to the SAME final table state as the
native parquet binlog — including binary ``html`` surviving the base64
round trip byte-for-byte (the extraction UDF's byte-identity depends on
it). Malformed lines dead-letter with a reason and never abort the job.
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.sources.binlog import generate_changes
from crypto_exchange_etl_spark.sources.debezium import (
    debezium_dead_letters,
    debezium_to_changes,
    read_debezium_json,
    read_debezium_json_stream,
)
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

_OPS = {"I": "c", "U": "u", "D": "d"}


def _to_debezium_lines(rows) -> list[str]:
    out = []
    for r in rows:
        img = {
            "url": r.url,
            "warc_ts": r.warc_ts.isoformat(sep=" "),
            "html": base64.b64encode(bytes(r.html)).decode() if r.html is not None else None,
            "lang": r.lang,
        }
        payload = {
            "op": _OPS[r.op],
            "before": img if r.op == "D" else None,
            "after": None if r.op == "D" else img,
            "source": {"lsn": r.lsn, "partition": r.partition},
            "ts_ms": 0,
        }
        out.append(json.dumps({"payload": payload}))
    return out


def _write_ndjson(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def _envelope(df):
    return sorted(
        (r.lsn, r.partition, r.op, r.url, r.warc_ts,
         bytes(r.html) if r.html is not None else None, r.lang)
        for r in df.collect()
    )


def test_roundtrip_parity_with_native_binlog(spark, tmpdir_path):
    native = generate_changes(spark, 600, n_urls=80, seed=9)
    p = os.path.join(tmpdir_path, "feed", "seg-0.json")
    _write_ndjson(p, _to_debezium_lines(native.collect()))
    parsed = read_debezium_json(spark, os.path.dirname(p))
    assert _envelope(parsed) == _envelope(native)


def test_dead_letters_reasons_and_no_abort(spark, tmpdir_path):
    native = generate_changes(spark, 50, n_urls=10, seed=9)
    good = _to_debezium_lines(native.collect())
    bad = [
        "{ this is not json",
        json.dumps({"payload": {"op": "x", "after": {"url": "u", "warc_ts": "2024-01-01 00:00:00"}, "source": {"lsn": 999}}}),
        json.dumps({"payload": {"op": "c", "after": {"url": "u2", "warc_ts": "2024-01-01 00:00:00"}, "source": {}}}),
        json.dumps({"payload": {"op": "c", "after": {"warc_ts": "2024-01-01 00:00:00"}, "source": {"lsn": 1000}}}),
        json.dumps({"payload": {"op": "c", "after": {"url": "u3", "warc_ts": "not a time"}, "source": {"lsn": 1001}}}),
        json.dumps({"payload": {"op": "c", "after": {"url": "u4", "warc_ts": "2024-01-01 00:00:00", "html": "!!!not base64!!!"}, "source": {"lsn": 1002}}}),
    ]
    p = os.path.join(tmpdir_path, "feed", "seg-0.json")
    _write_ndjson(p, good + bad)
    lines = spark.read.text(os.path.dirname(p))
    ok = debezium_to_changes(lines)
    dead = debezium_dead_letters(lines)
    assert ok.count() == len(good)
    reasons = {r.reason: 1 for r in dead.collect()}
    assert set(reasons) == {"unparseable", "unknown_op", "no_lsn", "no_key",
                            "bad_timestamp", "bad_base64"}
    assert dead.count() == len(bad)


def test_pipeline_state_parity(spark, tmpdir_path):
    """Debezium feed and native binlog drive byte-identical final state."""
    native = generate_changes(spark, 1500, n_urls=120, seed=9).cache()
    p = os.path.join(tmpdir_path, "feed", "seg-0.json")
    _write_ndjson(p, _to_debezium_lines(native.collect()))

    a = CdcPipeline(spark, os.path.join(tmpdir_path, "ta"), n_buckets=4)
    a.apply_batch(native, batch_id=0)
    b = CdcPipeline(spark, os.path.join(tmpdir_path, "tb"), n_buckets=4)
    b.apply_batch(read_debezium_json(spark, os.path.dirname(p)), batch_id=0)

    def state(t):
        return sorted(
            (r.url, r.warc_ts, r.text, r.lang, r.lsn, r.is_deleted)
            for r in t.table.read_physical().collect()
        )

    assert state(a) == state(b)
    native.unpersist()


def test_streaming_debezium_source(spark, tmpdir_path):
    """run_stream with the Debezium reader drains the feed exactly-once."""
    native = generate_changes(spark, 900, n_urls=90, seed=9).cache()
    rows = native.collect()
    feed = os.path.join(tmpdir_path, "feed")
    for i in range(3):  # three segment files → three micro-batches
        _write_ndjson(
            os.path.join(feed, f"seg-{i}.json"),
            _to_debezium_lines([r for r in rows if r.lsn % 3 == i]),
        )
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    pipe.run_stream(
        feed,
        os.path.join(tmpdir_path, "ck"),
        available_now=True,
        timeout_secs=300,
        source_reader=read_debezium_json_stream,
    )
    ref = CdcPipeline(spark, os.path.join(tmpdir_path, "ref"), n_buckets=4)
    ref.apply_batch(native, batch_id=0)
    got = sorted(
        (r.url, r.lsn) for r in pipe.table.read_physical()
        .where(~F.col("is_deleted")).select("url", "lsn").collect()
    )
    want = sorted(
        (r.url, r.lsn) for r in ref.table.read_physical()
        .where(~F.col("is_deleted")).select("url", "lsn").collect()
    )
    assert got == want
    native.unpersist()


def test_run_debezium_stream_with_dead_letters(spark, tmpdir_path):
    """End-to-end: raw ndjson feed with malformed lines mixed in → table
    state equals the clean replay AND every bad line lands quarantined
    with a reason, batch-scoped."""
    native = generate_changes(spark, 600, n_urls=60, seed=9).cache()
    rows = native.collect()
    feed = os.path.join(tmpdir_path, "feed")
    bad = ["{ not json", json.dumps({"payload": {"op": "z", "source": {"lsn": 7}}})]
    for i in range(2):
        _write_ndjson(
            os.path.join(feed, f"seg-{i}.json"),
            _to_debezium_lines([r for r in rows if r.lsn % 2 == i]) + bad,
        )
    dlq = os.path.join(tmpdir_path, "dlq")
    pipe = CdcPipeline(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    pipe.run_debezium_stream(
        feed,
        os.path.join(tmpdir_path, "ck"),
        dead_letter_dir=dlq,
        available_now=True,
        timeout_secs=300,
    )
    ref = CdcPipeline(spark, os.path.join(tmpdir_path, "ref"), n_buckets=4)
    ref.apply_batch(native, batch_id=0)

    def live(p):
        return sorted(
            (r.url, r.lsn) for r in p.table.read_physical()
            .where(~F.col("is_deleted")).select("url", "lsn").collect()
        )

    assert live(pipe) == live(ref)
    dead = spark.read.parquet(os.path.join(dlq, "*"))
    assert dead.count() == len(bad) * 2  # per micro-batch, none lost
    assert set(r.reason for r in dead.collect()) == {"unparseable", "unknown_op"}
    native.unpersist()


def test_serializer_is_exact_inverse_of_parser(spark):
    """changes → debezium ndjson → changes is the identity, bit-exact
    including html bytes and timestamp micros; nothing dead-letters."""
    from crypto_exchange_etl_spark.sources.debezium import (
        changes_to_debezium_lines,
        debezium_dead_letters,
        debezium_to_changes,
    )

    changes = generate_changes(spark, 2000, n_urls=200, seed=31)
    lines = changes_to_debezium_lines(changes)
    assert debezium_dead_letters(lines).count() == 0
    back = debezium_to_changes(lines).select(*changes.columns)
    want = sorted(map(tuple, changes.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_exported_feed_replays_to_identical_state(spark, tmpdir_path):
    """Closing the CDC loop: a binlog exported as a Debezium feed and
    re-ingested through the Debezium source lands the SAME final table
    state as applying the native envelopes directly."""
    import os

    from crypto_exchange_etl_spark.sources.debezium import (
        read_debezium_json,
        write_debezium_json,
    )
    from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

    changes = generate_changes(spark, 2500, n_urls=250, seed=32)

    native = CdcPipeline(spark, os.path.join(tmpdir_path, "native"), n_buckets=4)
    native.ensure_table()
    native.apply_batch(changes, batch_id=0)

    feed = os.path.join(tmpdir_path, "feed")
    write_debezium_json(changes, feed)
    rt = CdcPipeline(spark, os.path.join(tmpdir_path, "roundtrip"), n_buckets=4)
    rt.ensure_table()
    rt.apply_batch(read_debezium_json(spark, feed), batch_id=0)

    cols = sorted(native.table.read().columns)
    a = sorted(map(tuple, native.table.read().select(*cols).collect()))
    b = sorted(map(tuple, rt.table.read().select(*cols).collect()))
    assert a == b and a
