"""Declared schemas — the engine's data model.

The reference declares every table schema explicitly as BigQuery
``SchemaField`` lists, all REQUIRED (/root/reference/fintick/bqloader/
schema.py:8-96), with a fixed total order ``(timestamp, nanoseconds,
index)`` (schema.py:3-5). We do the same with Spark ``StructType``s, and
the total order becomes ``(url, warc_ts, lsn)`` last-writer-wins order per
FIXTURES.md / BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# CDC model (target engine)
# ---------------------------------------------------------------------------

#: Base lake table of Common-Crawl-style web pages (input_hint shape).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

#: Internal physical columns appended to PAGES rows inside the lake table.
#: ``lsn`` is lineage (which change produced this row); ``is_deleted`` makes
#: deletes tombstones so LWW merge is replay-order independent (the
#: reference gets idempotence from WRITE_TRUNCATE partition overwrite,
#: /root/reference/fintick/bqloader/base.py:91-112 — tombstones are the
#: row-level equivalent).
PAGES_INTERNAL_FIELDS = [
    T.StructField("lsn", T.LongType(), False),
    T.StructField("is_deleted", T.BooleanType(), False),
]

PAGES_PHYSICAL_SCHEMA = T.StructType(list(PAGES_SCHEMA.fields) + PAGES_INTERNAL_FIELDS)

#: Change-event envelope — the simulated binlog/WAL record. Analogue of the
#: reference's per-trade envelope built by ``parse_data``
#: (/root/reference/fintick/controllers/base.py:192-204); ``lsn`` is the
#: globally monotone tiebreaker the reference lacks (its FTX provider's
#: ε-backoff hack for non-unique event times, fintick/providers/ftx/api.py:19-31,
#: is exactly the problem lsn solves).
CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),  # null for 'D'
        T.StructField("lang", T.StringType(), True),
    ]
)

#: Per-partition lineage/metrics ledger — analogue of the Firestore
#: partition documents (/root/reference/fintick/fscache/fscache.py:27-57,
#: summary builder /root/reference/fintick/controllers/base.py:101-129).
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_insert", T.LongType(), False),
        T.StructField("n_update", T.LongType(), False),
        T.StructField("n_delete", T.LongType(), False),
        T.StructField("n_dedup", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Reference-parity tick model (for the derived-aggregation operators)
# ---------------------------------------------------------------------------

#: Raw tick row — reference SINGLE_SYMBOL_SCHEMA
#: (/root/reference/fintick/bqloader/schema.py:12-21). Decimal(38,18) is a
#: documented narrowing of BigQuery BIGNUMERIC(76,38): Spark's max decimal
#: precision is 38 (SURVEY.md §1.3).
TICKS_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType(), True),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("nanoseconds", T.LongType(), False),
        T.StructField("price", T.DecimalType(38, 18), False),
        T.StructField("volume", T.DecimalType(38, 18), False),
        T.StructField("notional", T.DecimalType(38, 18), False),
        T.StructField("tickRule", T.IntegerType(), False),
        T.StructField("index", T.LongType(), False),
    ]
)

#: Aggregate (compacted) tick — reference SINGLE_SYMBOL_AGGREGATE_SCHEMA
#: (/root/reference/fintick/bqloader/schema.py:30-40): drops uid, adds
#: vwap + ticks.
AGG_TICKS_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("nanoseconds", T.LongType(), False),
        T.StructField("price", T.DecimalType(38, 18), False),
        T.StructField("vwap", T.DecimalType(38, 18), True),
        T.StructField("volume", T.DecimalType(38, 18), False),
        T.StructField("notional", T.DecimalType(38, 18), False),
        T.StructField("ticks", T.LongType(), False),
        T.StructField("tickRule", T.IntegerType(), False),
        T.StructField("index", T.LongType(), False),
    ]
)

#: topN nested record inside bars — reference REPEATED RECORD
#: (/root/reference/fintick/bqloader/schema.py:63-77).
TOP_N_STRUCT = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("nanoseconds", T.LongType(), False),
        T.StructField("price", T.DecimalType(38, 18), False),
        T.StructField("volume", T.DecimalType(38, 18), True),
        T.StructField("notional", T.DecimalType(38, 18), False),
        T.StructField("tickRule", T.IntegerType(), False),
    ]
)


def spark_type_name(t: T.DataType) -> str:
    return t.simpleString()
