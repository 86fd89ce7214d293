"""Debezium-shaped JSON binlog source → CHANGES_SCHEMA envelope.

Real CDC feeds usually arrive as Debezium change events (ndjson on a
topic/bucket): ``{"payload": {"op": "c|u|d|r", "before": {...},
"after": {...}, "source": {"lsn": …, "partition": …}, "ts_ms": …}}``.
This module parses that shape into the engine's native envelope so the
same `CdcPipeline` consumes either the parquet binlog
(:mod:`.binlog`) or a JSON feed — the reference's analogue is one
controller template consuming many per-exchange REST shapes
(/root/reference/fintick/controllers/base.py:192-225, providers/*/base.py).

Scale notes:

- parsing is ``from_json`` over a text scan — JVM Jackson, no Python,
  and the SAME expressions work batch and streaming (``spark.read.text``
  / ``readStream.text``);
- malformed lines can NOT abort a 10^10-event replay: ``from_json``
  yields null on parse failure, and rows that fail the envelope's
  invariants (missing op/lsn/key, bad op code) are split into a
  dead-letter frame carrying the raw line — count them, land them next
  to the table, keep going (the reference simply 500s and relies on
  Pub/Sub redelivery);
- ``html`` travels base64 in JSON; ``unbase64`` restores the binary
  column so downstream byte-identity (extraction UDF) is preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium value schema (the subset the envelope needs; extra JSON keys
#: are ignored by from_json).
_ROW = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.StringType(), True),  # ISO-8601
        T.StructField("html", T.StringType(), True),  # base64
        T.StructField("lang", T.StringType(), True),
    ]
)
DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("op", T.StringType(), True),
                    T.StructField("before", _ROW, True),
                    T.StructField("after", _ROW, True),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("lsn", T.LongType(), True),
                                T.StructField("partition", T.IntegerType(), True),
                            ]
                        ),
                        True,
                    ),
                    T.StructField("ts_ms", T.LongType(), True),
                ]
            ),
            True,
        )
    ]
)

#: Debezium op → engine op. 'r' (snapshot read) is an insert-shaped
#: initial load; everything else is unknown and dead-letters.
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def _parsed(lines: DataFrame, value_col: str = "value") -> DataFrame:
    p = F.from_json(F.col(value_col), DEBEZIUM_SCHEMA).getField("payload")
    img = F.when(p.getField("op") == "d", p.getField("before")).otherwise(
        p.getField("after")
    )
    op = p.getField("op")
    # chained when instead of a map lookup: element_at raises under ANSI
    # mode (Spark 4 default) when the key is absent — a malformed op must
    # dead-letter, not abort the stream
    mapped = F.lit(None).cast("string")
    for dbz, ours in reversed(_OP_MAP.items()):
        mapped = F.when(op == dbz, ours).otherwise(mapped)
    b64 = img.getField("html")
    # unbase64 (like to_timestamp) THROWS on malformed input under ANSI
    # mode (Spark 4 default); one corrupt event must dead-letter, not
    # abort the stream — so gate both behind shape checks / try_ variants
    b64_ok = b64.isNull() | b64.rlike(
        r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
    )
    return lines.select(
        F.col(value_col).alias("_raw"),
        p.getField("source").getField("lsn").alias("lsn"),
        F.coalesce(
            p.getField("source").getField("partition"), F.lit(0)
        ).alias("partition"),
        op.alias("_dbz_op"),
        mapped.alias("op"),
        img.getField("url").alias("url"),
        F.try_to_timestamp(img.getField("warc_ts")).alias("warc_ts"),
        b64_ok.alias("_b64_ok"),
        F.when(b64_ok, F.unbase64(b64)).alias("html"),
        img.getField("lang").alias("lang"),
    )


def _valid(c: DataFrame) -> Column:
    return (
        F.col("op").isNotNull()
        & F.col("lsn").isNotNull()
        & F.col("url").isNotNull()
        & F.col("warc_ts").isNotNull()
        & F.col("_b64_ok")
    )


def debezium_to_changes(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Valid change events (CHANGES_SCHEMA column set) from a frame of
    raw JSON lines. Works on batch and streaming frames alike."""
    c = _parsed(lines, value_col)
    return c.where(_valid(c)).select(
        "lsn", "partition", "op", "url", "warc_ts", "html", "lang"
    )


def debezium_dead_letters(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """The complement of :func:`debezium_to_changes`: raw lines that
    failed parsing or the envelope invariants, with a reason — land them
    in a quarantine sink and alert on the count; never abort the replay."""
    c = _parsed(lines, value_col)
    reason = (
        F.when(
            F.col("_dbz_op").isNull() & F.col("lsn").isNull(), "unparseable"
        )
        .when(F.col("lsn").isNull(), "no_lsn")
        .when(F.col("op").isNull(), "unknown_op")
        .when(F.col("url").isNull(), "no_key")
        .when(~F.col("_b64_ok"), "bad_base64")
        .otherwise("bad_timestamp")
    )
    return c.where(~_valid(c)).select(
        F.col("_raw").alias("raw"), reason.alias("reason")
    )


def read_debezium_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of an ndjson Debezium feed → valid change events."""
    return debezium_to_changes(spark.read.text(path))


def read_debezium_json_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming tail of an ndjson Debezium feed directory — drop-in for
    :func:`..binlog.read_binlog_stream` in front of ``CdcPipeline``."""
    return debezium_to_changes(
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger).text(
            path
        )
    )
