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
    return changes_from_parsed(_parsed(lines, value_col))


def changes_from_parsed(c: DataFrame) -> DataFrame:
    """:func:`debezium_to_changes` over an ALREADY-PARSED frame
    (:func:`_parsed` output) — lets a consumer that also needs the dead
    letters parse every line exactly once (persist the parsed frame,
    derive both splits from it)."""
    return c.where(_valid(c)).select(
        "lsn", "partition", "op", "url", "warc_ts", "html", "lang"
    )


def debezium_dead_letters(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """The complement of :func:`debezium_to_changes`: raw lines that
    failed parsing or the envelope invariants, with a reason — land them
    in a quarantine sink and alert on the count; never abort the replay."""
    return dead_letters_from_parsed(_parsed(lines, value_col))


def dead_letters_from_parsed(c: DataFrame) -> DataFrame:
    """:func:`debezium_dead_letters` over an already-parsed frame (the
    one-parse twin of :func:`changes_from_parsed`)."""
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


#: engine op → Debezium op (inverse of _OP_MAP's c/u/d; 'r' also maps to
#: I on read, so serialize→parse is the identity while parse→serialize
#: canonicalizes snapshot reads into creates — documented, not lossy).
_OP_MAP_OUT = {"I": "c", "U": "u", "D": "d"}


def changes_to_debezium_lines(changes: DataFrame) -> DataFrame:
    """Serialize CHANGES_SCHEMA envelopes to Debezium ndjson ``value``
    lines — the exact inverse of :func:`debezium_to_changes`
    (``debezium_to_changes(changes_to_debezium_lines(c)) ≡ c``, tested
    bit-exactly including html bytes).

    This is the sink side of the connector: with it the engine can
    re-emit any slice of a binlog (or a change feed conformed to the
    envelope) as a standard Debezium topic for downstream consumers,
    closing the CDC loop. All expressions are JVM-side (``to_json``,
    ``base64``, ``date_format``) and identical under batch and
    streaming, like the parser.

    Timestamps serialize as ``yyyy-MM-dd HH:mm:ss.SSSSSS`` in the
    session timezone (the engine pins UTC), which ``try_to_timestamp``
    re-parses to the same micros; deletes carry the image in ``before``
    with ``after`` absent, everything else in ``after`` — matching what
    the parser's ``when(op=='d', before).otherwise(after)`` expects.
    """
    op = F.col("op")
    dbz_op = F.lit(None).cast("string")
    for ours, dbz in reversed(_OP_MAP_OUT.items()):
        dbz_op = F.when(op == ours, dbz).otherwise(dbz_op)
    img = F.struct(
        F.col("url").alias("url"),
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("warc_ts"),
        # base64 may MIME-chunk (\r\n every 76 chars) depending on
        # spark.sql.legacy.chunkBase64String.enabled — strip to canonical
        # RFC-4648 so the parser's strict regex (and any non-MIME
        # consumer) accepts the feed
        F.regexp_replace(F.base64(F.col("html")), r"[\r\n]", "").alias("html"),
        F.col("lang").alias("lang"),
    )
    payload = F.struct(
        dbz_op.alias("op"),
        F.when(op == "D", img).alias("before"),
        F.when(op != "D", img).alias("after"),
        F.struct(F.col("lsn").alias("lsn"), F.col("partition").alias("partition")).alias("source"),
        F.unix_millis(F.col("warc_ts")).alias("ts_ms"),
    )
    return changes.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value")
    )


def write_debezium_json(changes: DataFrame, path: str) -> None:
    """Land a batch of envelopes as an ndjson Debezium feed directory
    (one text file per partition — the shape :func:`read_debezium_json`
    and the streaming tail consume)."""
    changes_to_debezium_lines(changes).write.mode("append").text(path)
