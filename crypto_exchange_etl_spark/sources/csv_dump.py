"""Bulk CSV dump source — the reference's S3 historical downloader (S3).

Reference: ``HistoricalDownloader(url, columns)`` pulls a whole gzipped
daily CSV dump, prunes to requested columns, parses everything as
strings, then the scalar transforms type it
(/root/reference/fintick/downloader/downloader.py:8-38).

Spark-first: ``spark.read.csv`` with an explicit schema — column pruning
and gz decompression are native; the declared schema replaces the
all-strings-then-cast dance (types parse in the scan, bad rows land in
``_corrupt_record`` under PERMISSIVE mode instead of raising mid-frame).
At 100 TB this is a plain distributed scan: gzip files are not
splittable, so one task per file — dumps should be day/hour-sharded
(the reference's layout already is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Raw dump columns (reference downloads: symbol, timestamp, price,
#: volume, side — /root/reference/fintick/providers/bitmex/constants.py)
DUMP_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType(), True),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("size", T.DoubleType(), True),
        T.StructField("side", T.StringType(), True),
    ]
)


def read_csv_dump(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DUMP_SCHEMA,
    columns: list[str] | None = None,
    header: bool = True,
) -> DataFrame:
    """Read a (possibly gzipped) CSV dump with schema-on-read + pruning."""
    df = (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    return df.select(*columns) if columns else df


def dump_to_ticks(df: DataFrame) -> DataFrame:
    """Raw dump → TICKS_SCHEMA-shaped rows using the §2.7 scalar builders
    (volume/notional convention, tick rule from side, ns split, PER-SYMBOL
    index via row_number — W4, mirroring the reference's
    ``calculate_index`` per symbol,
    /root/reference/fintick/providers/bitmex/lib.py:4-11).

    The index window partitions by symbol, so parallelism = #symbols and
    no row ever funnels through a single global task — at 100 TB a
    ``partitionBy(lit(1))`` window would be a driver-adjacent
    serialization point."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.market import strip_nanoseconds

    ts, nanos = strip_nanoseconds("timestamp")
    w = Window.partitionBy("symbol").orderBy("timestamp", "uid")
    price = F.col("price").cast("decimal(38,18)")
    notional = F.col("size").cast("decimal(38,18)")
    return df.select(
        "uid",
        "symbol",
        ts.alias("timestamp"),
        nanos.alias("nanoseconds"),
        price.alias("price"),
        (F.col("price") * F.col("size")).cast("decimal(38,18)").alias("volume"),
        notional.alias("notional"),
        F.when(F.col("side") == "buy", 1).otherwise(-1).cast("int").alias("tickRule"),
        (F.row_number().over(w) - 1).cast("long").alias("index"),
    )
