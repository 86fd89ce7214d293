"""SparkSession factory with scale-appropriate defaults.

Single place that encodes the engine's tuning posture (the reference has
no engine config at all — its "tuning" is BigQuery defaults,
/root/reference/fintick/bqloader/base.py:60-112):

- AQE on: runtime shuffle-partition coalescing and skew-split stand in for
  the reference's total lack of parallelism handling.
- Arrow on: every Python-boundary crossing is vectorized (mandated by the
  input_hint — "no per-row Python").
- UTC session timezone: the reference tz-localizes every frame to UTC
  (/root/reference/fintick/downloader/lib.py:5-11); here it is one config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "crypto_exchange_etl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the engine.

    ``cores=None`` → ``local[*]``. On a real cluster the same confs apply;
    only ``master`` changes (spark-submit supplies it).
    """
    cores_s = "*" if cores is None else str(cores)
    n_shuffle = shuffle_partitions or (cores if cores else DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(f"local[{cores_s}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
