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


def _default_local_dir() -> str | None:
    """Prefer tmpfs for shuffle/spill scratch when available.

    On this sandbox's virtio disk, concurrent small shuffle-file writes +
    fsyncs drive system time to ~4× user time and make high-parallelism
    runs *slower* than low-parallelism ones (measured: 32-core merge 5-30×
    slower than 8-core until shuffle moved to tmpfs). On a real cluster
    the equivalent is executor-local NVMe scratch — standard practice, not
    a benchmark trick. Falls back to Spark's default when /dev/shm is
    absent or small.
    """
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize > 8 * 1024**3:
            return os.path.join(shm, f"spark-local-{os.getuid()}")
    except OSError:
        pass
    return None


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
    # Respect a master supplied by the launcher (spark-submit --master /
    # $SPARK_GRAFT_MASTER): a .master() call in code OVERRIDES spark-submit,
    # which would silently run the whole job local on the driver node of a
    # real cluster. Only default to local[] when nothing upstream set one.
    from pyspark import SparkConf

    preset = os.environ.get("SPARK_GRAFT_MASTER") or SparkConf().get(
        "spark.master", None
    )
    builder = (
        SparkSession.builder.master(preset or f"local[{cores_s}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd level 1, chosen by a pinned A/B at 40M events
        # (evidence/codec_bench_40m.json, BASELINE.md "Payload codec A/B"):
        # replay time statistically equal to snappy at 2 and 8 cores
        # (105.5 vs 110.2 s / 33.2 vs 33.6 s best-of-2) while lake files
        # shrink 2.17x (320 MB -> 148 MB). At 100 TB that is 2x less cold
        # scan IO and replication egress for free; decode stays page-local.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
        # int64-micros timestamps, not legacy INT96: INT96 carries NO
        # parquet column statistics, which silently disables every
        # footer-stats pruning path (time-range scan pruning, expire_rows'
        # metadata-only file drop) — at 100 TB that is the difference
        # between planning on footers and reading data
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # the `lake` batch source prunes data files from pushed predicates
        # (Python Data Source pushFilters, Spark 4.1) — feature-gated off
        # by default upstream
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    # tmpfs scratch is a single-box workaround (see _default_local_dir);
    # on a real cluster spark.local.dir must stay the site's NVMe config —
    # RAM-backed shuffle scratch on executors would evict the page cache.
    local_dir = _default_local_dir()
    if local_dir and (preset is None or preset.startswith("local")):
        builder = builder.config("spark.local.dir", local_dir)

    # Preload pandas/pyarrow in the python-worker daemon (fork inherits them
    # copy-on-write) — without this, the first pandas-UDF stage stalls
    # ~0.5 s × n_cores while every fresh worker cold-imports pandas.
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_root = os.path.dirname(pkg_dir)
    if not os.path.isdir(pkg_dir):
        # shipped via spark-submit --py-files: the package lives inside a
        # zip, so put the ZIP itself on the workers' PYTHONPATH (zipimport)
        # or the daemon-module preload below would fail to resolve
        z = pkg_root
        while z and not z.lower().endswith(".zip") and z != os.path.dirname(z):
            z = os.path.dirname(z)
        if z.lower().endswith(".zip"):
            pkg_root = z
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        py_path = f"{pkg_root}{os.pathsep}{py_path}" if py_path else pkg_root
    builder = builder.config(
        "spark.python.daemon.module", "crypto_exchange_etl_spark.python_daemon"
    ).config("spark.executorEnv.PYTHONPATH", py_path)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _register_lake_formats(spark)
    return spark


def _register_lake_formats(spark: SparkSession) -> None:
    """Make the lake's three faces available as named formats on every
    engine session: ``format("lake")`` (batch read, pushdown-pruned),
    ``format("lake_cdf")`` (change feed, batch + streaming), and
    ``format("lake_sink")`` (exactly-once streaming append). Idempotent —
    re-registration just replaces the entry with the same class."""
    try:
        from .lake.batch_source import LakeDataSource
        from .lake.cdf_source import LakeCdfDataSource
        from .lake.stream_sink import LakeSinkDataSource

        for ds in (LakeDataSource, LakeCdfDataSource, LakeSinkDataSource):
            spark.dataSource.register(ds)
    except Exception:  # pragma: no cover - never block session creation
        pass
