"""Deterministic simulated binlog/WAL generator + readers.

Replaces the reference's paginated-REST source (``iter_api``,
/root/reference/fintick/utils.py:278-324) and its per-exchange pagination
strategies with a seeded, *distributed* change-event generator: every column
is a pure deterministic function of ``(seed, lsn)`` built from Spark
expressions, so generating 10^8+ events is an embarrassingly parallel
``spark.range`` — no driver-side data, no Python in the loop.

Controllable properties mirror the reference's synthetic trade generator
(/root/reference/test/utils.py:40-76), made deterministic per FIXTURES.md §2:

- **Hot-key skew**: log-uniform (Zipf-like) url ids — url 0 is the hottest.
- **LWW cases**: multiple events per (url) and per (url, warc_ts) with
  distinct lsn.
- **Late events**: a fraction of events get a large negative event-time
  jitter, arriving "late" relative to lsn order.
- **Deletes**: a fraction of ops are 'D' with null html/lang.
- **Out-of-order within a micro-batch**: rows inside each segment file are
  not sorted by lsn.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 2^31 scale for uniform derivation from a 64-bit hash
_U_SCALE = 2_147_483_647


def _u(col, seed: int, salt: int):
    """Deterministic uniform[0,1) from a long column (xxhash64, JVM-side)."""
    return (
        F.pmod(F.xxhash64(col, F.lit(seed), F.lit(salt)), F.lit(_U_SCALE)).cast("double")
        / _U_SCALE
    )


def generate_changes(
    spark: SparkSession,
    n_events: int,
    n_urls: int | None = None,
    n_partitions: int = 8,
    seed: int = 42,
    delete_frac: float = 0.03,
    late_frac: float = 0.05,
    base_ts: str = "2024-01-01 00:00:00",
    ts_step_secs: int = 1,
    parallelism: int | None = None,
    lsn_from: int = 0,
    html_repeat: int = 1,
) -> DataFrame:
    """Build the change-event DataFrame (CHANGES_SCHEMA) for
    lsn ∈ [lsn_from, n_events).

    Every value is a pure function of (seed, lsn): two calls with the same
    arguments produce identical data regardless of cluster size — the
    property the reference asserts per-batch with uid uniqueness checks
    (/root/reference/fintick/controllers/base.py:231-234) and we get by
    construction. ``lsn_from`` generates a suffix range directly (same
    values as slicing the full range — lsn is the only generator input).
    """
    n_urls = n_urls or max(16, n_events // 8)
    rng = spark.range(
        lsn_from, n_events, 1, parallelism or spark.sparkContext.defaultParallelism
    )
    lsn = F.col("id")

    # Log-uniform url id → Zipf-like skew (url 0 hottest). ln(n_urls) scale.
    u_url = _u(lsn, seed, 1)
    url_id = F.least(
        F.lit(n_urls - 1),
        (F.exp(u_url * float(math.log(n_urls))) - 1).cast("long"),
    )
    url = F.concat(
        F.lit("https://site-"),
        F.pmod(url_id, 97).cast("string"),
        F.lit(".example.com/page/"),
        url_id.cast("string"),
    )

    # Event time: mostly advances with lsn; late_frac of events arrive with
    # event time up to ~6h in the past (late data for watermark tests).
    late = (_u(lsn, seed, 2) < late_frac).cast("int")
    late_shift = (late * (_u(lsn, seed, 3) * 21600).cast("long")).cast("long")
    ts_secs = (lsn * ts_step_secs) - late_shift
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(base_ts).cast("timestamp")) + ts_secs
    )

    is_delete = _u(lsn, seed, 4) < delete_frac
    op = F.when(is_delete, "D").when(_u(lsn, seed, 5) < 0.5, "I").otherwise("U")

    lang = F.element_at(
        F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")]),
        (F.pmod(F.xxhash64(url_id, F.lit(seed), F.lit(6)), 5) + 1).cast("int"),
    )

    # Deterministic synthetic html: a pure function of (url_id, lsn, lang)
    # so extraction byte-identity is testable. Null for deletes.
    body = F.concat(
        F.lit("word"),
        F.pmod(F.xxhash64(lsn, F.lit(seed), F.lit(7)), 1000).cast("string"),
        F.lit(" content for page "),
        url_id.cast("string"),
        F.lit(" rev "),
        lsn.cast("string"),
    )
    if html_repeat > 1:
        # realistic page sizes: repeat the paragraph (still a pure function
        # of lsn). ~125 B/paragraph ⇒ html_repeat=20 ≈ 2.5 KB pages.
        body = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(html_repeat)),
                lambda i: F.concat(body, F.lit(" para "), i.cast("string")),
            ),
            " <br/> ",
        )
    html = F.when(
        is_delete, F.lit(None).cast("binary")
    ).otherwise(
        F.encode(
            F.concat(
                F.lit("<html><head><title>page-"),
                url_id.cast("string"),
                F.lit("</title></head><body><p>"),
                body,
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        )
    )

    return rng.select(
        lsn.alias("lsn"),
        F.pmod(F.xxhash64(url, F.lit(0)), n_partitions).cast("int").alias("partition"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(lang).alias("lang"),
    )


def write_binlog_segments(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_segments: int = 8,
    files_per_segment: int = 4,
    **gen_kwargs,
) -> list[str]:
    """Materialize the binlog as ``n_segments`` sequential parquet segment
    dirs (``seg=00000`` …), the on-disk analogue of the reference's
    paginated result pages (each REST page → one segment). The streaming
    reader tails these in order; rows within a segment are hash-ordered
    (NOT lsn-ordered), exercising out-of-order handling.
    """
    import os

    per = math.ceil(n_events / n_segments)
    paths = []
    for i in range(n_segments):
        lo, hi = i * per, min((i + 1) * per, n_events)
        if lo >= hi:
            break
        p = f"{out_dir}/seg={i:05d}"
        paths.append(p)
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            continue  # segments are immutable once written (append-only WAL)
        df = generate_changes(spark, hi, lsn_from=lo, **gen_kwargs)
        # scramble physical order within the segment
        df = df.repartition(
            files_per_segment,
            F.pmod(F.xxhash64("lsn", F.lit(99)), files_per_segment),
        )
        df.write.mode("overwrite").parquet(p)
    return paths


def read_binlog(spark: SparkSession, binlog_dir: str) -> DataFrame:
    """Batch read of the whole binlog (full-replay / backfill path —
    reference analogue: ``period_from=2010-01-01`` historical mode,
    /root/reference/fintick/utils.py:194)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(binlog_dir)


def read_binlog_stream(
    spark: SparkSession, binlog_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Structured Streaming tail of the binlog directory (incremental mode —
    reference analogue: hourly cron with 3h lookback,
    /root/reference/fintick/main.py:41-42). Checkpoint offsets replace the
    reference's Firestore pagination ids."""
    from ..model import CHANGES_SCHEMA

    return (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(binlog_dir)
    )
