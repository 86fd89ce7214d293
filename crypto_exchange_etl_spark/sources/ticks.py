"""Deterministic synthetic trade/tick generator (Spark-native).

Mirrors the controllable properties of the reference's test generator
(/root/reference/test/utils.py:7-85 — randomized prices, notional, tick
rule, controllable timestamp equality/jitter) but is seeded, deterministic,
and distributed: every column is a pure function of (seed, index) built
from Spark expressions, so tick fixtures scale to any size without driver
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_U = 2_147_483_647


def _u(col, seed: int, salt: int):
    return (
        F.pmod(F.xxhash64(col, F.lit(seed), F.lit(salt)), F.lit(_U)).cast("double") / _U
    )


def generate_ticks(
    spark: SparkSession,
    n: int,
    symbols: tuple[str, ...] = ("BTC",),
    seed: int = 42,
    base_price: float = 1000.0,
    base_ts: str = "2024-01-01 00:00:00",
    ts_step_secs: float = 1.0,
    p_same_timestamp: float = 0.2,
    parallelism: int | None = None,
) -> DataFrame:
    """Ticks with TICKS_SCHEMA shape. ``p_same_timestamp`` controls runs of
    equal timestamps (the property the reference's compaction tests tune,
    /root/reference/test/utils.py:40-76)."""
    rng = spark.range(0, n, 1, parallelism or spark.sparkContext.defaultParallelism)
    idx = F.col("id")

    sym = F.element_at(
        F.array(*[F.lit(s) for s in symbols]),
        (F.pmod(F.xxhash64(idx, F.lit(seed), F.lit(0)), len(symbols)) + 1).cast("int"),
    )
    # random walk price: base * (1 + small cumulative drift via hash sum is
    # not expressible without a window; use bounded deterministic wiggle)
    wiggle = (_u(idx, seed, 1) - 0.5) * 0.02
    trend = F.sin(idx.cast("double") / 50.0) * 0.05
    price = F.round(F.lit(base_price) * (1.0 + trend + wiggle), 2)

    notional = F.round(_u(idx, seed, 2) * 10.0 + 0.001, 4)
    volume = F.round(price * notional, 6)

    # timestamps: floor(idx · (1-p)) collapses ~p of consecutive indexes into
    # the same second (deterministic without a running-sum window); rows in
    # the same second share nanoseconds and (mostly) tickRule, producing the
    # equal-(ts, ns, tickRule) runs that exercise A2 compaction.
    secs = F.floor(idx.cast("double") * (1.0 - p_same_timestamp)).cast("long")
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(base_ts).cast("timestamp")) + secs * int(ts_step_secs)
    )
    nanos = (F.pmod(F.xxhash64(secs, F.lit(seed), F.lit(5)), 1_000_000) * 1000).cast("long")
    tick_rule = F.when(
        _u(idx, seed, 6) < 0.1,  # occasional intra-second flip
        F.when(_u(idx, seed, 7) < 0.5, 1).otherwise(-1),
    ).otherwise(F.when(_u(secs, seed, 3) < 0.5, 1).otherwise(-1))

    return rng.select(
        F.concat(F.lit("uid-"), idx.cast("string")).alias("uid"),
        sym.alias("symbol"),
        ts.alias("timestamp"),
        nanos.alias("nanoseconds"),
        price.cast("decimal(38,18)").alias("price"),
        volume.cast("decimal(38,18)").alias("volume"),
        notional.cast("decimal(38,18)").alias("notional"),
        tick_rule.cast("int").alias("tickRule"),
        idx.alias("index"),
    )
