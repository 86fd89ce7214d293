"""Futures / multi-symbol contract model (reference MULTIPLE_SYMBOL family).

The reference models futures as per-exchange instrument lists with
``listing``/``expiry`` timestamps, keeps contracts whose ``expiry ≥
timestamp_from`` (/root/reference/fintick/providers/bitmex/api.py:33-75),
filters the tick frame to those symbols
(/root/reference/fintick/providers/bitmex/base.py:176-178) and attaches
``expiry`` to every emitted row — the MULTIPLE_SYMBOL schema's trailing
column (/root/reference/fintick/bqloader/schema.py:23-27,43-47).

Spark-first: instruments are a dimension table (thousands of rows at
most), so both the active-contract filter and the expiry enrichment are
**broadcast** joins — a map-side hash probe per tick, no shuffle of the
tick stream. At 100 TB of ticks the cost is the scan itself; the
dimension never leaves the driver-broadcast path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INSTRUMENT_COLS = ("symbol", "root_symbol", "listing", "expiry")


def active_contracts(
    instruments: DataFrame,
    as_of: Column | str,
    root_symbol: str | None = None,
) -> DataFrame:
    """Contracts live at ``as_of``: expiry ≥ as_of (the reference's
    ``get_active_futures`` rule, bitmex/api.py:72) and, when given, a
    root-symbol match and listing ≤ as_of."""
    ts = F.lit(as_of).cast("timestamp") if isinstance(as_of, str) else as_of
    out = instruments.where(F.col("expiry") >= ts)
    if "listing" in instruments.columns:
        out = out.where(F.col("listing") <= ts)
    if root_symbol is not None:
        out = out.where(F.col("root_symbol") == root_symbol)
    return out


def filter_to_active(
    ticks: DataFrame,
    instruments: DataFrame,
    as_of: Column | str,
    root_symbol: str | None = None,
    symbol_col: str = "symbol",
) -> DataFrame:
    """P4 at contract granularity: keep only ticks of active contracts
    (broadcast left-semi — the reference's ``filter_dataframe`` query,
    bitmex/base.py:176-178)."""
    act = active_contracts(instruments, as_of, root_symbol).select(symbol_col)
    return ticks.join(F.broadcast(act), symbol_col, "left_semi")


def enrich_expiry(
    ticks: DataFrame, instruments: DataFrame, symbol_col: str = "symbol"
) -> DataFrame:
    """MULTIPLE_SYMBOL shape: attach the contract's ``expiry`` to every
    tick row (broadcast inner join; an unknown symbol has no contract and
    is dropped, matching the reference's symbol-keyed dict)."""
    dim = instruments.select(symbol_col, "expiry")
    return ticks.join(F.broadcast(dim), symbol_col)


def front_contract(
    ticks: DataFrame,
    instruments: DataFrame,
    ts_col: str = "timestamp",
    root_col: str = "root_symbol",
) -> DataFrame:
    """Continuous front-month series: each tick mapped to its root's
    FRONT contract — the live contract (listing ≤ ts ≤ expiry) with the
    nearest expiry. The roll happens exactly at expiry, the rule behind
    every continuous futures chart and the reference's active-contract
    ordering (bitmex/api.py keeps actives sorted by expiry; front =
    head).

    Broadcast range join (contracts are a dimension) + per-tick argmin
    over the handful of matching contracts — the tick stream never
    shuffles for the join; the argmin groupBy is the only exchange.
    Ticks past the last expiry have no front contract and drop (inner
    semantics, mirroring the reference's symbol-keyed dict).

    Assumes tick ROWS are unique (the engine's tick model always carries
    a unique ``index``/lsn column): the argmin groups by all tick
    columns, so two byte-identical input rows would collapse to one
    output row. Callers with an id-free, duplicate-bearing feed must add
    a row id first (round-2 review note).
    """
    dim = instruments.select(
        F.col("root_symbol").alias("_r"),
        F.col("symbol").alias("front_symbol"),
        "listing",
        "expiry",
    )
    j = ticks.join(
        F.broadcast(dim),
        (F.col(root_col) == F.col("_r"))
        & (F.col("expiry") >= F.col(ts_col))
        & (F.col("listing") <= F.col(ts_col)),
    )
    keep = list(ticks.columns)
    return (
        j.groupBy(*keep)
        .agg(
            F.min_by(
                F.struct(F.col("front_symbol"), F.col("expiry")),
                F.struct(F.col("expiry"), F.col("front_symbol")),
            ).alias("_f")
        )
        .select(
            *keep,
            F.col("_f.front_symbol").alias("front_symbol"),
            F.col("_f.expiry").alias("front_expiry"),
        )
    )
