"""Reference-parity scalar market functions (SURVEY.md §2.7 F1-F11).

The reference implements these as row-at-a-time ``.apply(axis=1)``
lambdas and per-provider helpers; here each is a Catalyst Column
builder — whole-stage codegen'd, shuffle-free, usable in any projection.
Citations give the reference implementation each mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,18)"


def calculate_notional(volume: Column | str, price: Column | str) -> Column:
    """F1 — notional = volume / price (the reference's inverted-notional
    convention: its ``volume`` is quote value, ``notional`` base quantity;
    /root/reference/fintick/downloader/lib.py:29-31)."""
    v = F.col(volume) if isinstance(volume, str) else volume
    p = F.col(price) if isinstance(price, str) else price
    return (v.cast("double") / p.cast("double")).cast(DEC)


def calculate_tick_rule(tick_direction: Column | str) -> Column:
    """F2 — {PlusTick, ZeroPlusTick} → +1 else −1
    (/root/reference/fintick/downloader/lib.py:34-39)."""
    d = F.col(tick_direction) if isinstance(tick_direction, str) else tick_direction
    return F.when(d.isin("PlusTick", "ZeroPlusTick"), 1).otherwise(-1).cast("int")


def strip_nanoseconds(ts: Column | str) -> tuple[Column, Column]:
    """F3 — split sub-microsecond-carrying timestamps: returns
    (microsecond-truncated-to-ms timestamp, leftover nanoseconds column).
    The reference zeroes sub-millisecond precision into a separate column
    because BigQuery lacks ns (/root/reference/fintick/downloader/lib.py:14-26);
    Spark timestamps are µs so the split point here is milliseconds →
    leftover µs×1000 as "nanoseconds", same shape."""
    c = F.col(ts) if isinstance(ts, str) else ts
    micros = F.unix_micros(c)
    ms_floor = (micros - F.pmod(micros, 1000)).cast("long")
    return (
        F.timestamp_micros(ms_floor),
        (F.pmod(micros, 1000) * 1000).cast("long"),
    )


def parse_datetime(raw: Column | str, unit: str = "ms") -> Column:
    """F5 — epoch int → UTC timestamp (/root/reference/fintick/utils.py:142-144)."""
    c = F.col(raw) if isinstance(raw, str) else raw
    return {
        "s": F.timestamp_seconds(c),
        "ms": F.timestamp_millis(c),
        "us": F.timestamp_micros(c),
    }[unit]


def partition_decorator(ts: Column | str, hourly: bool = False) -> Column:
    """F6 — BigQuery partition-decorator naming ``yyyyMMdd[HH]``
    (/root/reference/fintick/controllers/daily.py:26-41)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyyMMddHH" if hourly else "yyyyMMdd")


def normalize_symbol(sym: Column | str) -> Column:
    """F7 — strip ``-/_`` separators, uppercase
    (/root/reference/fintick/utils.py:116-124)."""
    c = F.col(sym) if isinstance(sym, str) else sym
    return F.upper(F.regexp_replace(c, "[-/_]", ""))


def renko_level(price: Column | str, box_size: float) -> Column:
    """F8 — renko level quantization ``floor(price/box)·box``
    (/root/reference/fintick/aggregators/renko/lib.py:6-7)."""
    p = F.col(price) if isinstance(price, str) else price
    return (F.floor(p.cast("double") / box_size) * box_size).cast(DEC)


def era_boundaries(ts: Column | str) -> list[Column]:
    """F11 — day/week/month/quarter/year era labels used by the
    threshold-bar era reset (/root/reference/fintick/aggregators/thresh/lib.py:39-62)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return [
        F.to_date(c).alias("era_day"),
        F.weekofyear(c).alias("era_week"),
        F.month(c).alias("era_month"),
        F.quarter(c).alias("era_quarter"),
        F.year(c).alias("era_year"),
    ]
