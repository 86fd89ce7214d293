"""Data-driven bars: threshold ("volume clock") and renko — operators A4/A5.

These are the reference's only genuinely sequential kernels
(/root/reference/fintick/aggregators/thresh/lib.py:72-93 and
/root/reference/fintick/aggregators/renko/lib.py:57-87 — single-threaded
``iterrows`` folds). Semantics preserved, algorithms re-designed:

- **Threshold bars**: accumulate ``thresh_attr`` (volume/notional/ticks) in
  event order; cut a bar whenever the running sum reaches ``thresh_value``;
  the accumulator resets to 0 at the cut (remainder NOT carried — reference
  behavior); the tail after the last cut carries forward as a partial bar.
  Instead of a per-row loop, cuts are found with repeated
  ``np.searchsorted`` on the prefix-sum array: O(#bars · log n).
- **Renko bars**: brick levels quantized by ``level = trunc(price/box)·box``;
  a bar is cut when price reaches ``level ± box``; on an inexact down-cross
  the level rounds back up one box (reference's remainder rule,
  renko/lib.py:48-52); the cut row's bar is labeled with the NEW level; the
  first ever trade only seeds the level and is discarded. Inherently a
  state loop → tight numpy loop over primitive arrays (no pandas per-row).
- **Partial-bar carry** (reference ``nextDay`` cache + ``merge_cache``,
  /root/reference/fintick/aggregators/lib.py:84-113): a carried partial bar
  merges into the next emitted bar — open from the partial, high/low
  extremes, additive sums, topN re-merged — giving the split-vs-whole
  equivalence property the reference tests
  (/root/reference/test/test_renko_aggregator.py:26-54).

Spark integration: ``applyInPandas`` per symbol (each symbol's stream is an
independent total order — same parallelism model as the reference's
one-function-per-symbol fan-out). Numeric narrowing: kernels compute in
float64 (the reference itself float-casts for nlargest/idxmin,
/root/reference/fintick/aggregators/lib.py:59); documented engine-wide in
SURVEY.md §1.3.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ORDER = ["timestamp", "nanoseconds", "index"]

_TOPN_FIELDS = ["timestamp", "nanoseconds", "price", "volume", "notional", "tickRule"]

_BAR_COMMON = [
    T.StructField("timestamp", T.TimestampType(), True),
    T.StructField("nanoseconds", T.LongType(), True),
    T.StructField("volume", T.DoubleType(), True),
    T.StructField("buyVolume", T.DoubleType(), True),
    T.StructField("notional", T.DoubleType(), True),
    T.StructField("buyNotional", T.DoubleType(), True),
    T.StructField("ticks", T.LongType(), True),
    T.StructField("buyTicks", T.LongType(), True),
]

TOPN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("timestamp", T.TimestampType(), True),
            T.StructField("nanoseconds", T.LongType(), True),
            T.StructField("price", T.DoubleType(), True),
            T.StructField("volume", T.DoubleType(), True),
            T.StructField("notional", T.DoubleType(), True),
            T.StructField("tickRule", T.IntegerType(), True),
        ]
    )
)

THRESH_BAR_SCHEMA = T.StructType(
    [T.StructField("symbol", T.StringType(), True)]
    + [
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
    ]
    + _BAR_COMMON
    + [T.StructField("topN", TOPN_TYPE, True)]
)

RENKO_BAR_SCHEMA = T.StructType(
    [T.StructField("symbol", T.StringType(), True)]
    + [
        T.StructField("level", T.DoubleType(), True),
        T.StructField("price", T.DoubleType(), True),
    ]
    + _BAR_COMMON
    + [T.StructField("topN", TOPN_TYPE, True)]
)


# ---------------------------------------------------------------- utilities


def _prep(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values([c for c in ORDER if c in pdf.columns]).reset_index(drop=True)
    for c in ("price", "volume", "notional"):
        pdf[c] = pdf[c].astype("float64")
    if "ticks" not in pdf.columns:
        pdf["ticks"] = 1
    pdf["ticks"] = pdf["ticks"].astype("int64")
    return pdf


def _top_n_records(chunk: pd.DataFrame, top_n: int) -> list[dict[str, Any]]:
    if not top_n:
        return []
    sel = chunk.nlargest(top_n, "notional")
    sel = sel.sort_values(["timestamp", "nanoseconds"])
    recs = sel[_TOPN_FIELDS].to_dict("records")
    for r in recs:
        r["tickRule"] = int(r["tickRule"])
    return recs


def _merge_topn(prev: list, cur: list, top_n: int) -> list:
    merged = list(prev) + list(cur)
    if not merged:
        return merged
    merged.sort(key=lambda r: r["notional"], reverse=True)
    merged = merged[:top_n]
    merged.sort(key=lambda r: (r["timestamp"], r["nanoseconds"]))
    return merged


def _agg_chunk(chunk: pd.DataFrame, top_n: int) -> dict[str, Any]:
    buy = chunk["tickRule"].to_numpy() == 1
    vol = chunk["volume"].to_numpy()
    noti = chunk["notional"].to_numpy()
    ticks = chunk["ticks"].to_numpy()
    price = chunk["price"].to_numpy()
    last = chunk.iloc[-1]
    return {
        "timestamp": last["timestamp"],
        "nanoseconds": int(last["nanoseconds"]),
        "open": float(price[0]),
        "high": float(price.max()),
        "low": float(price.min()),
        "close": float(price[-1]),
        "volume": float(vol.sum()),
        "buyVolume": float(vol[buy].sum()),
        "notional": float(noti.sum()),
        "buyNotional": float(noti[buy].sum()),
        "ticks": int(ticks.sum()),
        "buyTicks": int(ticks[buy].sum()),
        "topN": _top_n_records(chunk, top_n),
    }


def _merge_sums(partial: dict[str, Any], bar: dict[str, Any], top_n: int) -> dict[str, Any]:
    """Additive fields + topN merge (reference ``merge_cache``,
    /root/reference/fintick/aggregators/lib.py:93-113)."""
    out = dict(bar)
    for k in ("volume", "buyVolume", "notional", "buyNotional", "ticks", "buyTicks"):
        out[k] = partial[k] + bar[k]
    out["topN"] = _merge_topn(partial.get("topN", []), bar.get("topN", []), top_n)
    return out


def _merge_partial(partial: dict[str, Any], bar: dict[str, Any], top_n: int) -> dict[str, Any]:
    """Fold a carried partial bar into the next emitted bar (A6 semantics:
    open from the partial, high/low extremes, additive sums, topN merge —
    reference ``merge_thresh_cache`` + ``merge_cache``)."""
    out = _merge_sums(partial, bar, top_n)
    out["open"] = partial["open"]
    out["high"] = max(partial["high"], bar["high"])
    out["low"] = min(partial["low"], bar["low"])
    return out


# ------------------------------------------------------------ threshold bars

#: Era lengths for the threshold-bar accumulator reset
#: (/root/reference/fintick/aggregators/thresh/constants.py): day, ISO week
#: (Monday start — the reference resets when the next date is a Monday),
#: month, quarter, year.
ERA_LENGTHS = ("D", "W", "M", "Q", "Y")


def _era_keys(ts: pd.Series, era: str) -> np.ndarray:
    """Per-row era label; a change of label is an era boundary
    (/root/reference/fintick/aggregators/thresh/lib.py:39-62 — the
    reference checks the same calendar rules once per daily batch; row
    granularity subsumes that since eras are ≥ 1 day)."""
    t = pd.to_datetime(ts)
    if era == "D":
        return t.dt.strftime("%Y-%m-%d").to_numpy()
    if era == "W":  # Monday-start week
        monday = t.dt.normalize() - pd.to_timedelta(t.dt.weekday, unit="D")
        return monday.dt.strftime("%Y-%m-%d").to_numpy()
    if era == "M":
        return t.dt.strftime("%Y-%m").to_numpy()
    if era == "Q":
        return (t.dt.year.astype(str) + "Q" + t.dt.quarter.astype(str)).to_numpy()
    if era == "Y":
        return t.dt.year.astype(str).to_numpy()
    raise ValueError(f"era must be one of {ERA_LENGTHS}, got {era!r}")


def _thresh_pass(
    pdf: pd.DataFrame,
    thresh_attr: str,
    thresh_value: float,
    top_n: int,
    cum0: float,
    partial: dict[str, Any] | None,
) -> tuple[list[dict[str, Any]], float, dict[str, Any] | None]:
    """One era-homogeneous pass: returns (bars, cum', partial')."""
    if len(pdf) == 0:
        return [], cum0, partial
    attr = pdf[thresh_attr].astype("float64").to_numpy()
    prefix = np.cumsum(attr) + cum0

    # find cut indices: each cut is the first row where the running sum
    # since the previous cut reaches thresh_value (accumulator resets to 0)
    cuts: list[int] = []
    base = 0.0  # prefix value consumed by previous cuts
    i = 0
    n = len(prefix)
    while i < n:
        j = int(np.searchsorted(prefix, base + thresh_value, side="left"))
        if j >= n:
            break
        cuts.append(j)
        base = prefix[j]
        i = j + 1

    bars: list[dict[str, Any]] = []
    start = 0
    for j in cuts:
        bar = _agg_chunk(pdf.iloc[start : j + 1], top_n)
        if partial is not None:
            bar = _merge_partial(partial, bar, top_n)
            partial = None
        bars.append(bar)
        start = j + 1

    if start < n:
        tail = _agg_chunk(pdf.iloc[start:], top_n)
        partial = _merge_partial(partial, tail, top_n) if partial is not None else tail
        return bars, float(prefix[-1] - base), partial
    return bars, 0.0, partial


def thresh_bars_pandas(
    pdf: pd.DataFrame,
    thresh_attr: str,
    thresh_value: float,
    top_n: int = 0,
    cache: dict[str, Any] | None = None,
    era: str | None = None,
) -> tuple[list[dict[str, Any]], dict[str, Any]]:
    """Pure-pandas threshold-bar kernel with carry cache and era reset.

    cache = {"cum": float, "partial": bar-dict | None, "era": str | None}.
    Returns (bars, cache'). Split-vs-whole equivalent: running the kernel
    over a prefix then the suffix with the carried cache yields the same
    bars as one pass — including across era boundaries.

    ``era`` ∈ {D, W, M, Q, Y}: at each era boundary the accumulator zeroes
    and the carried partial bar is DROPPED (the reference rebuilds the
    initial cache, losing ``nextDay`` —
    /root/reference/fintick/aggregators/thresh/base.py:38-48).
    """
    if not thresh_value > 0:
        # searchsorted with a non-positive target never advances past the
        # current prefix value: the cut loop would append the same index
        # forever (unbounded list, task never terminates)
        raise ValueError(f"thresh_value must be > 0, got {thresh_value!r}")
    cache = dict(cache or {})
    cum = float(cache.get("cum", 0.0))
    partial = cache.get("partial")
    last_era = cache.get("era")

    pdf = _prep(pdf)
    bars: list[dict[str, Any]] = []
    if era is None or len(pdf) == 0:
        bars, cum, partial = _thresh_pass(
            pdf, thresh_attr, thresh_value, top_n, cum, partial
        )
    else:
        keys = _era_keys(pdf["timestamp"], era)
        # contiguous era segments (input is time-sorted by _prep)
        bounds = [0] + [i for i in range(1, len(keys)) if keys[i] != keys[i - 1]]
        for s_idx, start in enumerate(bounds):
            end = bounds[s_idx + 1] if s_idx + 1 < len(bounds) else len(keys)
            seg_key = keys[start]
            if last_era is not None and seg_key != last_era:
                cum, partial = 0.0, None  # era reset
            seg_bars, cum, partial = _thresh_pass(
                pdf.iloc[start:end], thresh_attr, thresh_value, top_n, cum, partial
            )
            bars.extend(seg_bars)
            last_era = seg_key
    cache["cum"] = cum
    cache["partial"] = partial
    cache["era"] = last_era
    return bars, cache


# ----------------------------------------------------------------- renko


def renko_level(price: float, box_size: float) -> float:
    """Level quantization: truncate toward zero to a box multiple
    (reference ``get_level``, renko/lib.py:6-7)."""
    return int(price / box_size) * box_size


def renko_bars_pandas(
    pdf: pd.DataFrame,
    box_size: float,
    top_n: int = 0,
    cache: dict[str, Any] | None = None,
) -> tuple[list[dict[str, Any]], dict[str, Any]]:
    """Pure-pandas renko kernel with carry cache.

    cache = {"level": float, "partial": bar | None}. If no cache, the
    first trade seeds the level and is discarded. (Cuts fire at
    level±box regardless of direction — the reference's rule; no
    reversal state is kept.)
    """
    cache = dict(cache or {})
    pdf = _prep(pdf)
    if "level" not in cache:
        if len(pdf) == 0:
            return [], cache
        cache["level"] = renko_level(float(pdf["price"].iloc[0]), box_size)
        pdf = pdf.iloc[1:].reset_index(drop=True)

    level = float(cache["level"])
    partial = cache.get("partial")
    prices = pdf["price"].to_numpy()

    bars: list[dict[str, Any]] = []
    cut_rows: list[tuple[int, float]] = []  # (row index of cut, new level)
    start = 0
    n = len(prices)
    # state loop over a primitive array — data-dependent, cannot vectorize
    for i in range(n):
        p = prices[i]
        high, low = level + box_size, level - box_size
        if p >= high or p < low:
            new_level = renko_level(p, box_size)
            change = new_level - level
            if p < low and (p % box_size) != 0:
                # inexact down-cross: only fully-crossed boxes count
                change += box_size
                new_level += box_size
            if change != 0:
                cut_rows.append((i, new_level))
                level = new_level

    def _renko_bar(chunk: pd.DataFrame, lvl: float) -> dict[str, Any]:
        bar = _agg_chunk(chunk, top_n)
        bar["level"] = float(lvl)
        bar["price"] = bar.pop("close")
        for k in ("open", "high", "low"):
            bar.pop(k)
        return bar

    for i, new_level in cut_rows:
        bar = _renko_bar(pdf.iloc[start : i + 1], new_level)
        if partial is not None:
            bar = _merge_sums(partial, bar, top_n)
            partial = None
        bars.append(bar)
        start = i + 1

    if start < n:
        tail = _renko_bar(pdf.iloc[start:], level)
        if partial is not None:
            tail = _merge_sums(partial, tail, top_n)
        partial = tail
    cache["level"] = float(level)
    cache["partial"] = partial
    return bars, cache


# ------------------------------------------------ cache (de)serialization
# The carry cache crosses process boundaries twice: worker → driver (as a
# sidecar row of the applyInPandas output) and driver → next micro-batch
# (via the carry-state manifest). JSON with tagged timestamps keeps it
# engine-neutral; all other values are native floats/ints already
# (_agg_chunk converts out of numpy).


def cache_to_json(cache: dict[str, Any] | None) -> str:
    def conv(v):
        if isinstance(v, pd.Timestamp):
            return {"__ts__": v.isoformat()}
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, list):
            return [conv(x) for x in v]
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        return v

    import json

    return json.dumps(conv(cache))


def cache_from_json(s: str | None) -> dict[str, Any] | None:
    if not s:
        return None

    def conv(v):
        if isinstance(v, dict):
            if set(v) == {"__ts__"}:
                return pd.Timestamp(v["__ts__"])
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, list):
            return [conv(x) for x in v]
        return v

    import json

    return conv(json.loads(s))


# ------------------------------------------------------- Spark wrappers


def _bars_df(bars: list[dict[str, Any]], symbol, fields: list[str]) -> pd.DataFrame:
    rows = []
    for b in bars:
        r = {k: b.get(k) for k in fields}
        r["symbol"] = symbol
        rows.append(r)
    return pd.DataFrame(rows, columns=["symbol"] + fields)


#: era code → Spark date_trunc unit; must mirror :func:`_era_keys`
#: (Spark's 'week' is Monday-start, like the kernel's W labels)
_ERA_TRUNC = {"D": "day", "W": "week", "M": "month", "Q": "quarter", "Y": "year"}


def thresh_bars(
    df: DataFrame,
    thresh_attr: str,
    thresh_value: float,
    top_n: int = 0,
    era: str | None = None,
) -> DataFrame:
    """Distributed threshold bars: a sequential kernel per group via
    ``applyInPandas`` (Arrow-batched; the only Python in the plan).
    ``era`` resets the accumulator at day/week/month/quarter/year
    boundaries (reference era_length).

    Scale key: with no era the kernel's state spans the symbol's whole
    feed, so the group is the symbol (one task per symbol — matching the
    reference's one-function-per-symbol model). WITH an era, the state
    fully RESETS at each boundary (accumulator zeroed, carried partial
    DROPPED — :func:`thresh_bars_pandas`), so no information crosses an
    era edge and the groups can be ``(symbol, date_trunc(era, ts))``:
    exact same bars (era-split equivalence pinned in
    tests/test_aggregations.py), parallelism per symbol-era instead of
    per symbol — at a year of daily eras that is 365× the tasks, and
    each pandas batch holds one era instead of the whole history (no
    more single-group memory ceiling)."""
    if not thresh_value > 0:
        raise ValueError(f"thresh_value must be > 0, got {thresh_value!r}")
    fields = [f.name for f in THRESH_BAR_SCHEMA.fields if f.name != "symbol"]

    def fn(key, pdf):
        # era=None inside the kernel: each group IS one era (grouped on
        # date_trunc below), so the reset can never fire inside a group —
        # skipping per-row era labels saves a strftime pass per task
        bars, _cache = thresh_bars_pandas(
            pdf, thresh_attr, thresh_value, top_n=top_n, era=None
        )
        return _bars_df(bars, key[0] if key else None, fields)

    if "symbol" not in df.columns:
        df = df.withColumn("symbol", df["timestamp"].cast("string").substr(0, 0))
    if era is not None:
        if era not in _ERA_TRUNC:
            # the kernel never sees the era (groups are pre-split below),
            # so its descriptive raise must be reproduced here — a bare
            # KeyError from _ERA_TRUNC names neither the arg nor the
            # valid codes
            raise ValueError(
                f"era must be one of {sorted(_ERA_TRUNC)}, got {era!r}"
            )
        grouped = df.groupBy(
            "symbol", F.date_trunc(_ERA_TRUNC[era], F.col("timestamp")).alias("_era")
        )
    else:
        grouped = df.groupBy("symbol")
    return grouped.applyInPandas(fn, THRESH_BAR_SCHEMA)


def renko_bars(df: DataFrame, box_size: float, top_n: int = 0) -> DataFrame:
    fields = [f.name for f in RENKO_BAR_SCHEMA.fields if f.name != "symbol"]

    def fn(key, pdf):
        bars, _cache = renko_bars_pandas(pdf, box_size, top_n=top_n)
        return _bars_df(bars, key[0] if key else None, fields)

    if "symbol" not in df.columns:
        df = df.withColumn("symbol", df["timestamp"].cast("string").substr(0, 0))
    return df.groupBy("symbol").applyInPandas(fn, RENKO_BAR_SCHEMA)
