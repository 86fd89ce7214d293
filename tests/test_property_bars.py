"""Property-based tests for the sequential bar kernels (pure pandas —
no Spark per example, so hypothesis can hammer them).

The reference pins bar semantics with a handful of fixed split-vs-whole
cases (/root/reference/test/test_renko_aggregator.py:26-54); these
generalize that to RANDOM inputs and RANDOM split points — the
split-equivalence property is what makes the distributed carry paths
(IncrementalBars, GroupState bars) correct at every batch boundary, so
it deserves adversarial inputs, not examples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from crypto_exchange_etl_spark.operators.bars import (
    renko_bars_pandas,
    thresh_bars_pandas,
)


def _frame(rows: list[tuple[int, int, int, int]]) -> pd.DataFrame:
    """(ts_step, price_cents, volume, tick_rule) rows → a tick frame.

    Timestamps accumulate the drawn steps (step 0 ⇒ same-second trades,
    distinguished by nanoseconds), so frames exercise duplicates and
    day boundaries (steps are up to 6 h)."""
    ts, out = pd.Timestamp("2024-01-01 20:00:00"), []
    for i, (step, cents, vol, rule) in enumerate(rows):
        ts = ts + pd.Timedelta(seconds=step * 3600)
        price = cents / 100.0
        out.append(
            {
                "timestamp": ts,
                "nanoseconds": (i * 37) % 1000,
                "index": i,
                "price": price,
                "volume": float(vol),
                "notional": price * vol,
                "tickRule": rule,
            }
        )
    return pd.DataFrame(
        out,
        columns=[
            "timestamp", "nanoseconds", "index", "price", "volume",
            "notional", "tickRule",
        ],
    )


ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),      # hour step (crosses days)
        st.integers(min_value=50, max_value=5000),  # price in cents
        st.integers(min_value=1, max_value=50),     # volume
        st.sampled_from([1, -1]),                   # tick rule
    ),
    min_size=0,
    max_size=40,
)


def _bars_eq(a: list[dict], b: list[dict]) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if set(x) != set(y):
            return False
        for k in x:
            vx, vy = x[k], y[k]
            if isinstance(vx, float):
                if vx != pytest.approx(vy, rel=1e-9, abs=1e-9):
                    return False
            elif vx != vy:
                return False
    return True


@settings(max_examples=120, deadline=None)
@given(rows=ROWS, cut_frac=st.floats(0, 1), era=st.sampled_from([None, "D", "W"]))
def test_thresh_split_equals_whole(rows, cut_frac, era):
    pdf = _frame(rows)
    cut = int(len(pdf) * cut_frac)
    whole, cache_w = thresh_bars_pandas(pdf, "notional", 300.0, top_n=2, era=era)
    b1, c1 = thresh_bars_pandas(pdf.iloc[:cut], "notional", 300.0, top_n=2, era=era)
    b2, c2 = thresh_bars_pandas(
        pdf.iloc[cut:], "notional", 300.0, top_n=2, cache=c1, era=era
    )
    assert _bars_eq(b1 + b2, whole)
    assert c2.get("cum", 0.0) == pytest.approx(cache_w.get("cum", 0.0), rel=1e-9)
    assert (c2.get("partial") is None) == (cache_w.get("partial") is None)


@settings(max_examples=120, deadline=None)
@given(rows=ROWS, cut_frac=st.floats(0, 1))
def test_renko_split_equals_whole(rows, cut_frac):
    pdf = _frame(rows)
    cut = int(len(pdf) * cut_frac)
    whole, cache_w = renko_bars_pandas(pdf, box_size=2.0, top_n=1)
    b1, c1 = renko_bars_pandas(pdf.iloc[:cut], box_size=2.0, top_n=1)
    b2, c2 = renko_bars_pandas(pdf.iloc[cut:], box_size=2.0, top_n=1, cache=c1)
    assert _bars_eq(b1 + b2, whole)
    assert c2.get("level") == cache_w.get("level")


@settings(max_examples=120, deadline=None)
@given(rows=ROWS)
def test_thresh_conserves_volume(rows):
    """Nothing lost, nothing invented: Σ bar volumes + trailing partial
    == Σ input volumes (same for tick counts)."""
    pdf = _frame(rows)
    bars, cache = thresh_bars_pandas(pdf, "notional", 300.0)
    part = cache.get("partial")
    got_vol = sum(b["volume"] for b in bars) + (part["volume"] if part else 0.0)
    got_ticks = sum(b["ticks"] for b in bars) + (part["ticks"] if part else 0)
    assert got_vol == pytest.approx(float(pdf["volume"].sum()), rel=1e-9)
    assert got_ticks == len(pdf)


@settings(max_examples=80, deadline=None)
@given(rows=ROWS)
def test_thresh_era_reset_equals_per_day_runs(rows):
    """era="D" must be EXACTLY equivalent to running the kernel one
    calendar day at a time with a fresh cache per day (the reference
    rebuilds its cache at each era boundary, dropping the partial)."""
    pdf = _frame(rows)
    with_era, _ = thresh_bars_pandas(pdf, "notional", 300.0, era="D")
    per_day: list[dict] = []
    if len(pdf):
        for _, day in pdf.groupby(pdf["timestamp"].dt.normalize(), sort=True):
            b, _ = thresh_bars_pandas(
                day.reset_index(drop=True), "notional", 300.0
            )
            per_day.extend(b)
    assert _bars_eq(with_era, per_day)
