"""Reference-parity tests for derived aggregations (SURVEY.md §2.4/§5).

Oracle cases carried over from the reference's own tests:
- run-compaction count matrix + vwap — /root/reference/test/test_aggregator.py
- renko level sequences incl. inexact down-cross — test_renko_aggregator.py
- split-vs-whole cache equivalence — test_renko_aggregator.py:26-54
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.operators.bars import (
    renko_bars,
    renko_bars_pandas,
    thresh_bars,
    thresh_bars_pandas,
)
from crypto_exchange_etl_spark.operators.candles import aggregate_candles
from crypto_exchange_etl_spark.operators.run_compaction import compact_runs
from crypto_exchange_etl_spark.operators.topn import topn_in_group
from crypto_exchange_etl_spark.sources.ticks import generate_ticks

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _ticks_df(spark, rows):
    """rows: (symbol, sec, ns, price, volume, notional, tickRule, index)"""
    data = [
        (f"uid{i}", r[0], T0 + dt.timedelta(seconds=r[1]), r[2],
         float(r[3]), float(r[4]), float(r[5]), r[6], r[7])
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "uid string, symbol string, timestamp timestamp, nanoseconds long, "
        "price double, volume double, notional double, tickRule int, index long",
    )
    for c in ("price", "volume", "notional"):
        df = df.withColumn(c, F.col(c).cast("decimal(38,18)"))
    return df


# ------------------------------------------------------------ run compaction


def _n_runs(spark, rows):
    return compact_runs(_ticks_df(spark, rows)).count()


def test_equal_symbol_ts_ns_tick_collapses(spark):
    rows = [("A", 0, 0, 1, 1, 1, 1, 0), ("A", 0, 0, 2, 1, 1, 1, 1)]
    assert _n_runs(spark, rows) == 1


def test_unequal_tick_splits(spark):
    rows = [("A", 0, 0, 1, 1, 1, 1, 0), ("A", 0, 0, 2, 1, 1, -1, 1)]
    assert _n_runs(spark, rows) == 2


def test_unequal_symbol_splits(spark):
    rows = [("A", 0, 0, 1, 1, 1, 1, 0), ("B", 0, 0, 2, 1, 1, 1, 1)]
    assert _n_runs(spark, rows) == 2


def test_unequal_timestamp_splits(spark):
    rows = [("A", 0, 0, 1, 1, 1, 1, 0), ("A", 1, 0, 2, 1, 1, 1, 1)]
    assert _n_runs(spark, rows) == 2


def test_unequal_nanoseconds_splits(spark):
    rows = [("A", 0, 0, 1, 1, 1, 1, 0), ("A", 0, 5, 2, 1, 1, 1, 1)]
    assert _n_runs(spark, rows) == 2


def test_mixed_matrix(spark):
    rows = [
        ("A", 0, 0, 1, 1, 1, 1, 0), ("A", 0, 0, 2, 1, 1, 1, 1),  # run 1
        ("A", 1, 0, 3, 1, 1, -1, 2),                              # run 2
        ("B", 0, 0, 1, 1, 1, 1, 3), ("B", 0, 0, 2, 1, 1, 1, 4),  # run 3
        ("B", 1, 0, 3, 1, 1, -1, 5),                              # run 4
    ]
    assert _n_runs(spark, rows) == 4


def test_vwap_and_run_values(spark):
    """vwap(prices 1,2,3 @ notional 1) = Σvolume/Σnotional = 6/3 = 2
    (reference test_vwap, volume = price × notional)."""
    rows = [
        ("A", 0, 0, 1, 1, 1, 1, 0),
        ("A", 0, 0, 2, 2, 1, 1, 1),
        ("A", 0, 0, 3, 3, 1, 1, 2),
    ]
    out = compact_runs(_ticks_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert float(r.vwap) == 2.0
    assert float(r.price) == 3.0  # last price in run
    assert float(r.volume) == 6.0 and float(r.notional) == 3.0
    assert r.ticks == 3


def test_compaction_reduction_on_synthetic(spark):
    ticks = generate_ticks(spark, 5000, symbols=("BTC", "ETH"), p_same_timestamp=0.5)
    n_in, n_out = ticks.count(), compact_runs(ticks).count()
    assert n_out < n_in  # README.md:54 claims 30-50% on real data
    # compaction preserves totals
    a = ticks.agg(F.sum("volume"), F.sum("notional")).collect()[0]
    b = compact_runs(ticks).agg(F.sum("volume"), F.sum("notional")).collect()[0]
    assert a[0] == b[0] and a[1] == b[1]


def _rows_set(df):
    return sorted(tuple(r) for r in df.collect())


def test_strategy_equivalence_interrupted_runs(spark):
    """span ≡ symbol on the adversarial shape: several runs INSIDE one
    (symbol, ts, ns) span (tickRule interruptions), which is exactly the
    case where groupBy(full key) would be wrong and only adjacency-aware
    run ids are right."""
    rows = [
        # span (A, 0, 0): runs {0,1}, {2}, {3,4} by tickRule 1,1,-1,1,1
        ("A", 0, 0, 1, 1, 1, 1, 0), ("A", 0, 0, 2, 1, 1, 1, 1),
        ("A", 0, 0, 3, 1, 1, -1, 2),
        ("A", 0, 0, 4, 1, 1, 1, 3), ("A", 0, 0, 5, 1, 1, 1, 4),
        # span (A, 0, 7): one run
        ("A", 0, 7, 6, 1, 1, 1, 5),
        # span (B, 0, 0): interleaved with A in the global order
        ("B", 0, 0, 9, 1, 1, -1, 6), ("B", 0, 0, 8, 1, 1, -1, 7),
    ]
    df = _ticks_df(spark, rows)
    a = _rows_set(compact_runs(df, strategy="span"))
    b = _rows_set(compact_runs(df, strategy="symbol"))
    assert a == b
    assert len(a) == 5


def test_strategy_equivalence_synthetic(spark):
    """span ≡ symbol row-for-row on generated ticks (heavy same-timestamp
    collisions so spans hold multi-run sequences)."""
    ticks = generate_ticks(
        spark, 4000, symbols=("BTC", "ETH", "SOL"), p_same_timestamp=0.6
    )
    a = _rows_set(compact_runs(ticks, strategy="span"))
    b = _rows_set(compact_runs(ticks, strategy="symbol"))
    assert a == b


def test_thresh_bars_era_grouping_equivalence(spark):
    """Distributed thresh_bars with an era groups on (symbol, era) —
    state resets at era edges, so this must equal the one-kernel-per-
    symbol whole-feed pass exactly, for day and week eras."""
    ticks = generate_ticks(
        spark, 2000, symbols=("BTC", "ETH"), seed=7,
        ts_step_secs=900.0, p_same_timestamp=0.3,
    ).cache()
    pdf_all = ticks.toPandas()
    fields = ("open", "high", "low", "close", "timestamp", "nanoseconds",
              "volume", "buyVolume", "notional", "buyNotional", "ticks",
              "buyTicks")
    key = lambda t: (t[0], t[5], t[6])  # symbol, timestamp, nanoseconds

    for era in ("D", "W"):
        got = sorted(
            (
                (r["symbol"],) + tuple(r[k] for k in fields)
                for r in thresh_bars(ticks, "notional", 60.0, era=era)
                .drop("topN")
                .collect()
            ),
            key=key,
        )
        want = []
        for sym, pdf in pdf_all.groupby("symbol"):
            bars, _ = thresh_bars_pandas(pdf, "notional", 60.0, era=era)
            for b in bars:
                want.append((sym,) + tuple(b.get(k) for k in fields))
        want.sort(key=key)
        assert len(got) == len(want) > 0
        for g, w in zip(got, want):
            assert g[0] == w[0] and g[5] == w[5] and g[6] == w[6]
            for gv, wv in zip(g[1:5] + g[7:], w[1:5] + w[7:]):
                assert float(gv) == pytest.approx(float(wv))


def test_span_strategy_plan_single_shuffle(spark):
    """The span window's exchange is REUSED by the groupBy (group keys ⊇
    partition keys) and the aggregate is hash-based: one shuffle, no
    SortAggregate, no per-symbol SinglePartition."""
    ticks = generate_ticks(spark, 500, symbols=("BTC",), p_same_timestamp=0.5)
    plan = compact_runs(ticks, strategy="span")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SortAggregate" not in plan
    assert "SinglePartition" not in plan


# ----------------------------------------------------------------- candles


def test_candles_ohlc_and_buy_side(spark):
    rows = [
        ("A", 0, 0, 10, 10, 1, 1, 0),
        ("A", 10, 0, 12, 12, 1, -1, 1),
        ("A", 30, 0, 9, 9, 1, 1, 2),
        ("A", 70, 0, 11, 11, 1, -1, 3),  # second minute
    ]
    out = {r.timestamp: r for r in aggregate_candles(
        _ticks_df(spark, rows), "1 minute", carry_open=False).collect()}
    m0 = out[T0.replace(tzinfo=None)]
    assert (float(m0.open), float(m0.high), float(m0.low), float(m0.close)) == (10, 12, 9, 9)
    assert float(m0.buyVolume) == 19 and float(m0.volume) == 31
    assert m0.ticks == 3 and m0.buyTicks == 2
    m1 = out[(T0 + dt.timedelta(minutes=1)).replace(tzinfo=None)]
    assert float(m1.open) == 11 and m1.ticks == 1


def test_candles_carry_open(spark):
    rows = [
        ("A", 0, 0, 10, 10, 1, 1, 0),
        ("A", 70, 0, 20, 20, 1, 1, 1),
    ]
    out = sorted(
        aggregate_candles(_ticks_df(spark, rows), "1 minute", carry_open=True).collect(),
        key=lambda r: r.timestamp,
    )
    # second candle's open = first candle's close (10), high extends to 20
    assert float(out[1].open) == 10 and float(out[1].high) == 20
    # empty buckets are skipped (no gap fill): exactly 2 candles
    assert len(out) == 2


def test_candles_topn(spark):
    rows = [
        ("A", 0, 0, 10, 10, 5, 1, 0),
        ("A", 1, 0, 11, 11, 9, 1, 1),
        ("A", 2, 0, 12, 12, 1, 1, 2),
    ]
    out = aggregate_candles(_ticks_df(spark, rows), "1 minute", top_n=2,
                            carry_open=False).collect()
    tops = out[0].topN
    assert len(tops) == 2
    assert [float(t.notional) for t in tops] == [5.0, 9.0]  # chronological order
    assert tops[0].timestamp < tops[1].timestamp


def test_topn_in_group_prunes_before_collect(spark):
    df = _ticks_df(spark, [("A", 0, i, 10, 10, i, 1, i) for i in range(10)])
    out = topn_in_group(df, ["symbol"], 3).collect()[0]
    assert sorted(float(t.notional) for t in out.topN) == [7.0, 8.0, 9.0]


# ------------------------------------------------------------ threshold bars


def _tick_pdf(specs):
    """specs: list of dicts with price/volume/notional/ticks etc."""
    rows = []
    for i, s in enumerate(specs):
        rows.append(
            {
                "timestamp": T0 + dt.timedelta(seconds=s.get("sec", i)),
                "nanoseconds": s.get("ns", 0),
                "price": float(s.get("price", 1)),
                "volume": float(s.get("volume", s.get("price", 1) * s.get("notional", 1))),
                "notional": float(s.get("notional", 1)),
                "tickRule": s.get("tickRule", 1),
                "ticks": s.get("ticks", 1),
                "index": i,
            }
        )
    return pd.DataFrame(rows)


def test_thresh_cuts_and_reset(spark):
    pdf = _tick_pdf([{"notional": 4}, {"notional": 4}, {"notional": 4},
                     {"notional": 9}, {"notional": 1}])
    bars, cache = thresh_bars_pandas(pdf, "notional", 8.0)
    # cut at row1 (4+4), cut at row3 (4+9 — reset happened), tail row4 partial
    assert len(bars) == 2
    assert bars[0]["notional"] == 8 and bars[1]["notional"] == 13
    assert cache["partial"]["notional"] == 1 and cache["cum"] == 1.0


def test_thresh_split_vs_whole(spark):
    specs = [{"notional": 3, "price": p} for p in (1, 5, 2, 8, 4, 7, 3, 9, 2, 6)]
    pdf = _tick_pdf(specs)
    whole, _ = thresh_bars_pandas(pdf, "notional", 7.0, top_n=3)

    head, tail = pdf.iloc[:4], pdf.iloc[4:].reset_index(drop=True)
    b1, cache = thresh_bars_pandas(head, "notional", 7.0, top_n=3)
    b2, _ = thresh_bars_pandas(tail, "notional", 7.0, top_n=3, cache=cache)
    got = b1 + b2
    assert len(got) == len(whole)
    for a, b in zip(got, whole):
        assert a == b


def test_thresh_era_reset_daily(spark):
    """Era reset (/root/reference/fintick/aggregators/thresh/base.py:38-48):
    at a day boundary the accumulator zeroes and the carried partial is
    dropped; without era the bar spans the boundary."""
    day = 86400
    specs = [
        {"sec": 0, "notional": 4}, {"sec": 10, "notional": 4},
        {"sec": 20, "notional": 5},                      # day-1 tail
        {"sec": day + 5, "notional": 4}, {"sec": day + 10, "notional": 4},
    ]
    pdf = _tick_pdf(specs)
    no_era, _ = thresh_bars_pandas(pdf, "notional", 8.0)
    assert [b["notional"] for b in no_era] == [8, 9]     # 5 carries into day 2
    bars, cache = thresh_bars_pandas(pdf, "notional", 8.0, era="D")
    assert [b["notional"] for b in bars] == [8, 8]       # day-1 tail dropped
    assert cache["partial"] is None and cache["cum"] == 0.0
    assert cache["era"] == "2024-01-02"


def test_thresh_era_weekly_monthly(spark):
    # T0 = Mon 2024-01-01; sec offsets put rows in ISO weeks 1 and 2
    week = 7 * 86400
    specs = [{"sec": 0, "notional": 5}, {"sec": week + 5, "notional": 5},
             {"sec": week + 10, "notional": 5}]
    bars_w, _ = thresh_bars_pandas(_tick_pdf(specs), "notional", 8.0, era="W")
    # week 1: tail 5 dropped at Monday boundary; week 2: 5+5=10 ≥ 8 → one bar
    assert [b["notional"] for b in bars_w] == [10]
    # same rows all in January → monthly era never resets: 5+5=10 cut earlier
    bars_m, _ = thresh_bars_pandas(_tick_pdf(specs), "notional", 8.0, era="M")
    assert [b["notional"] for b in bars_m] == [10]
    assert bars_m[0]["ticks"] == 2 and bars_w[0]["ticks"] == 2


def test_thresh_era_split_vs_whole(spark):
    """Cache carry across an era boundary ≡ one pass (reference
    split-vs-whole property generalized to eras)."""
    day = 86400
    specs = [{"sec": i * 9000, "notional": 3, "price": p}
             for i, p in enumerate((1, 5, 2, 8, 4, 7, 3, 9, 2, 6, 1, 4))]
    assert specs[-1]["sec"] > day  # spans the midnight boundary
    pdf = _tick_pdf(specs)
    whole, wc = thresh_bars_pandas(pdf, "notional", 7.0, top_n=2, era="D")
    for cut in (3, 9, 10):  # mid-day-1, boundary-adjacent, into day-2
        head, tail = pdf.iloc[:cut], pdf.iloc[cut:].reset_index(drop=True)
        b1, cache = thresh_bars_pandas(head, "notional", 7.0, top_n=2, era="D")
        b2, c2 = thresh_bars_pandas(tail, "notional", 7.0, top_n=2,
                                    cache=cache, era="D")
        got = b1 + b2
        assert len(got) == len(whole)
        for a, b in zip(got, whole):
            assert a == b
        assert c2 == wc


def test_thresh_bars_spark_matches_pandas(spark):
    ticks = generate_ticks(spark, 2000, symbols=("BTC", "ETH"), seed=9)
    out = thresh_bars(ticks, "notional", 50.0, top_n=2)
    got = {s: [r.asDict(recursive=True) for r in rows] for s, rows in
           ((sym, sorted([r for r in out.collect() if r.symbol == sym],
                         key=lambda r: (r.timestamp, r.nanoseconds)))
            for sym in ("BTC", "ETH"))}
    pdf_all = ticks.toPandas()
    for c in ("price", "volume", "notional"):
        pdf_all[c] = pdf_all[c].astype("float64")
    for sym in ("BTC", "ETH"):
        sub = pdf_all[pdf_all.symbol == sym].copy()
        bars, _ = thresh_bars_pandas(sub, "notional", 50.0, top_n=2)
        assert len(bars) == len(got[sym])
        for a, b in zip(bars, got[sym]):
            assert abs(a["notional"] - b["notional"]) < 1e-9
            assert a["ticks"] == b["ticks"]


# ----------------------------------------------------------------- renko


def _renko_levels(prices, box=1.0):
    pdf = _tick_pdf([{"price": p} for p in prices])
    bars, _ = renko_bars_pandas(pdf, box)
    return [b["level"] for b in bars]


def test_renko_up_exact(spark):
    assert _renko_levels([1, 2, 3]) == [2, 3]  # first trade seeds level 1


def test_renko_down_exact_no_bar(spark):
    assert _renko_levels([1, 2, 3, 2]) == [2, 3]


def test_renko_down_inexact(spark):
    assert _renko_levels([1, 2, 3, 1.99]) == [2, 3, 2]


def test_renko_down_inexact_then_exact(spark):
    assert _renko_levels([1, 2, 3, 1.99, 2]) == [2, 3, 2]


def test_renko_jump_more_than_one(spark):
    assert _renko_levels([1, 3]) == [3]
    assert _renko_levels([3, 1]) == [1]


def test_renko_split_vs_whole(spark):
    prices = [1, 2, 2, 3, 4, 2.5, 1.2, 3.7, 5, 4.1]
    pdf = _tick_pdf([{"price": p, "notional": i + 1} for i, p in enumerate(prices)])
    whole, _ = renko_bars_pandas(pdf, 1.0, top_n=2)

    head, tail = pdf.iloc[:3], pdf.iloc[3:].reset_index(drop=True)
    b1, cache = renko_bars_pandas(head, 1.0, top_n=2)
    b2, _ = renko_bars_pandas(tail, 1.0, top_n=2, cache=cache)
    got = b1 + b2
    assert [b["level"] for b in got] == [b["level"] for b in whole]
    for a, b in zip(got, whole):
        assert a == b


def test_renko_spark_wrapper(spark):
    ticks = generate_ticks(spark, 1000, symbols=("BTC",), seed=5)
    out = renko_bars(ticks, box_size=20.0, top_n=3)
    rows = sorted(out.collect(), key=lambda r: (r.timestamp, r.nanoseconds))
    pdf = ticks.toPandas()
    for c in ("price", "volume", "notional"):
        pdf[c] = pdf[c].astype("float64")
    bars, _ = renko_bars_pandas(pdf, 20.0, top_n=3)
    assert [r.level for r in rows] == [b["level"] for b in bars]


def test_thresh_bars_invalid_era_raises_descriptively(spark):
    """The era-grouped driver path never hands the era to the kernel
    (groups are pre-split on date_trunc), so its descriptive raise must
    be reproduced at the driver — a bare KeyError from the trunc-unit
    map named neither the argument nor the valid codes."""
    ticks = _ticks_df(spark, [("BTC", 0, 0, 10.0, 1.0, 10.0, 1, 0)])
    with pytest.raises(ValueError, match="era must be one of"):
        thresh_bars(ticks, "notional", 10.0, era="H")
