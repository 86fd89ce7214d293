"""Futures/multi-symbol model: active-contract filter + expiry enrich.

Reference semantics pinned: expiry ≥ timestamp_from keeps a contract
(/root/reference/fintick/providers/bitmex/api.py:72), tick frames filter
to active symbols (base.py:176-178), output rows carry expiry
(MULTIPLE_SYMBOL schema). Plan shape: both joins broadcast.
"""

from __future__ import annotations

import datetime as dt

from crypto_exchange_etl_spark.operators.futures import (
    active_contracts,
    enrich_expiry,
    filter_to_active,
)

UTC = dt.timezone.utc


def _instruments(spark):
    rows = [
        ("XBTH24", "XBT", dt.datetime(2023, 12, 1), dt.datetime(2024, 3, 29)),
        ("XBTM24", "XBT", dt.datetime(2024, 3, 1), dt.datetime(2024, 6, 28)),
        ("XBTZ23", "XBT", dt.datetime(2023, 9, 1), dt.datetime(2023, 12, 29)),
        ("ETHH24", "ETH", dt.datetime(2023, 12, 1), dt.datetime(2024, 3, 29)),
    ]
    return spark.createDataFrame(
        rows, "symbol string, root_symbol string, listing timestamp, expiry timestamp"
    )


def _ticks(spark):
    rows = [
        ("XBTH24", dt.datetime(2024, 1, 5), 100.0, 0),
        ("XBTZ23", dt.datetime(2024, 1, 5), 90.0, 1),   # expired contract
        ("XBTM24", dt.datetime(2024, 1, 5), 101.0, 2),  # not yet listed
        ("ETHH24", dt.datetime(2024, 1, 5), 50.0, 3),
        ("UNKNOWN", dt.datetime(2024, 1, 5), 1.0, 4),   # no instrument row
    ]
    return spark.createDataFrame(
        rows, "symbol string, timestamp timestamp, price double, index long"
    )


def test_active_contracts_rules(spark):
    ins = _instruments(spark)
    act = {r.symbol for r in active_contracts(ins, "2024-01-02 00:00:00").collect()}
    # expired Z23 out; M24 not yet listed out
    assert act == {"XBTH24", "ETHH24"}
    xbt = {
        r.symbol
        for r in active_contracts(ins, "2024-01-02 00:00:00", root_symbol="XBT").collect()
    }
    assert xbt == {"XBTH24"}


def test_filter_and_enrich(spark):
    ins = _instruments(spark)
    t = _ticks(spark)
    act = filter_to_active(t, ins, "2024-01-02 00:00:00")
    assert {r.symbol for r in act.collect()} == {"XBTH24", "ETHH24"}
    out = enrich_expiry(act, ins)
    got = {r.symbol: r.expiry for r in out.collect()}
    assert got["XBTH24"] == dt.datetime(2024, 3, 29)
    assert set(out.columns) == {"symbol", "timestamp", "price", "index", "expiry"}


def test_futures_joins_are_broadcast(spark):
    ins = _instruments(spark)
    t = _ticks(spark)
    out = enrich_expiry(filter_to_active(t, ins, "2024-01-02 00:00:00"), ins)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # semi filter + expiry enrich
    assert "SortMergeJoin" not in plan
