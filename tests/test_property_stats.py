"""Property tests for the manifest-stats pruning kernels (pure Python —
no Spark per example, so hypothesis can hammer them).

The invariant every tier rests on: pruning may NEVER exclude a file /
row group that could contain a matching row. Equivalently, for any value
v inside [lo, hi] that satisfies the predicate, `_stat_excludes` must
return False; and the write-side string truncation must only WIDEN
[lo, hi].
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from crypto_exchange_etl_spark.lake.batch_source import (
    _norm_stat_probe,
    _prefix_range_hits,
    _prefix_upper,
    _stat_excludes,
)
from crypto_exchange_etl_spark.lake.table import LakeTable

# text alphabets that exercise unicode edge cases incl. astral planes
_TXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF),
    max_size=60,
)
_NUM = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


@settings(max_examples=300, deadline=None)
@given(_TXT)
def test_stat_upper_is_upper_bound(s):
    up = LakeTable._stat_upper(s)
    assert up >= s
    assert len(up) <= max(len(s), LakeTable._STAT_TRUNC)


@settings(max_examples=300, deadline=None)
@given(_TXT, _TXT, _TXT)
def test_truncated_bounds_contain_all_values(a, b, c):
    """Truncate the true [min, max] of three strings the way _scan_files
    does; every original value must stay inside the widened range."""
    vals = [a, b, c]
    lo, hi = min(vals), max(vals)
    t_lo, t_hi = lo[: LakeTable._STAT_TRUNC], LakeTable._stat_upper(hi)
    for v in vals:
        assert t_lo <= v <= t_hi


@settings(max_examples=300, deadline=None)
@given(_TXT, st.lists(_TXT, min_size=1, max_size=4))
def test_prefix_range_never_false_prunes(prefix, values):
    """If ANY value matches the prefix, the [min, max] range of the
    values must hit — pruning only fires when provably no match."""
    if not any(v.startswith(prefix) for v in values):
        return
    lo, hi = min(values), max(values)
    assert _prefix_range_hits([prefix], lo, hi)
    # and with write-side truncation applied on top
    assert _prefix_range_hits(
        [prefix], lo[: LakeTable._STAT_TRUNC], LakeTable._stat_upper(hi)
    )


@settings(max_examples=300, deadline=None)
@given(_TXT)
def test_prefix_upper_dominates_every_extension(p):
    up = _prefix_upper(p)
    if up is None:
        return
    assert up > p
    assert up > p + "￿"  # any extension of p stays below up


_OPS = st.sampled_from(["eq", "gt", "ge", "lt", "le"])


@settings(max_examples=500, deadline=None)
@given(st.lists(_NUM, min_size=2, max_size=6), _OPS, _NUM)
def test_stat_excludes_numeric_soundness(vals, op, probe):
    """If some value in the file satisfies the predicate, the file's
    [min, max] must NOT be excluded."""
    lo, hi = min(vals), max(vals)
    sat = {
        "eq": lambda v: v == probe,
        "gt": lambda v: v > probe,
        "ge": lambda v: v >= probe,
        "lt": lambda v: v < probe,
        "le": lambda v: v <= probe,
    }[op]
    if any(sat(v) for v in vals):
        assert not _stat_excludes(lo, hi, op, probe)


_FLOATS_NAN = st.lists(
    st.floats(allow_nan=True, allow_infinity=False, width=64),
    min_size=2,
    max_size=6,
)


@settings(max_examples=500, deadline=None)
@given(_FLOATS_NAN, _OPS, st.floats(allow_nan=False, allow_infinity=False))
def test_stat_excludes_nan_blindspot_soundness(vals, op, probe):
    """Parquet min/max statistics do NOT see NaN, yet Spark orders NaN
    above every number (NaN > v is TRUE for all v, NaN = NaN is TRUE).
    Pruning from NaN-blind stats must still never drop a satisfying row."""
    import math

    finite = [v for v in vals if not math.isnan(v)]
    if not finite:
        return  # all-NaN column: parquet writes no min/max at all
    lo, hi = min(finite), max(finite)  # what the footer records

    def spark_sat(v):
        if math.isnan(v):
            # Spark NaN semantics: greatest value, equal to itself
            return {"eq": False, "gt": True, "ge": True,
                    "lt": False, "le": False}[op]
        return {
            "eq": v == probe, "gt": v > probe, "ge": v >= probe,
            "lt": v < probe, "le": v <= probe,
        }[op]

    if any(spark_sat(v) for v in vals):
        assert not _stat_excludes(lo, hi, op, probe)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TXT, min_size=2, max_size=6), _OPS, _TXT)
def test_stat_excludes_string_soundness_with_truncation(vals, op, probe):
    lo, hi = min(vals)[: LakeTable._STAT_TRUNC], LakeTable._stat_upper(max(vals))
    sat = {
        "eq": lambda v: v == probe,
        "gt": lambda v: v > probe,
        "ge": lambda v: v >= probe,
        "lt": lambda v: v < probe,
        "le": lambda v: v <= probe,
    }[op]
    if any(sat(v) for v in vals):
        assert not _stat_excludes(lo, hi, op, probe)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2200, 1, 1)
        ),
        min_size=2,
        max_size=5,
    ),
    _OPS,
    st.datetimes(
        min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2200, 1, 1)
    ),
)
def test_stat_excludes_timestamp_soundness(vals, op, probe):
    """Timestamps compare in the manifest's micros encoding."""
    mus = [_norm_stat_probe(v) for v in vals]
    lo, hi = min(mus), max(mus)
    p_mu = _norm_stat_probe(probe)
    sat = {
        "eq": lambda v: v == p_mu,
        "gt": lambda v: v > p_mu,
        "ge": lambda v: v >= p_mu,
        "lt": lambda v: v < p_mu,
        "le": lambda v: v <= p_mu,
    }[op]
    if any(sat(v) for v in mus):
        assert not _stat_excludes(lo, hi, op, probe)


@settings(max_examples=300, deadline=None)
@given(st.lists(_NUM, min_size=2, max_size=6), st.lists(_NUM, min_size=1, max_size=4))
def test_stat_excludes_in_soundness(vals, probes):
    lo, hi = min(vals), max(vals)
    if set(vals) & set(probes):
        assert not _stat_excludes(lo, hi, "in", probes)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TXT, min_size=1, max_size=5), _TXT)
def test_stat_excludes_startswith_soundness(vals, prefix):
    lo, hi = min(vals)[: LakeTable._STAT_TRUNC], LakeTable._stat_upper(max(vals))
    if any(v.startswith(prefix) for v in vals):
        assert not _stat_excludes(lo, hi, "sw", prefix)
