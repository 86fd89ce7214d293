"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is partition-layout-dependent (same seed, different
split → different rows), which makes corpus subsets unreproducible and
un-oracle-able. These operators sample by **content hash**: a row is in
the sample iff ``portable_hash64(key, seed) mod RESOLUTION`` falls below
the fraction cutoff — a pure projection + filter, so it is

- reproducible bit-for-bit across runs, engines, partitionings, and
  cluster sizes (the property a 100 TB training corpus actually needs:
  re-running the pipeline yields the same train set);
- consistent across tables: the same key always lands on the same side,
  so a train/eval split made on `documents` automatically agrees with
  any table keyed by the same id (no leakage via joins);
- shuffle-free and codegen'd — at scale it's a scan-side filter that
  combines with predicate pushdown.

Reference analogue: none (the reference has no sampling); this is part
of the training-data extension surface (SURVEY.md training ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql

#: Hash-bucket resolution: fractions are exact multiples of 1/RESOLUTION.
RESOLUTION = 1_000_000


def _slot(key: Column | str, seed: int) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(portable_hash64(c.cast("string"), seed), F.lit(RESOLUTION))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose key-hash slot
    < fraction·RESOLUTION."""
    cutoff = int(fraction * RESOLUTION)
    return df.where(_slot(key_col, seed) < cutoff)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum fractions (e.g. per-language quotas when rebalancing a
    multilingual corpus). Strata not listed get ``default_fraction``."""
    cutoff = F.lit(int(default_fraction * RESOLUTION))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(int(frac * RESOLUTION))
        ).otherwise(cutoff)
    return df.where(_slot(key_col, seed) < cutoff)


def train_eval_split(
    df: DataFrame, key_col: str, eval_fraction: float = 0.01, seed: int = 0
) -> DataFrame:
    """Label every row ``train``/``eval`` by key hash — the leakage-proof
    split: any future table keyed by the same id splits identically."""
    cutoff = int(eval_fraction * RESOLUTION)
    return df.withColumn(
        "split",
        F.when(_slot(key_col, seed) < cutoff, "eval").otherwise("train"),
    )


def hash_slot_sql(key_expr: str, seed: int = 0) -> str:
    """DuckDB expression mirroring :func:`_slot` (for oracles)."""
    key = f"cast({key_expr} as varchar)"
    return f"{portable_hash64_sql(key, seed)} % {RESOLUTION}"


def hash_sample_sql(key_expr: str, fraction: float, seed: int = 0) -> str:
    """DuckDB predicate mirroring :func:`hash_sample` (for oracles)."""
    return f"{hash_slot_sql(key_expr, seed)} < {int(fraction * RESOLUTION)}"
