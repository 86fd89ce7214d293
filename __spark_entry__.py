"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`crypto_exchange_etl_spark.queries` — the engine's
query registry where every implemented operator from SURVEY.md §2 (plus
the training-data extension operators) is exposed as a
``(spark_impl, duckdb_oracle_sql)`` pair engineered for bit-deterministic
cross-engine comparison.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from crypto_exchange_etl_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CDC engine replay — change envelope → vectorized
    extraction → LWW MERGE into the bucketed snapshot lake table →
    logical read (see queries.q_cdc_replay_engine)."""
    return QUERIES["cdc_replay_engine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — one for EVERY
    registry entry, including the sequential bar kernels (``thresh_bars``
    / ``renko_bars``), whose per-symbol folds are re-expressed as
    recursive CTEs over bar cuts (see queries.py)."""
    return dict(ORACLES)
