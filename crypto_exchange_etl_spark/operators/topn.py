"""Top-N-in-group (operator T1/T2) — significant trades inside a bar.

Reference semantics (/root/reference/fintick/aggregators/lib.py:58-81):
within each bar, take the N rows with the largest ``notional``, keep their
original field values, and re-sort them chronologically by
``(timestamp, nanoseconds)`` into a nested array-of-struct column
(the BigQuery REPEATED RECORD, /root/reference/fintick/bqloader/schema.py:63-77).

Spark-first: a ``rank() over (partition by group order by notional desc)``
prunes to N rows *before* any collection — the scalable alternative to
collecting whole groups — then ``sort_array(collect_list(struct(...)))``
builds the chronological nested array. Both stages are Catalyst built-ins;
the merge-across-partials variant (reference lib.py:103-113) is the same
expression re-applied, which Spark's partial aggregation does implicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPN_FIELDS = ("timestamp", "nanoseconds", "price", "volume", "notional", "tickRule")


def topn_in_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    order_col: str = "notional",
    fields: tuple[str, ...] = TOPN_FIELDS,
) -> DataFrame:
    """Return one row per group: ``group_cols`` + ``topN`` array-of-struct.

    Ties on ``order_col`` break by recency (timestamp, nanoseconds) to keep
    the result deterministic.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col("timestamp").desc(), F.col("nanoseconds").desc()
    )
    pruned = df.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= n)
    # sort_array on struct sorts lexicographically by field order →
    # (timestamp, nanoseconds) first = chronological, like the reference's
    # re-sort after nlargest.
    return pruned.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct(*[F.col(c) for c in fields]))).alias("topN")
    )
