"""Last-writer-wins key compaction — the engine's core dedup operator.

Reference analogue: uid set-membership dedup + validity gate
(/root/reference/fintick/controllers/base.py:88-99, operator P7 in
SURVEY.md §2.2). The CDC generalization (north_star): per ``url``, the
winner is the event with the greatest ``(warc_ts, lsn)``; everything else
in the batch is superseded.

Two physical strategies, same logical result:

1. ``lww_compact_window`` — ``row_number() over (partition by url order by
   warc_ts desc, lsn desc) = 1``. Simple, but a window forces a full
   shuffle of *all* rows on ``url`` and sorts each partition; a hot url
   (Zipf head) concentrates its entire update history in one task.

2. ``lww_compact`` (default) — two-phase ``max_by(struct(payload),
   struct(warc_ts, lsn))`` aggregation. A ``groupBy`` aggregate gets
   **map-side partial aggregation** from Catalyst: each input partition
   reduces every url it sees to one candidate *before* the shuffle, so a
   url with 10^6 updates ships ≤ #input-partitions candidates instead of
   10^6 rows. This is the salting/skew answer built into the operator —
   no explicit salt column needed, because partial agg is exactly
   pre-aggregation per (url × input-split).

At 100 TB: strategy 2's shuffle volume is O(distinct urls per input split),
not O(events) — the difference between a bounded merge stage and a skewed
straggler. ``.explain`` shows ``HashAggregate(partial) → Exchange →
HashAggregate(final)`` with no Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Columns that define LWW precedence, in order (north_star key).
ORDER_COLS = ("warc_ts", "lsn")


def lww_compact(
    df: DataFrame, key: str = "url", order_cols: tuple[str, ...] = ORDER_COLS
) -> DataFrame:
    """Keep, per key, the single event with max ``order_cols`` tuple.

    Output columns = input columns (order preserved).
    """
    cols = df.columns
    payload = F.struct(*[F.col(c) for c in cols])
    rank = F.struct(*[F.col(c) for c in order_cols])
    winner = df.groupBy(key).agg(F.max_by(payload, rank).alias("_w"))
    return winner.select(*[F.col(f"_w.{c}").alias(c) for c in cols])


def lww_compact_window(
    df: DataFrame, key: str = "url", order_cols: tuple[str, ...] = ORDER_COLS
) -> DataFrame:
    """Window-function variant (kept for tests/plan comparison)."""
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
