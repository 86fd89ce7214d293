"""Temporal operators Spark lacks natively: as-of join and sessionization.

**As-of join** (each left row ← the latest right row at-or-before its
timestamp, per key). Spark has no ASOF JOIN; the common workaround is
``pd.merge_asof`` inside ``applyInPandas``, but that drags every row
through Python. This implementation stays entirely in Catalyst with the
**union-tag trick**:

1. tag both inputs and union them (right rows carry their payload,
   left rows carry null payload),
2. one window per key ordered by (ts, side, tiebreak):
   ``last(payload, ignorenulls=True)`` over unbounded-preceding rows —
   each left row sees the most recent right payload at-or-before it,
3. filter back to left rows.

Cost: ONE shuffle (the window partitionBy) over |L|+|R| narrow rows —
same asymptotics as a sort-merge join, no Python, no per-group memory.
At 100 TB the window sort is the only cost and AQE skew-split applies
to hot keys. Right rows are first deduped to one per (key, ts) by max
tiebreak, which both pins determinism and matches DuckDB's ASOF JOIN
(greatest ts ≤ left ts) for the oracle.

**Sessionization**: gap-based session ids per key (lag → boundary flag →
running sum), the standard window composition; both windows share one
partitioning, so it costs one shuffle plus the final group-by. In
streaming the same semantics come from ``session_window(ts, gap)``
(streaming/windowed.py covers windowed aggs); this batch form exists
because training-data pipelines sessionize historical event logs.

Reference analogue: none directly (SURVEY.md §2 extension); the closest
reference shape is pagination continuity per symbol (S2) which is a
degenerate as-of (latest checkpoint ≤ now).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Session gap: events further apart than this start a new session.
DEFAULT_GAP_SECS = 1800


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + the latest right payload at-or-before each left ``ts``
    (per ``key``). Right rows with equal ``ts`` are collapsed to the max
    ``tiebreak`` row first, so the result is deterministic and equals
    DuckDB's ``ASOF JOIN`` on the deduped right side.

    Output = all ``left`` columns + ``prefix + ts`` / ``prefix + c`` for
    each payload column (null where no right row precedes).

    ``payload_cols`` must be disjoint from ``left``'s columns (``key``
    excluded): the union-tag plan fills via ``last(_, ignorenulls)``, so a
    left column with a payload name would leak the left row's own value
    into the as-of output. Guarded here instead of silently mis-joining.
    """
    clash = (set(payload_cols) & set(left.columns)) - {key}
    if clash:
        raise ValueError(
            f"asof_join payload_cols collide with left columns: {sorted(clash)}; "
            "rename them on one side first"
        )
    # 1. dedupe right: one row per (key, ts), keep max-tiebreak row
    r1 = (
        right.groupBy(key, ts)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload_cols]), F.col(tiebreak)
            ).alias("_p")
        )
        .select(
            key,
            F.col(ts).alias("_rts"),
            *[F.col(f"_p.{c}").alias(c) for c in payload_cols],
        )
    )
    # 2. tag + union (left payload = nulls, right left-cols = nulls)
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.col(ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(left.dtypes)[ts]).alias("_rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload_cols
          if c not in lcols],
    )
    r_tagged = r1.select(
        *[
            F.col(c) if c == key else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.col("_rts").alias("_ats"),
        F.lit(0).alias("_side"),
        F.col("_rts"),
        *[F.col(c) for c in payload_cols if c not in lcols],
    )
    u = l_tagged.unionByName(r_tagged)
    # 3. per-key window: right rows (side 0) sort before left rows with
    #    the same ts, so "at-or-before" includes equal timestamps
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        F.col("_side"),
        F.last("_rts", ignorenulls=True).over(w).alias(f"{prefix}{ts}"),
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    order_tiebreak: str,
    gap_secs: int = DEFAULT_GAP_SECS,
) -> DataFrame:
    """Gap-based sessions per key: lag → boundary flag → running sum.

    Output: one row per session — key, session_id (1-based per key),
    n_events, session_start, session_end. Aggregates are all
    order-independent (count/min/max), keeping the result engine-exact.
    """
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    # parquet naive timestamps load as TIMESTAMP_NTZ; the session runs
    # UTC, so the cast is offset-free and unix_micros stays exact
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    flag = F.when(
        prev.isNull() | ((us - prev) > gap_secs * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = events.withColumn(
        "session_id",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return with_sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )


def proximity_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_secs: int,
) -> DataFrame:
    """All pairs of rows within ``max_gap_secs`` of each other per key —
    the **range/interval join** Spark has no native operator for.

    Naive form is an inequality self-join (O(n²) per key, Catalyst can
    only nested-loop it). The scale path here is the standard
    **bucketization**: quantize time into gap-width buckets; a
    qualifying pair is always in the same or adjacent bucket, so explode
    one side to (bucket, bucket+1) tags and EQUI-join on the tag — a
    hash join on (key, bucket) whose candidate count is O(Σ per-bucket²)
    instead of O(Σ per-key²). Exact |Δt| filter then prunes corner
    cases; pairs are normalized (id_a < id_b) and deduped (same-bucket
    pairs match in both orientations).

    Output: (id_a, id_b, gap_us). DuckDB oracle: the plain inequality
    join (exact, fine at test scale).
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    gap_us = int(max_gap_secs) * 1_000_000
    base = df.select(
        F.col(key).alias("_k"), F.col(id_col).alias("_id"), us.alias("_us"),
        F.floor(us / F.lit(gap_us)).alias("_b"),
    )
    probe = base.select(
        "_k",
        F.col("_id").alias("_id_x"),
        F.col("_us").alias("_us_x"),
        F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_tag"),
    )
    build = base.select(
        "_k",
        F.col("_id").alias("_id_y"),
        F.col("_us").alias("_us_y"),
        F.col("_b").alias("_tag"),
    )
    return (
        probe.join(build, ["_k", "_tag"])
        .where(
            (F.col("_id_x") != F.col("_id_y"))
            & (F.abs(F.col("_us_x") - F.col("_us_y")) <= gap_us)
        )
        .select(
            F.least("_id_x", "_id_y").alias("id_a"),
            F.greatest("_id_x", "_id_y").alias("id_b"),
            F.abs(F.col("_us_x") - F.col("_us_y")).alias("gap_us"),
        )
        .distinct()
    )
