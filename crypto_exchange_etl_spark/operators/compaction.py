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


def lww_compact_salted(
    df: DataFrame,
    key: str = "url",
    order_cols: tuple[str, ...] = ORDER_COLS,
    n_salts: int = 16,
) -> DataFrame:
    """Explicitly salted two-stage LWW (north_star's hot-domain treatment).

    Stage 1 groups by (key, salt) — a hot key's rows split across
    ``n_salts`` reducers — stage 2 merges the per-salt winners. Catalyst's
    map-side partial aggregation already gives this effect implicitly
    (each input split pre-reduces every key it sees — see
    :func:`lww_compact`'s docstring), so the explicit salt only wins when
    a single reducer's FINAL merge of one key's partials is itself the
    bottleneck (a key hot enough to dominate every input split). Provided
    as the tunable escape hatch; results are identical to
    :func:`lww_compact` by construction.
    """
    cols = df.columns
    payload = F.struct(*[F.col(c) for c in cols])
    rank = F.struct(*[F.col(c) for c in order_cols])
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.max_by(payload, rank).alias("_w"), F.max(rank).alias("_r"))
    )
    stage2 = stage1.groupBy(key).agg(F.max_by("_w", "_r").alias("_w"))
    return stage2.select(*[F.col(f"_w.{c}").alias(c) for c in cols])


#: Digits reserved for (lsn·10 + op_code) in the packed rank. lsn < 10^18.
_PACK = 10**19

_OP_CODE = {"I": 1, "U": 2, "D": 3}


def lww_pack_expr(
    ts_col: str = "warc_ts", lsn_col: str = "lsn", op_col: str = "op"
):
    """The packed decimal(38,0) LWW rank: ``µs·10^19 + lsn·10 + op_code``
    (see :func:`lww_winner_keys` for why packing beats ``max_by(struct)``)."""
    pack_lit = F.lit(str(_PACK)).cast("decimal(20,0)")  # 10^19 > max long
    micros = F.unix_micros(F.col(ts_col)).cast("decimal(38,0)")
    # driven by _OP_CODE (the same table lww_unpack inverts) so the two
    # encodings cannot drift; an unknown or NULL op fails the task loudly
    # — the old .otherwise(3) coded any malformed winner as a DELETE,
    # silently tombstoning its key
    op_code = F.lit(None).cast("int")
    for code, num in _OP_CODE.items():
        op_code = F.when(F.col(op_col) == code, F.lit(num)).otherwise(op_code)
    op_code = F.coalesce(
        op_code,
        F.raise_error(
            F.concat(
                F.lit("lww_pack_expr: unknown op code "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        ).cast("int"),
    ).cast("decimal(38,0)")
    return micros * pack_lit + F.col(lsn_col).cast("decimal(38,0)") * 10 + op_code


def lww_unpack(
    df: DataFrame,
    key: str = "url",
    packed_col: str = "_p",
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Invert :func:`lww_pack_expr` on aggregated rows: (key, max packed)
    → (key, lsn, op, is_deleted) of the winner."""
    pack_lit = F.lit(str(_PACK)).cast("decimal(20,0)")
    rem = F.pmod(F.col(packed_col), pack_lit.cast("decimal(38,0)"))
    op_num = F.pmod(rem, F.lit(10).cast("decimal(38,0)")).cast("int")
    lsn = ((rem - op_num) / 10).cast("long")
    op = F.when(op_num == 1, "I").when(op_num == 2, "U").otherwise("D")
    return df.select(
        F.col(key),
        lsn.alias(lsn_col),
        op.alias(op_col),
        (op_num == _OP_CODE["D"]).alias("is_deleted"),
    )


def lww_winner_keys(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Narrow LWW: (key, lsn, op, is_deleted) of each key's winner.

    The rank tuple (event-time µs, lsn, op) is packed into ONE
    ``decimal(38,0)`` — ``µs·10^19 + lsn·10 + op_code`` — because
    ``max`` over a 128-bit decimal has a fixed-size Tungsten buffer and
    compiles to a two-phase **HashAggregate**, while ``max_by(...,
    struct(...))`` falls back to SortAggregate (struct buffers are not
    hash-aggregable) and sorts every input partition. Packed ordering ≡
    (ts, lsn) lexicographic ordering since lsn is unique; requires
    non-negative event times and lsn < 10^18 (10^10-event scale ✓).

    This is the merge path's hot aggregation at scale: a pure hash agg
    with map-side partial reduction and ~24 B/key of shuffle.
    """
    packed = lww_pack_expr(ts_col=ts_col, lsn_col=lsn_col, op_col=op_col)
    agg = df.groupBy(key).agg(F.max(packed).alias("_p"))
    return lww_unpack(agg, key=key, lsn_col=lsn_col, op_col=op_col)


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
