"""Sequence packing — concatenate documents into fixed token budgets.

Pretraining consumes fixed-length sequences; feeding one short document
per sequence wastes the context window on padding. The standard fix is
**concat-and-chunk packing**: lay documents end-to-end in a
deterministic order and cut every ``budget`` tokens. This operator
computes, per document, WHERE it lands: its pack id and token offset —
the downstream chunker then materializes sequences without any global
coordination (each pack's members are known).

Spark-first shape: one window per stratum (running token sum), no
Python. Packing is stratified (default: by language) — real pipelines
don't mix languages/domains in one pack, and the stratum key is what
makes the cumulative sum SHUFFLE-PARALLEL: a single global order would
serialize into one window partition (the anti-pattern
``dump_to_ticks`` round 1 was flagged for). A real corpus is ~half one
language, so a per-stratum window alone still serializes the dominant
stratum into one task at 100×; ``n_shards`` therefore range-shards each
stratum and runs a TWO-PHASE prefix sum — per-shard window cumsum, then
the (strata × n_shards)-row shard totals cumsum'd and broadcast back as
offsets. Any contiguous split of the ordered sequence yields identical
cumulative sums, so shard boundaries (Spark's sampled range
partitioner) never affect the result — only the parallelism.

Document order within a stratum is (doc_id) — stable, reproducible,
join-back-able; any deterministic curriculum order works the same way.

Reference analogue: none (training-data extension op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import regex_token_count


def pack_documents(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    text_col: str = "text",
    n_shards: int = 1,
) -> DataFrame:
    """Assign each document a (pack_id, pack_offset) within its stratum.

    ``pack_id`` = which fixed-``budget`` sequence this document STARTS
    in under concat-and-chunk; ``pack_offset`` = its first token's
    position inside that pack. A document whose tokens cross a pack
    boundary is split by the downstream chunker — the assignment stays
    exact because offsets are cumulative, not per-pack greedy bins.

    ``n_shards > 1`` engages the two-phase prefix sum: documents are
    range-partitioned on (stratum, id) so each stratum splits into up
    to ``n_shards`` CONTIGUOUS id ranges, the running sum runs per
    (stratum, shard) — parallel even when one stratum dominates — and
    per-shard totals (a broadcast-size side table) shift each shard by
    the tokens before it. Result is bit-identical to ``n_shards=1`` for
    any shard boundaries; only task parallelism changes.

    Output: id, stratum, n_tokens, pack_id, pack_offset.
    """
    n_tok = regex_token_count(text_col).cast("long")
    base = df.select(
        F.col(id_col), F.col(strata_col), n_tok.alias("n_tokens")
    )
    if n_shards <= 1:
        w = (
            Window.partitionBy(strata_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        with_cum = base.withColumn("_end", F.sum("n_tokens").over(w))
    else:
        # shard id = physical range-partition id: monotone in (stratum,
        # id) order, so shards of one stratum are contiguous id ranges
        # and ordering by shard ≡ ordering by id across shards.
        sharded = base.repartitionByRange(n_shards, strata_col, id_col).withColumn(
            "_shard", F.spark_partition_id()
        )
        wl = (
            Window.partitionBy(strata_col, "_shard")
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = sharded.withColumn("_lend", F.sum("n_tokens").over(wl))
        # phase 2: tokens in all PRECEDING shards of the same stratum —
        # ≤ strata × n_shards rows, cumsum'd on the driver-sized side
        # and broadcast back (the range exchange is reused, not rescanned)
        wo = (
            Window.partitionBy(strata_col)
            .orderBy("_shard")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = (
            sharded.groupBy(strata_col, "_shard")
            .agg(F.sum("n_tokens").alias("_tot"))
            .withColumn("_off", F.coalesce(F.sum("_tot").over(wo), F.lit(0).cast("long")))
            .select(strata_col, "_shard", "_off")
        )
        with_cum = local.join(F.broadcast(offsets), [strata_col, "_shard"]).withColumn(
            "_end", F.col("_lend") + F.col("_off")
        )
    start = F.col("_end") - F.col("n_tokens")
    return with_cum.select(
        id_col,
        strata_col,
        "n_tokens",
        F.floor(start / F.lit(budget)).cast("bigint").alias("pack_id"),
        (start % F.lit(budget)).cast("bigint").alias("pack_offset"),
    )
