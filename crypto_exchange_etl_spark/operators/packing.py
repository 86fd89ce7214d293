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
``dump_to_ticks`` round 1 was flagged for). At 100 TB each stratum's
window sorts independently; for a single giant stratum, sub-shard it
(hash of doc_id ranges) and prefix-offset the shards — same two-phase
prefix-sum the ledger rollup uses.

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
) -> DataFrame:
    """Assign each document a (pack_id, pack_offset) within its stratum.

    ``pack_id`` = which fixed-``budget`` sequence this document STARTS
    in under concat-and-chunk; ``pack_offset`` = its first token's
    position inside that pack. A document whose tokens cross a pack
    boundary is split by the downstream chunker — the assignment stays
    exact because offsets are cumulative, not per-pack greedy bins.

    Output: id, stratum, n_tokens, pack_id, pack_offset.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_tok = regex_token_count(text_col).cast("long")
    with_cum = df.select(
        F.col(id_col),
        F.col(strata_col),
        n_tok.alias("n_tokens"),
    ).withColumn("_end", F.sum("n_tokens").over(w))
    start = F.col("_end") - F.col("n_tokens")
    return with_cum.select(
        id_col,
        strata_col,
        "n_tokens",
        F.floor(start / F.lit(budget)).cast("bigint").alias("pack_id"),
        (start % F.lit(budget)).cast("bigint").alias("pack_offset"),
    )
