"""Sketch-based approximate aggregates — the documented 100 TB swap paths.

Several exact registry queries carry a "swap at 100 TB" note:
``q_token_percentiles`` (exact interpolated percentile → bounded-memory
quantile sketch) and the distinct counts in ``q_source_stats`` /
``windowed_page_metrics`` (exact count(distinct) → HyperLogLog++). This
module makes those swaps concrete — same output schema as the exact
forms, one knob for the accuracy/memory trade-off — so the exact query
stays the correctness oracle and the sketch form is the scale path, with
the substitution error pinned by tests (tests/test_sketches.py).

Why the exact forms don't survive 100 TB:

- ``percentile`` materializes every value per group in an in-memory
  buffer on the merging reducer (OOM at billions of rows per group);
  ``percentile_approx`` (Greenwald-Khanna variant, bounded buffer, the
  same role FAISS-land fills with t-digest) merges map-side in O(accuracy)
  memory per group.
- ``count(distinct x)`` rewrites to an expand + extra shuffle of the
  distinct keys; ``approx_count_distinct`` (HLL++, relative error
  ``rsd``) merges a fixed ~1.5 KB register set map-side — no second
  shuffle, no key materialization.

Both are built-in Catalyst ImperativeAggregates: map-side partial
aggregation applies, the sketches cross the exchange (not the raw
values), and the plan shape is identical to the exact form's.

Reference analogue: the reference computes nothing approximate — its
scale ceiling (single-process pandas over one symbol-day,
/root/reference/fintick/aggregators/base.py) never needed sketches.
These exist for the web-corpus sizes this engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import n_tokens

#: percentile_approx accuracy: buffer bound ≈ accuracy values per group;
#: guaranteed rank error ≤ 1/accuracy of the group size. 10_000 ⇒ ±0.01 %
#: rank error in ~80 KB per open group.
DEFAULT_ACCURACY = 10_000

#: approx_count_distinct relative standard deviation (HLL++ precision).
DEFAULT_RSD = 0.01


def approx_token_percentiles(
    documents: DataFrame, accuracy: int = DEFAULT_ACCURACY
) -> DataFrame:
    """Sketch form of q_token_percentiles: same schema, bounded memory.

    ``percentile_approx`` returns a value from the multiset (no
    interpolation), so p50/p90 are exact order statistics of the group up
    to rank error group_size/accuracy — for groups smaller than
    ``accuracy`` the sketch buffers everything and the rank is exact,
    which is what test_sketches pins.
    """
    t = documents.select("lang", n_tokens("text").cast("long").alias("_nt"))
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("_nt").alias("min_tokens"),
        F.percentile_approx("_nt", 0.5, accuracy).alias("p50_tokens"),
        F.percentile_approx("_nt", 0.9, accuracy).alias("p90_tokens"),
        F.max("_nt").alias("max_tokens"),
    )


def approx_source_cardinality(documents: DataFrame, rsd: float = DEFAULT_RSD) -> DataFrame:
    """Per-source distinct-document and distinct-language cardinality via
    HLL++ — the scale form of q_source_stats' exact distinct counts.

    One pass, one shuffle of ~1.5 KB registers per (source, agg); the
    exact form's distinct expand would shuffle every doc_id.
    """
    return documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.approx_count_distinct("doc_id", rsd).alias("approx_distinct_docs"),
        F.approx_count_distinct("lang", rsd).alias("approx_distinct_langs"),
    )
