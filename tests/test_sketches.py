"""Sketch aggregates (functions/sketches.py): substitution error vs exact.

The exact registry queries stay the correctness oracles; these tests pin
that the documented 100 TB swaps (percentile → percentile_approx,
count distinct → HLL++) return the same schema and values within their
declared error bounds, so swapping them into a plan is a config change,
not a semantics change.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.functions.sketches import (
    approx_source_cardinality,
    approx_token_percentiles,
)
from crypto_exchange_etl_spark.functions.text import n_tokens

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_approx_percentiles_exact_when_group_fits_buffer(spark):
    """accuracy ≥ group size ⇒ the sketch buffers every value and the
    answer is the exact order statistic (no interpolation): pin it
    against a rank computed directly."""
    d = _docs(spark)
    got = {r["lang"]: r for r in approx_token_percentiles(d, accuracy=100_000).collect()}

    t = d.select("lang", n_tokens("text").cast("long").alias("nt"))
    for lang, rows in (
        t.groupBy("lang").agg(F.sort_array(F.collect_list("nt")).alias("v")).collect()
    ):
        n = len(rows)
        assert got[lang]["n_docs"] == n
        assert got[lang]["min_tokens"] == rows[0]
        assert got[lang]["max_tokens"] == rows[-1]
        # percentile_approx returns a member of the multiset with rank
        # error ≤ n/accuracy < 1 here ⇒ exactly the ceil-rank statistic
        # or its neighbor (implementation rounds the target rank).
        for p, col in ((0.5, "p50_tokens"), (0.9, "p90_tokens")):
            lo = rows[max(0, int(p * n) - 1)]
            hi = rows[min(n - 1, int(p * n) + 1)]
            assert lo <= got[lang][col] <= hi, (lang, p, got[lang][col], lo, hi)


def test_approx_percentiles_schema_matches_exact_form(spark):
    from crypto_exchange_etl_spark.queries import QUERIES

    exact = QUERIES["token_percentiles"](spark, SF_DIR)
    approx = approx_token_percentiles(_docs(spark))
    assert [f.name for f in approx.schema.fields] == [
        f.name for f in exact.schema.fields
    ]


def test_hll_cardinality_within_rsd(spark):
    d = _docs(spark)
    got = {r["source"]: r for r in approx_source_cardinality(d, rsd=0.01).collect()}
    want = {
        r["source"]: r
        for r in d.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.countDistinct("lang").alias("nl"),
        )
        .collect()
    }
    assert set(got) == set(want) and len(want) >= 2
    for s, w in want.items():
        # HLL++ rsd=0.01: allow 5 sigma plus the small-cardinality
        # sparse-mode exactness (small counts are exact by construction)
        tol = max(2, int(0.05 * w["nd"]))
        assert abs(got[s]["approx_distinct_docs"] - w["nd"]) <= tol
        assert got[s]["approx_distinct_langs"] == w["nl"]  # tiny: sparse-exact
        assert got[s]["n_docs"] == d.where(F.col("source") == s).count()
