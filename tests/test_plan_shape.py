"""Physical-plan shape assertions — the 100 TB design invariants.

Correctness tests prove WHAT the operators compute; these prove HOW
Catalyst executes them: broadcast where a broadcast is intended, filter
pushdown reaching the parquet scan, map-side partial aggregation in the
LWW compaction, Arrow-vectorized (not row-at-a-time) Python, and the
merge writing without a second payload shuffle. A regression here is a
performance bug invisible to result-comparison tests.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.functions.extract import with_extracted_text
from crypto_exchange_etl_spark.operators.compaction import lww_compact
from crypto_exchange_etl_spark.sources.binlog import generate_changes


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def changes(spark):
    return generate_changes(spark, n_events=10_000, n_urls=500, seed=1)


def test_lww_compact_is_two_phase_aggregate(changes):
    # generic payload LWW: max_by(struct) → SortAggregate (struct buffers
    # are not hash-aggregable) but still partial+final around ONE exchange
    plan = plan_of(lww_compact(changes))
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    assert plan.count("hashpartitioning(") == 1


def test_lww_winner_keys_is_pure_hash_aggregate(changes):
    # the merge path's narrow LWW: packed-decimal rank → two-phase
    # HashAggregate, NO sorts anywhere in the plan
    from crypto_exchange_etl_spark.operators.compaction import lww_winner_keys

    plan = plan_of(lww_winner_keys(changes))
    assert plan.count("HashAggregate") >= 2
    assert "SortAggregate" not in plan
    assert "Sort " not in plan
    assert plan.count("hashpartitioning(") == 1


def test_lww_winner_keys_equals_generic_lww(changes):
    """The packed-decimal narrow LWW must pick exactly the winners the
    generic max_by(struct) LWW picks (late events included)."""
    from crypto_exchange_etl_spark.operators.compaction import lww_winner_keys

    generic = {
        (r.url, r.lsn, r.op)
        for r in lww_compact(changes.select("url", "warc_ts", "lsn", "op")).collect()
    }
    packed = {(r.url, r.lsn, r.op) for r in lww_winner_keys(changes).collect()}
    assert packed == generic


def test_salted_lww_equals_plain(changes):
    from crypto_exchange_etl_spark.operators.compaction import lww_compact_salted

    plain = {(r.url, r.lsn) for r in lww_compact(changes).collect()}
    salted = {(r.url, r.lsn) for r in lww_compact_salted(changes, n_salts=8).collect()}
    assert salted == plain


def test_extraction_is_arrow_vectorized(changes):
    plan = plan_of(with_extracted_text(lww_compact(changes)))
    assert "ArrowEvalPython" in plan  # vectorized pandas UDF
    assert "BatchEvalPython" not in plan  # row-at-a-time python is banned


def test_enrich_join_broadcasts_dimensions(spark, sf_dir):
    from crypto_exchange_etl_spark.queries import q_enrich_join

    plan = plan_of(q_enrich_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).where(
        F.col("event_id") > 100
    ).select("event_id", "user_id")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(event_id), GreaterThan(event_id,100)]" in plan
    # column pruning: html-free narrow read schema
    assert "ReadSchema" in plan and "event_type" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_winner_fetch_is_broadcast_semi_join(spark, changes, tmpdir_path):
    from crypto_exchange_etl_spark.lake.table import LakeTable
    from crypto_exchange_etl_spark.streaming.pipeline import _PAGES_TABLE_SCHEMA

    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), _PAGES_TABLE_SCHEMA)
    narrow = changes.select("url", "warc_ts", "lsn")
    wk = lww_compact(narrow, key="url")
    fetched = changes.join(F.broadcast(wk.select("lsn")), "lsn", "left_semi")
    plan = plan_of(fetched)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_merge_write_has_no_extra_payload_shuffle(spark, changes, tmpdir_path):
    """The merged stream must contain exactly 2 exchanges: the narrow LWW
    key shuffle is separate; payload rows see ONE bucket exchange (window)
    and the broadcast fetch (not an exchange)."""
    from crypto_exchange_etl_spark.lake.table import LakeTable
    from crypto_exchange_etl_spark.streaming.pipeline import _PAGES_TABLE_SCHEMA
    from pyspark.sql import Window

    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t2"), _PAGES_TABLE_SCHEMA)
    wk = lww_compact(changes.select("url", "warc_ts", "lsn"), key="url")
    winners = changes.join(F.broadcast(wk.select("lsn")), "lsn", "left_semi")
    b = F.pmod(F.xxhash64("url"), F.lit(8)).cast("int")
    wspec = Window.partitionBy("bucket").orderBy(
        F.col("url"), F.col("warc_ts").desc(), F.col("lsn").desc()
    )
    merged = (
        winners.withColumn("bucket", b)
        .withColumn("_pk", F.lag("url").over(wspec))
        .where(F.col("_pk").isNull() | (F.col("_pk") != F.col("url")))
    )
    plan = plan_of(merged)
    # exactly TWO hash-partitioned exchanges touch this plan: the narrow
    # lsn-set aggregation (24 B/key) and the bucket window. Payload rows
    # cross only the bucket exchange; the fetch is a broadcast probe.
    assert plan.count("hashpartitioning(bucket") == 1, plan
    assert plan.count("hashpartitioning(") <= 2, plan


def test_corpus_curation_single_wide_op(spark, sf_dir):
    """The curation pipeline (dedup → quality → lang → split) must stay
    one shuffle: only the digest groupBy exchanges data; everything else
    is narrow and fused into the scan/agg stages."""
    from crypto_exchange_etl_spark.queries import q_corpus_curation

    plan = plan_of(q_corpus_curation(spark, sf_dir))
    assert plan.count("hashpartitioning(") == 1, plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_ivf_joins_are_broadcast(spark, sf_dir):
    """IVF probe/assign joins must broadcast the small side (codebook,
    probe lists) — the corpus never rides a shuffle join."""
    from crypto_exchange_etl_spark.queries import q_ann_ivf_topk

    plan = plan_of(q_ann_ivf_topk(spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_repetition_metrics_is_hash_agg_no_python(spark, sf_dir):
    """Repetition metrics = explode + two two-phase hash aggregates; no
    interpreted per-row Python, no sort aggregates."""
    from crypto_exchange_etl_spark.queries import q_repetition_metrics

    plan = plan_of(q_repetition_metrics(spark, sf_dir))
    assert "Generate explode" in plan or "Generate" in plan
    assert plan.count("HashAggregate") >= 4, plan
    assert "BatchEvalPython" not in plan
    assert plan.count("hashpartitioning(") == 2, plan


def test_asof_join_is_joinless_single_key_shuffle(spark, sf_dir):
    """The union-tag as-of join must compile to windows over a union —
    NO join operator, no pandas, and only the (key,ts) dedupe + key
    window exchanges."""
    from crypto_exchange_etl_spark.queries import q_asof_join

    plan = plan_of(q_asof_join(spark, sf_dir))
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin"):
        assert j not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("hashpartitioning(") <= 2, plan


def test_sessionize_shares_one_window_partitioning(spark, sf_dir):
    """lag + running-sum + group-by all hang off the same user_id
    partitioning — one shuffle for the windows, one for the final agg."""
    from crypto_exchange_etl_spark.queries import q_sessionize

    plan = plan_of(q_sessionize(spark, sf_dir))
    assert plan.count("hashpartitioning(") <= 2, plan
    assert "BatchEvalPython" not in plan


def test_minhash_hot_path_has_no_interpreted_lambdas(spark, sf_dir):
    """MinHash signature generation must stay whole-stage-codegen:
    no higher-order array lambdas (transform/zip_with/aggregate are
    interpreted per element) and no Python anywhere."""
    from crypto_exchange_etl_spark.queries import q_minhash_lsh

    plan = plan_of(q_minhash_lsh(spark, sf_dir))
    for hof in ("transform(", "zip_with", "aggregate("):
        assert hof not in plan, f"interpreted HOF {hof} in minhash plan"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4  # two 2-phase groupBys
