"""Query registry: every operator exposed as (Spark impl, DuckDB oracle).

This is the engine's public correctness surface. Each entry is one
operator (or operator composition) from SURVEY.md §2 or the training-data
extension set, implemented Spark-first, with an ANSI-SQL oracle that
DuckDB runs on the identical parquet tables. The driver compares
row-counts, schemas, and order-insensitive value hashes — so every
expression here is engineered to be **bit-deterministic across engines**:

- sums/products run in exact DecimalType (order-independent), cast to
  double only at the end;
- hash-based operators use the portable md5-prefix hash
  (functions/hashing.py) that both engines compute identically;
- floating-point is only ever produced by identical IEEE op sequences on
  identical inputs (division, sqrt of exact values);
- ties in any top-k / argmax are broken by explicit unique keys.

The ``events`` table stands in for the CDC binlog (event_id = lsn,
user_id = key, ts = event time) and — via the deterministic tick mapping
below — for the reference's trade stream (SURVEY.md §1.4 mapping).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import portable_hash64, portable_hash64_sql
from .functions.multimodal import decoded_meta, with_media_from_text
from .functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_RE,
    doc_fingerprint,
    lang_id,
    n_tokens,
    quality_metrics,
    quality_score,
    regex_token_count,
)
from .operators.bars import renko_bars, thresh_bars
from .operators.candles import aggregate_candles
from .operators.compaction import lww_compact
from .operators.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from .operators.run_compaction import compact_runs
from .operators.similarity import ann_lsh_buckets, cosine_topk, hyperplanes, knn_label_vote
from .operators.topn import topn_in_group  # noqa: F401  (nested variant covered in tests)
from .streaming.pipeline import CdcPipeline

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


DEC6 = "decimal(38,6)"

#: events → ticks deterministic mapping (SURVEY.md §1.4): symbol=event_type,
#: lsn=event_id=index, price=value, synthetic volume/notional, tickRule by
#: event-id parity. `trunc="hour"` coarsens timestamps so consecutive-run
#: compaction has real runs to collapse.
def _ticks(spark: SparkSession, sf_dir: str, trunc: str | None = None) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    ts = F.date_trunc(trunc, F.col("ts")) if trunc else F.col("ts")
    return e.select(
        F.col("event_type").alias("symbol"),
        ts.alias("timestamp"),
        F.lit(0).cast("long").alias("nanoseconds"),
        F.col("value").cast(DEC6).alias("price"),
        (F.col("event_id") % 100 + 1).cast(DEC6).alias("volume"),
        (F.col("event_id") % 7 + 1).cast(DEC6).alias("notional"),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(-1).cast("int").alias("tickRule"),
        F.col("event_id").alias("index"),
    )


def _ticks_sql(trunc: str | None = None) -> str:
    ts = f"date_trunc('{trunc}', ts)" if trunc else "ts"
    return f"""
  select event_type as symbol, {ts} as timestamp, cast(0 as bigint) as nanoseconds,
         cast(value as decimal(38,6)) as price,
         cast(event_id % 100 + 1 as decimal(38,6)) as volume,
         cast(event_id % 7 + 1 as decimal(38,6)) as notional,
         cast(case when event_id % 2 = 0 then 1 else -1 end as int) as "tickRule",
         event_id as idx
  from events"""


#: SQL fragment: whitespace tokens of `text`, mirroring functions.text.tokens
TOKS_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def _shingles_sql(k: int = 3) -> str:
    """Mirror of functions.text.word_shingles over `toks`."""
    return (
        f"list_distinct(list_transform(range(1, greatest(len(toks) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' ')))"
    )


def _dot_sql(a: str, b: str) -> str:
    """Mirror of operators.similarity._dot_dec (exact int64 dot over
    10⁶-quantized components)."""
    return (
        f"cast(list_aggregate(list_transform(list_zip({a}, {b}), "
        f"x -> cast(floor(cast(x[1] as double) * 1000000.0) as bigint) * "
        f"cast(floor(cast(x[2] as double) * 1000000.0) as bigint)), 'sum') as bigint)"
    )


# ---------------------------------------------------------------------------
# CDC / reference-parity queries over `events`
# ---------------------------------------------------------------------------


def q_lww_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/P7: last-writer-wins key compaction — the ENGINE's hot-path
    strategy (operators/compaction.py lww_winner_keys): the rank packs
    into one decimal(38,0) so the aggregate is a pure two-phase
    **HashAggregate** (~24 B/key shuffle; ``max_by(struct)`` would fall
    back to SortAggregate), then the winner keys join back for the
    payload — the same narrow-pass shape the merge path runs at scale.
    Identical result to ``lww_compact`` (lsn = event_id is unique)."""
    from .operators.compaction import lww_winner_keys

    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", F.col("event_id").alias("lsn"), "event_type", "value"
    )
    win_in = (
        # parquet ntz → ltz for unix_micros (same cast the CDC envelope does)
        e.withColumn("_ts_ltz", F.col("ts").cast("timestamp"))
        .withColumn("op", F.lit("U"))
    )
    keys = lww_winner_keys(
        win_in, key="user_id", ts_col="_ts_ltz", lsn_col="lsn", op_col="op"
    ).select("user_id", "lsn")
    return e.join(keys, on=["user_id", "lsn"]).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("lsn").alias("last_lsn"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


SQL_LWW = """
with w as (
  select user_id, ts, event_id as lsn, event_type, value,
         row_number() over (partition by user_id order by ts desc, event_id desc) as rn
  from events)
select user_id, ts as last_ts, lsn as last_lsn, event_type as last_event_type,
       value as last_value
from w where rn = 1
"""


def q_validity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: uid-dedup + time-range validity gate (ref controllers/base.py:88-99).

    Dedup is deterministic — min_by over the full-row sort key, not
    dropDuplicates (whose survivor is partition-order dependent) — and the
    oracle mirrors the same survivor rule, so duplicate event_ids in the
    input cannot diverge the engines.
    """
    e = _t(spark, sf_dir, "events")
    row = F.struct("user_id", "ts", "event_type", "value")
    deduped = (
        e.groupBy("event_id")
        .agg(F.min_by(row, row).alias("_r"))
        .select("event_id", "_r.user_id", "_r.ts", "_r.event_type", "_r.value")
    )
    return deduped.where(
        F.col("ts").between(
            F.lit("2024-01-10 00:00:00").cast("timestamp"),
            F.lit("2024-01-20 00:00:00").cast("timestamp"),
        )
    ).select("event_id", "user_id", "ts", "event_type", "value")


SQL_VALIDITY = """
with d as (
  select event_id, user_id, ts, event_type, value,
         row_number() over (partition by event_id
                            order by user_id, ts, event_type, value) as rn
  from events)
select event_id, user_id, ts, event_type, value from d
where rn = 1
  and ts between timestamp '2024-01-10 00:00:00' and timestamp '2024-01-20 00:00:00'
"""


def q_run_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: consecutive-run compaction (sessionize-by-change) on hour-coarse ticks."""
    c = compact_runs(_ticks(spark, sf_dir, trunc="hour"))
    return c.select(
        "symbol",
        "timestamp",
        "nanoseconds",
        F.col("price").cast("double").alias("price"),
        (F.col("volume").cast("double") / F.col("notional").cast("double")).alias("vwap"),
        F.col("volume").cast("double").alias("volume"),
        F.col("notional").cast("double").alias("notional"),
        "ticks",
        "tickRule",
        "index",
    )


SQL_RUN_COMPACTION = f"""
with t as ({_ticks_sql('hour')}),
o as (
  select *,
    lag(timestamp) over w as pts, lag(nanoseconds) over w as pns,
    lag("tickRule") over w as ptr
  from t
  window w as (partition by symbol order by timestamp, nanoseconds, idx)),
b as (
  select *, case when pts is null or pts <> timestamp or pns <> nanoseconds
                  or ptr <> "tickRule" then 1 else 0 end as bnd
  from o),
r as (
  select *, sum(bnd) over (partition by symbol order by timestamp, nanoseconds, idx
                           rows unbounded preceding) as run
  from b),
g as (
  select symbol, run, min(timestamp) as timestamp, min(nanoseconds) as nanoseconds,
         first(price order by timestamp desc, nanoseconds desc, idx desc) as price,
         sum(volume) as volume, sum(notional) as notional,
         cast(count(*) as bigint) as ticks,
         first("tickRule") as "tickRule", min(idx) as "index"
  from r group by symbol, run)
select symbol, timestamp, nanoseconds, cast(price as double) as price,
       cast(volume as double) / cast(notional as double) as vwap,
       cast(volume as double) as volume, cast(notional as double) as notional,
       ticks, "tickRule", "index"
from g
"""


_CANDLE_DOUBLES = [
    "open", "high", "low", "close", "volume", "buyVolume", "notional", "buyNotional"
]


def q_candles_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A3: tumbling 1-hour OHLCV candles with cross-bucket open carry."""
    c = aggregate_candles(_ticks(spark, sf_dir), timeframe="1 hour", carry_open=True)
    return c.select(
        "symbol",
        "timestamp",
        *[F.col(x).cast("double").alias(x) for x in _CANDLE_DOUBLES],
        "ticks",
        "buyTicks",
    )


SQL_CANDLES = f"""
with t as ({_ticks_sql(None)}),
agg as (
  select symbol, date_trunc('hour', timestamp) as bucket,
    first(price order by timestamp, nanoseconds, idx) as open0,
    max(price) as high0, min(price) as low0,
    first(price order by timestamp desc, nanoseconds desc, idx desc) as close,
    sum(volume) as volume,
    sum(case when "tickRule" = 1 then volume else cast(0 as decimal(38,6)) end) as "buyVolume",
    sum(notional) as notional,
    sum(case when "tickRule" = 1 then notional else cast(0 as decimal(38,6)) end) as "buyNotional",
    cast(count(*) as bigint) as ticks,
    cast(sum(case when "tickRule" = 1 then 1 else 0 end) as bigint) as "buyTicks"
  from t group by symbol, date_trunc('hour', timestamp)),
c as (
  select *, coalesce(lag(close) over (partition by symbol order by bucket), open0) as open1
  from agg)
select symbol, bucket as timestamp,
  cast(open1 as double) as open,
  cast(greatest(high0, open1) as double) as high,
  cast(least(low0, open1) as double) as low,
  cast(close as double) as close,
  cast(volume as double) as volume, cast("buyVolume" as double) as "buyVolume",
  cast(notional as double) as notional, cast("buyNotional" as double) as "buyNotional",
  ticks, "buyTicks"
from c
"""


def q_daily_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: hourly→daily consolidation — daily candles rebuilt FROM hourly
    candles; the oracle aggregates ticks directly to daily, so this also
    proves re-aggregation equivalence (partial+final, A6)."""
    h = aggregate_candles(_ticks(spark, sf_dir), timeframe="1 hour", carry_open=False)
    d = (
        h.groupBy("symbol", F.to_date("timestamp").alias("day"))
        .agg(
            F.min_by("open", "timestamp").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "timestamp").alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("buyVolume").alias("buyVolume"),
            F.sum("notional").alias("notional"),
            F.sum("buyNotional").alias("buyNotional"),
            F.sum("ticks").cast("long").alias("ticks"),
            F.sum("buyTicks").cast("long").alias("buyTicks"),
        )
    )
    return d.select(
        "symbol", "day",
        *[F.col(x).cast("double").alias(x) for x in _CANDLE_DOUBLES],
        "ticks", "buyTicks",
    )


SQL_DAILY = f"""
with t as ({_ticks_sql(None)})
select symbol, cast(timestamp as date) as day,
  cast(first(price order by timestamp, nanoseconds, idx) as double) as open,
  cast(max(price) as double) as high, cast(min(price) as double) as low,
  cast(first(price order by timestamp desc, nanoseconds desc, idx desc) as double) as close,
  cast(sum(volume) as double) as volume,
  cast(sum(case when "tickRule" = 1 then volume else cast(0 as decimal(38,6)) end) as double) as "buyVolume",
  cast(sum(notional) as double) as notional,
  cast(sum(case when "tickRule" = 1 then notional else cast(0 as decimal(38,6)) end) as double) as "buyNotional",
  cast(count(*) as bigint) as ticks,
  cast(sum(case when "tickRule" = 1 then 1 else 0 end) as bigint) as "buyTicks"
from t group by symbol, cast(timestamp as date)
"""


def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: top-3 rows per group by measure, deterministic tie-break."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", "ts", "value")
    )


SQL_TOPN = """
with r as (
  select event_type, event_id, ts, value,
         row_number() over (partition by event_type order by value desc, event_id) as rank
  from events)
select event_type, rank, event_id, ts, value from r where rank <= 3
"""


def q_ledger_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/S6: per-partition (day) lineage metrics — counts + watermarks."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("min_lsn"),
            F.max("event_id").alias("max_lsn"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SQL_LEDGER = """
select cast(ts as date) as day, cast(count(*) as bigint) as n_events,
       min(event_id) as min_lsn, max(event_id) as max_lsn,
       cast(sum(cast(value as decimal(38,6))) as double) as sum_value,
       cast(count(distinct user_id) as bigint) as n_users
from events group by cast(ts as date)
"""


def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-key sequence monotonicity check (lag + violation counts)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.withColumn("prev_lsn", F.lag("event_id").over(w))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("prev_lsn").isNotNull() & (F.col("event_id") < F.col("prev_lsn")), 1
            ).otherwise(0)
        ).cast("long").alias("n_out_of_order"),
        F.max(F.col("event_id") - F.coalesce(F.col("prev_lsn"), F.col("event_id")))
        .alias("max_gap"),
    )


SQL_GAPS = """
with o as (
  select user_id, event_id,
         lag(event_id) over (partition by user_id order by ts, event_id) as prev_lsn
  from events)
select user_id, cast(count(*) as bigint) as n_events,
       cast(sum(case when prev_lsn is not null and event_id < prev_lsn then 1 else 0 end) as bigint) as n_out_of_order,
       max(event_id - coalesce(prev_lsn, event_id)) as max_gap
from o group by user_id
"""


def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: argmin/argmax rows per group via min_by/max_by."""
    e = _t(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return e.groupBy("event_type").agg(
        F.min_by("value", key).alias("first_val"),
        F.max_by("value", key).alias("last_val"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


SQL_MINMAX = """
select event_type,
       first(value order by ts, event_id) as first_val,
       first(value order by ts desc, event_id desc) as last_val,
       min(value) as min_val, max(value) as max_val
from events group by event_type
"""


_OP_EXPR = (
    "case when event_type = 'signup' then 'I' "
    "when event_type = 'error' then 'D' else 'U' end"
)


def _changes_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CDC change-event envelope (CHANGES_SCHEMA shape)."""
    e = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    return e.select(
        F.col("event_id").alias("lsn"),
        (F.col("user_id") % 8).cast("int").alias("partition"),
        op.alias("op"),
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").cast("timestamp").alias("warc_ts"),  # parquet ntz → ltz
        F.when(
            op != "D",
            F.encode(F.concat(F.lit("<p>"), F.col("props"), F.lit("</p>")), "utf-8"),
        ).alias("html"),
        F.col("event_type").alias("lang"),
    )


def q_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_star core semantics, pure-relational form: LWW winner per key,
    delete-wins tombstone filter."""
    ch = _changes_from_events(spark, sf_dir).select("lsn", "op", "url", "warc_ts", "lang")
    w = lww_compact(ch, key="url", order_cols=("warc_ts", "lsn"))
    return w.where(F.col("op") != "D").select(
        "url",
        F.col("warc_ts").alias("final_ts"),
        F.col("lsn").alias("final_lsn"),
        F.col("op").alias("final_op"),
        F.col("lang").alias("final_lang"),
    )


SQL_CDC_FINAL = f"""
with ch as (
  select event_id as lsn, {_OP_EXPR} as op,
         concat('user:', cast(user_id as varchar)) as url,
         ts as warc_ts, event_type as lang
  from events),
w as (
  select *, row_number() over (partition by url order by warc_ts desc, lsn desc) as rn
  from ch)
select url, warc_ts as final_ts, lsn as final_lsn, op as final_op, lang as final_lang
from w where rn = 1 and op <> 'D'
"""


def q_cdc_replay_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: the full engine — change envelope → vectorized pandas-UDF
    extraction → LWW MERGE into the bucketed snapshot lake table → logical
    read — must equal a 10-line SQL oracle. Exercises sources, extraction,
    compaction, schema conform, bucket-pruned rewrite, manifest commit."""
    tmp = os.path.join(tempfile.gettempdir(), f"cdc_q_{uuid.uuid4().hex[:8]}")
    pipe = CdcPipeline(spark, tmp, n_buckets=8)
    pipe.apply_batch(_changes_from_events(spark, sf_dir), batch_id=0)
    return pipe.table.read().select("url", "warc_ts", "text", "lang")


SQL_CDC_REPLAY = f"""
with ch as (
  select event_id as lsn, {_OP_EXPR} as op,
         concat('user:', cast(user_id as varchar)) as url,
         ts as warc_ts, props, event_type as lang
  from events),
w as (
  select *, row_number() over (partition by url order by warc_ts desc, lsn desc) as rn
  from ch)
select url, warc_ts,
       trim(regexp_replace(regexp_replace(concat('<p>', props, '</p>'),
            '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) as text,
       lang
from w where rn = 1 and op <> 'D'
"""


def q_replica_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The replication surface end to end: replay the change feed into a
    SOURCE lake table in TWO commits (so the change feed spans multiple
    versions), then run ``replicate_stream`` — one Structured Streaming
    query composing ``lake_cdf`` (source versions as offsets) into
    ``lake_sink`` (atomic MOR snapshot commits) — to drain it into a
    READ REPLICA, and return the REPLICA's logical read. The oracle is
    the same 10-line LWW SQL the source itself must equal: replication
    is correct iff the replica's final state is byte-identical to the
    source's, including the extracted ``text``. Exercises the CDF
    offset/commit protocol, tombstone mapping (delete → higher-ranked
    tombstone), the sink's applied-batches exactly-once guard, and the
    JVM-side destination bucket hash. Reference analogue: mirroring tick
    tables across datasets by re-running loaders
    (/root/reference/fintick/bqloader/base.py:91-112) — here one
    checkpointed query with row-level deltas."""
    from .lake.replicate import create_replica, replicate_stream
    from .lake.table import LakeTable

    tmp = os.path.join(tempfile.gettempdir(), f"cdc_rep_{uuid.uuid4().hex[:8]}")
    src, dst, ck = tmp + "_src", tmp + "_dst", tmp + "_ck"
    pipe = CdcPipeline(spark, src, n_buckets=8)
    ch = _changes_from_events(spark, sf_dir)
    # two source commits: even lsns land first, odd lsns second — the
    # source's own cross-batch LWW resolves stragglers, and the CDF then
    # carries per-commit post-images the replica must rank identically
    pipe.apply_batch(ch.where(F.col("lsn") % 2 == 0), batch_id=0)
    pipe.apply_batch(ch.where(F.col("lsn") % 2 == 1), batch_id=1)
    create_replica(spark, src, dst)
    q = replicate_stream(spark, src, dst, ck)
    q.awaitTermination(600)
    return (
        LakeTable.load(spark, dst).read().select("url", "warc_ts", "text", "lang")
    )


def q_matview_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived-table surface: an incrementally-maintained grouped
    aggregate view (count + subtractable integer sum per language) over
    the lake table's change feed. The source is replayed in TWO commits
    with a ``refresh()`` after EACH — so the second refresh maintains the
    stored state from only the second commit's CDF rows (+1 post-images,
    −1 pre-images, cross-group moves, group drops at zero) rather than
    rescanning the table. The oracle recomputes the same aggregate from
    the LWW final state from scratch: incremental maintenance is correct
    iff the two agree exactly (integer sums — no float drift). Reference
    analogue: the hourly→daily recompute jobs
    (/root/reference/fintick/aggregators/base.py:136-149), advanced here
    as O(changed rows) refreshes with exactly-once cursoring."""
    from .lake.matview import MaterializedAggregate

    tmp = os.path.join(tempfile.gettempdir(), f"cdc_mv_{uuid.uuid4().hex[:8]}")
    pipe = CdcPipeline(spark, tmp + "_src", n_buckets=8)
    ch = _changes_from_events(spark, sf_dir)
    view = MaterializedAggregate(
        spark,
        tmp + "_src",
        tmp + "_view",
        group_col="lang",
        sums={"sum_len": "length(text)"},
    )
    pipe.apply_batch(ch.where(F.col("lsn") % 2 == 0), batch_id=0)
    view.refresh()
    pipe.apply_batch(ch.where(F.col("lsn") % 2 == 1), batch_id=1)
    view.refresh()
    return view.read().select(
        "lang",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_len").cast("long").alias("sum_len"),
    )


SQL_MATVIEW = f"""
with ch as (
  select event_id as lsn, {_OP_EXPR} as op,
         concat('user:', cast(user_id as varchar)) as url,
         ts as warc_ts, props, event_type as lang
  from events),
w as (
  select *, row_number() over (partition by url order by warc_ts desc, lsn desc) as rn
  from ch),
final as (
  select lang,
         trim(regexp_replace(regexp_replace(concat('<p>', props, '</p>'),
              '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) as text
  from w where rn = 1 and op <> 'D')
select lang, cast(count(*) as bigint) as n_rows,
       cast(sum(length(text)) as bigint) as sum_len
from final group by lang
"""


#: TTL cutoff for q_ttl_retention — mid-range of the events table's fixed
#: Jan-2024 span at every SF.
_TTL_CUTOFF = "2024-01-16 00:00:00"


def q_ttl_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based retention as a driver-checked query (reference: 6-day
    hourly-partition TTL, fintick/bqloader/bqloader.py:9-13): full
    replay, then ``expire_rows`` at a mid-range cutoff, then the logical
    read. The oracle reproduces the settled-only rule exactly — a row
    expires iff it is older than the cutoff AND its lsn is at/below the
    applied-LSN watermark (min over binlog partitions of max lsn)."""
    import datetime as _dtm

    tmp = os.path.join(tempfile.gettempdir(), f"cdc_t_{uuid.uuid4().hex[:8]}")
    pipe = CdcPipeline(spark, tmp, n_buckets=8)
    pipe.apply_batch(_changes_from_events(spark, sf_dir), batch_id=0)
    pipe.table.expire_rows(
        _dtm.datetime.fromisoformat(_TTL_CUTOFF).replace(tzinfo=_dtm.timezone.utc)
    )
    return pipe.table.read().select("url", "warc_ts", "text", "lang")


SQL_TTL_RETENTION = f"""
with ch as (
  select event_id as lsn, cast(user_id % 8 as int) as part, {_OP_EXPR} as op,
         concat('user:', cast(user_id as varchar)) as url,
         ts as warc_ts, props, event_type as lang
  from events),
wm as (
  select min(mx) as wm from (select max(lsn) as mx from ch group by part)),
w as (
  select *, row_number() over (partition by url order by warc_ts desc, lsn desc) as rn
  from ch)
select url, warc_ts,
       trim(regexp_replace(regexp_replace(concat('<p>', props, '</p>'),
            '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) as text,
       lang
from w, wm
where rn = 1 and op <> 'D'
  and not (warc_ts < timestamp '{_TTL_CUTOFF}' and lsn <= wm.wm)
"""


def q_cdc_replay_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship replay through the merge-on-read write path: winners
    land as per-bucket delta files, a minor compaction folds them, and
    the folded logical read must equal the same 10-line SQL oracle as the
    CoW path — write-mode invisibility as a driver-checked property."""
    tmp = os.path.join(tempfile.gettempdir(), f"cdc_m_{uuid.uuid4().hex[:8]}")
    pipe = CdcPipeline(spark, tmp, n_buckets=8, write_mode="mor", max_deltas=2)
    changes = _changes_from_events(spark, sf_dir)
    # two micro-batches so deltas + fold-at-read are genuinely exercised
    pipe.apply_batch(changes.where(F.col("lsn") % 2 == 0), batch_id=0)
    pipe.apply_batch(changes.where(F.col("lsn") % 2 == 1), batch_id=1)
    return pipe.table.read().select("url", "warc_ts", "text", "lang")


#: batch split for the two-commit lake-surface queries — mid-range of the
#: events table's fixed Jan-2024 span at every SF, so both batches are
#: non-empty and the batch-0 / batch-1 winner structure is rich.
_SPLIT_TS = _TTL_CUTOFF


def _text_sql(props: str) -> str:
    """DuckDB mirror of the engine's vectorized html→text extraction
    (functions/extract.py) over ``concat('<p>', props, '</p>')``."""
    return (
        f"trim(regexp_replace(regexp_replace(concat('<p>', {props}, '</p>'), "
        "'<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


def _two_batch_table(
    spark: SparkSession, sf_dir: str, prefix: str, second_batch: bool = True
) -> tuple["CdcPipeline", DataFrame, F.Column, int]:
    """Replay the events feed in TWO commits split at ``_SPLIT_TS`` — the
    stream shape the lake's change-data-capture consumers (CDF, SCD2)
    derive their per-commit semantics from. Returns ``(pipe, changes,
    cut, v1)`` with ``v1`` the snapshot version after commit 1;
    ``second_batch=False`` stops there (for queries that apply the
    second half through a different surface, e.g. MERGE INTO)."""
    tmp = os.path.join(tempfile.gettempdir(), f"{prefix}_{uuid.uuid4().hex[:8]}")
    pipe = CdcPipeline(spark, tmp, n_buckets=8)
    ch = _changes_from_events(spark, sf_dir)
    cut = F.lit(_SPLIT_TS).cast("timestamp")
    pipe.apply_batch(ch.where(F.col("warc_ts") < cut), batch_id=0)
    v1 = pipe.table.current_version()
    if second_batch:
        pipe.apply_batch(ch.where(F.col("warc_ts") >= cut), batch_id=1)
    return pipe, ch, cut, v1


#: shared oracle CTE: per-url LWW winners of batch 0 (`w0`) and of the
#: whole feed (`w1`), full-outer-composed per url. Because batch 0 is a
#: subset, `w1 ∈ batch0 ⇒ w1 = w0`, so `lsn1 <> lsn0` ⇔ "the key's state
#: changed at commit 2" — the exact per-commit transition the CDF and the
#: SCD2 history capture.
_W01_SQL = f"""
ch as (
  select event_id as lsn, {_OP_EXPR} as op,
         concat('user:', cast(user_id as varchar)) as url,
         ts as warc_ts, props, event_type as lang
  from events),
w0 as (
  select * from (
    select *, row_number() over (partition by url order by warc_ts desc, lsn desc) as rn
    from ch where warc_ts < timestamp '{_SPLIT_TS}') where rn = 1),
w1 as (
  select * from (
    select *, row_number() over (partition by url order by warc_ts desc, lsn desc) as rn
    from ch) where rn = 1),
j as (
  select w1.url, w1.op as op1, w1.warc_ts as ts1, w1.lsn as lsn1,
         w1.props as props1, w1.lang as lang1,
         w0.op as op0, w0.warc_ts as ts0, w0.lsn as lsn0,
         w0.props as props0, w0.lang as lang0
  from w1 left join w0 on w1.url = w0.url)
"""


def q_scd2_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 type-2 history maintained from the lake CDF (lake/scd2.py):
    validity intervals per url version over the two-commit replay —
    opens from insert/postimage images, closes at the superseding
    version's ``warc_ts`` (or the tombstone's), ``valid_to IS NULL``
    marking the current version. Reference analogue: the ledger/consumer
    semantics of fintick/fscache/fscache.py:27-57 (the reference keeps
    only last state; SCD2 is the history face its lake users expect)."""
    from .lake.scd2 import Scd2History

    pipe, _, _, _ = _two_batch_table(spark, sf_dir, "scd2_q")
    h = Scd2History(
        spark, pipe.table_path, pipe.table_path + "_hist", payload_cols=["lang"]
    )
    h.refresh()
    return h.history().select(
        "url", "valid_from", "valid_to", "is_current", "src_lsn", "lang"
    )


SQL_SCD2 = f"""
with {_W01_SQL}
select url, ts0 as valid_from, ts1 as valid_to, false as is_current,
       lsn0 as src_lsn, lang0 as lang
from j where op0 is not null and op0 <> 'D' and lsn1 <> lsn0
union all
select url, ts1 as valid_from, cast(null as timestamp) as valid_to,
       true as is_current, lsn1 as src_lsn, lang1 as lang
from j where op1 <> 'D'
"""


def q_cdf_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change feed between two snapshots (changes_between —
    the Delta/Iceberg CDF analogue): the second commit's transitions as
    insert / update_preimage / update_postimage / delete rows, classified
    by LWW rank against the prior snapshot, reading only changed buckets.
    Reference analogue: re-query consumers fintick/aggregators/base.py:
    136-149 (which rescan; the CDF hands them the rows instead)."""
    pipe, _, _, v1 = _two_batch_table(spark, sf_dir, "cdf_q")
    return pipe.table.changes_between(v1).select(
        "url",
        "warc_ts",
        "text",
        "lang",
        F.col("_change_type").alias("change_type"),
    )


SQL_CDF = f"""
with {_W01_SQL}
select url, ts1 as warc_ts, {_text_sql('props1')} as text, lang1 as lang,
       'insert' as change_type
from j where op1 <> 'D' and (lsn0 is null or op0 = 'D') and (lsn0 is null or lsn1 <> lsn0)
union all
select url, ts1, {_text_sql('props1')}, lang1, 'update_postimage'
from j where op1 <> 'D' and op0 is not null and op0 <> 'D' and lsn1 <> lsn0
union all
select url, ts0, {_text_sql('props0')}, lang0, 'update_preimage'
from j where op1 <> 'D' and op0 is not null and op0 <> 'D' and lsn1 <> lsn0
union all
select url, ts0, {_text_sql('props0')}, lang0, 'delete'
from j where op1 = 'D' and op0 is not null and op0 <> 'D'
"""


def q_merge_into_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic declarative MERGE INTO (lake/table.py merge_into): the
    second half of the feed, compacted to unique keys, merged into the
    first half's table with all three clause kinds — matched rows whose
    url ends in '0' are deleted, other matched rows take the source's
    ``lang`` (keeping target ``text`` and ``warc_ts`` — matched events
    reuse the target's LWW order), absent keys insert. Reference
    analogue: none (the reference's only upsert is its replay loop);
    this is the declarative face the north rule's lake users expect."""
    pipe, ch, cut, _ = _two_batch_table(spark, sf_dir, "mrg_q", second_batch=False)
    src = lww_compact(
        ch.where(F.col("warc_ts") >= cut).select("url", "warc_ts", "lsn", "lang"),
        key="url",
        order_cols=("warc_ts", "lsn"),
    ).select("url", "warc_ts", "lang")
    pipe.table.merge_into(
        src,
        when_matched_update=True,
        when_matched_delete="right(url, 1) = '0'",
        when_not_matched_insert=True,
    )
    return pipe.table.read().select("url", "warc_ts", "text", "lang")


SQL_MERGE_UPSERT = f"""
with {_W01_SQL},
t0 as (
  select url, ts0 as warc_ts, {_text_sql('props0')} as text, lang0 as lang
  from j where op0 is not null and op0 <> 'D'),
s as (
  select url, ts1 as warc_ts, lang1 as lang
  from j where lsn0 is null or lsn1 <> lsn0)
select t.url, t.warc_ts, t.text, s.lang
from t0 t join s on t.url = s.url
where right(t.url, 1) <> '0'
union all
select s.url, s.warc_ts, cast(null as varchar) as text, s.lang
from s left join t0 t on s.url = t.url where t.url is null
union all
select t.url, t.warc_ts, t.text, t.lang
from t0 t left join s on t.url = s.url where s.url is null
"""


def q_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: hierarchical ROLLUP aggregation (free in Catalyst; absent in
    the reference — SURVEY.md §2.4)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.rollup("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("sum_value"),
        )
    )


SQL_ROLLUP = """
select event_type, cast(ts as date) as day, cast(count(*) as bigint) as n_events,
       cast(sum(cast(value as decimal(38,6))) as double) as sum_value
from events group by rollup(event_type, cast(ts as date))
"""


def q_scalar_market_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F8+F11: the reference's scalar transform set, JVM-side
    (functions/market.py), derived deterministically from events."""
    from .functions.market import (
        calculate_notional,
        calculate_tick_rule,
        era_boundaries,
        normalize_symbol,
        partition_decorator,
        renko_level,
        strip_nanoseconds,
    )

    e = _t(spark, sf_dir, "events")
    direction = (
        F.when(F.col("event_id") % 3 == 0, "PlusTick")
        .when(F.col("event_id") % 3 == 1, "ZeroPlusTick")
        .otherwise("MinusTick")
    )
    # parquet ntz → ltz for unix_micros; result back to ntz (oracle parity)
    ts_ms, nanos = strip_nanoseconds(F.col("ts").cast("timestamp"))
    return e.select(
        "event_id",
        calculate_tick_rule(direction).alias("tick_rule"),
        # raw double quotient (the operator's decimal(38,18) storage cast
        # is engine-internal; its 18th-digit rounding differs across
        # engines, so the oracle pins the arithmetic, not the storage type)
        (F.col("value") / (F.col("value") + 1.0)).alias("notional"),
        ts_ms.cast("timestamp_ntz").alias("ts_ms"),
        nanos.alias("nanoseconds"),
        partition_decorator("ts", hourly=True).alias("partition_hour"),
        normalize_symbol(F.concat(F.col("event_type"), F.lit("-usd_x"))).alias("norm_symbol"),
        renko_level(F.col("value"), 25.0).cast("double").alias("renko_level"),
        *era_boundaries("ts"),
    )


SQL_SCALAR_FNS = """
select event_id,
  cast(case when event_id % 3 in (0, 1) then 1 else -1 end as int) as tick_rule,
  value / (value + 1.0) as notional,
  make_timestamp(epoch_us(ts) - (epoch_us(ts) % 1000)) as ts_ms,
  (epoch_us(ts) % 1000) * 1000 as nanoseconds,
  strftime(ts, '%Y%m%d%H') as partition_hour,
  upper(concat(event_type, 'usdx')) as norm_symbol,
  cast(cast(floor(value / 25.0) * 25.0 as decimal(38,18)) as double) as renko_level,
  cast(ts as date) as era_day,
  cast(weekofyear(ts) as int) as era_week,
  cast(month(ts) as int) as era_month,
  cast(quarter(ts) as int) as era_quarter,
  cast(year(ts) as int) as era_year
from events
"""


# ---------------------------------------------------------------------------
# Futures / multi-symbol contract model (reference MULTIPLE_SYMBOL family)
# ---------------------------------------------------------------------------

#: Deterministic contract fan-out: each tick maps to one of three
#: quarterly contracts of its root symbol; expiries straddle FUT_AS_OF so
#: the active filter genuinely drops the front contract.
FUT_SUFFIXES = ("H24", "M24", "U24")
FUT_EXPIRIES = ("2024-01-10 00:00:00", "2024-02-01 00:00:00", "2024-06-01 00:00:00")
FUT_LISTING = "2023-12-01 00:00:00"
FUT_AS_OF = "2024-01-15 00:00:00"


def _fut_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in FUT_SUFFIXES]),
        (F.col("index") % 3 + 1).cast("int"),
    )
    return t.withColumn("symbol", F.concat_ws("-", F.col("symbol"), suffix))


def _fut_instruments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruments dimension: (symbol, root_symbol, listing, expiry) —
    one contract per (root symbol × suffix)."""
    base = (
        _t(spark, sf_dir, "events")
        .select(F.col("event_type").alias("root_symbol"))
        .distinct()
    )
    contracts = F.array(
        *[
            F.struct(F.lit(s).alias("sfx"), F.lit(e).alias("exp"))
            for s, e in zip(FUT_SUFFIXES, FUT_EXPIRIES)
        ]
    )
    return base.select(
        "root_symbol", F.explode(contracts).alias("c")
    ).select(
        F.concat_ws("-", F.col("root_symbol"), F.col("c.sfx")).alias("symbol"),
        "root_symbol",
        F.lit(FUT_LISTING).cast("timestamp").alias("listing"),
        F.col("c.exp").cast("timestamp").alias("expiry"),
    )


def q_futures_active_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 + J2 at contract granularity: multi-symbol ticks filtered to
    contracts active at FUT_AS_OF (expiry ≥ as_of — the reference's
    get_active_futures rule) then broadcast-enriched with each
    contract's expiry (MULTIPLE_SYMBOL output shape)."""
    from .operators.futures import enrich_expiry, filter_to_active

    t = _fut_ticks(spark, sf_dir)
    ins = _fut_instruments(spark, sf_dir)
    act = filter_to_active(t, ins, FUT_AS_OF)
    return enrich_expiry(act, ins).select(
        F.col("index").alias("idx"),
        "symbol",
        "timestamp",
        F.col("price").cast("double").alias("price"),
        "expiry",
    )


def _futures_sql() -> str:
    sfx = (
        "case cast(idx % 3 as int) when 0 then 'H24' "
        "when 1 then 'M24' else 'U24' end"
    )
    exp = (
        f"case cast(idx % 3 as int) when 0 then timestamp '{FUT_EXPIRIES[0]}' "
        f"when 1 then timestamp '{FUT_EXPIRIES[1]}' "
        f"else timestamp '{FUT_EXPIRIES[2]}' end"
    )
    return f"""
with t as ({_ticks_sql(None)}),
ft as (
  select idx, symbol || '-' || {sfx} as symbol, timestamp,
         cast(price as double) as price, {exp} as expiry
  from t)
select idx, symbol, timestamp, price, expiry from ft
where expiry >= timestamp '{FUT_AS_OF}'
"""


def q_futures_front_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous front-month series: each tick → the root's nearest
    unexpired contract (roll at expiry)."""
    from .operators.futures import front_contract

    t = _ticks(spark, sf_dir).select(
        F.col("index").alias("idx"),
        F.col("symbol").alias("root_symbol"),
        "timestamp",
        F.col("price").cast("double").alias("price"),
    )
    return front_contract(t, _fut_instruments(spark, sf_dir))


def _front_month_sql() -> str:
    vals = ", ".join(
        f"('{s}', timestamp '{e}')" for s, e in zip(FUT_SUFFIXES, FUT_EXPIRIES)
    )
    return f"""
with t as ({_ticks_sql(None)}),
c as (select * from (values {vals}) v(sfx, exp)),
j as (
  select t.idx, t.symbol as root_symbol, t.timestamp,
         cast(t.price as double) as price,
         t.symbol || '-' || c.sfx as front_symbol, c.exp as front_expiry,
         row_number() over (partition by t.idx
                            order by c.exp, t.symbol || '-' || c.sfx) as rn
  from t join c
    on c.exp >= t.timestamp and timestamp '{FUT_LISTING}' <= t.timestamp)
select idx, root_symbol, timestamp, price, front_symbol, front_expiry
from j where rn = 1
"""


# ---------------------------------------------------------------------------
# Relational operator queries (TPC-H-ish tables)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6-style conditional/compound aggregation (TPC-H Q1 shape), exact
    decimal arithmetic sized to stay inside Spark's 38-digit cap."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(18,6)")
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc1 = (F.lit(1.0) - F.col("l_discount")).cast("decimal(9,6)")
    tax1 = (F.lit(1.0) + F.col("l_tax")).cast("decimal(9,6)")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * disc1).cast("double").alias("sum_disc_price"),
        F.sum(price * (disc1 * tax1)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g


#: DuckDB's direct decimal→double cast divides the raw unscaled int by
#: 10^scale, which mis-rounds once the unscaled value exceeds 2^53; the
#: varchar round-trip is correctly rounded (as Spark's BigDecimal path is).
SQL_PRICING = """
select l_returnflag, l_linestatus,
  cast(cast(sum(cast(l_quantity as decimal(18,6))) as varchar) as double) as sum_qty,
  cast(cast(sum(cast(l_extendedprice as decimal(18,6))) as varchar) as double) as sum_base_price,
  cast(cast(sum(cast(l_extendedprice as decimal(18,6)) * cast(1.0 - l_discount as decimal(9,6))) as varchar) as double) as sum_disc_price,
  cast(cast(sum(cast(l_extendedprice as decimal(18,6)) * (cast(1.0 - l_discount as decimal(9,6)) * cast(1.0 + l_tax as decimal(9,6)))) as varchar) as double) as sum_charge,
  cast(cast(sum(cast(l_quantity as decimal(18,6))) as varchar) as double) / count(*) as avg_qty,
  cast(cast(sum(cast(l_extendedprice as decimal(18,6))) as varchar) as double) / count(*) as avg_price,
  cast(count(*) as bigint) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
"""


def q_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: broadcast dimension-enrichment join chain + rollup."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double").alias("total_acctbal"),
        )
    )


SQL_ENRICH = """
select r_name, n_name, cast(count(*) as bigint) as n_customers,
       cast(sum(cast(c_acctbal as decimal(18,6))) as double) as total_acctbal
from customer
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by r_name, n_name
"""


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti in ONE plan (T7 intersect/except semantics):
    the semi side counts parts with lineitem activity per brand, the anti
    side lists customers with no orders — both physical operators
    (LeftSemi / LeftAnti BroadcastHashJoin) exercised under a single
    driver row (consolidated from the round-2 ``semi_join``/``anti_join``
    pair to stay inside the driver's 50-entry correctness budget)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    semi = (
        p.join(li, p["p_partkey"] == li["l_partkey"], "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("semi").alias("side"), F.col("p_brand").alias("k"), "n")
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    anti = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        F.lit("anti").alias("side"),
        F.col("c_name").alias("k"),
        F.col("c_custkey").cast("long").alias("n"),
    )
    return semi.unionByName(anti)


SQL_SEMI_ANTI = """
select 'semi' as side, p_brand as k, cast(count(*) as bigint) as n from part
where exists (select 1 from lineitem where l_partkey = p_partkey)
group by p_brand
union all
select 'anti' as side, c_name as k, cast(c_custkey as bigint) as n from customer
where not exists (select 1 from orders where o_custkey = c_custkey)
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2: ordered running aggregate per key (exact decimal running sum)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


SQL_RUNNING = """
select o_orderkey, o_custkey, o_orderdate,
       cast(sum(cast(o_totalprice as decimal(18,6)))
            over (partition by o_custkey order by o_orderdate, o_orderkey
                  rows unbounded preceding) as double) as running_spend
from orders
"""


# ---------------------------------------------------------------------------
# Temporal operators over `events` (as-of join, sessionization)
# ---------------------------------------------------------------------------

SESSION_GAP_SECS = 1800


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's latest purchase at-or-before it
    (union-tag window as-of — no pandas, one shuffle)."""
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("value").alias("p_value"),
        F.col("event_id").alias("p_event_id"),
    )
    out = asof_join(
        clicks, purch, key="user_id", ts="ts",
        payload_cols=["p_value", "p_event_id"], tiebreak="p_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("last_purchase_ts"),
        F.col("asof_p_value").alias("last_purchase_value"),
        F.col("asof_p_event_id").alias("last_purchase_event"),
    )


SQL_ASOF = """
with c as (select event_id, user_id, ts from events where event_type = 'click'),
p as (select user_id, ts,
        arg_max(value, event_id) as p_value,
        cast(max(event_id) as bigint) as p_event_id
      from events where event_type = 'purchase' group by user_id, ts)
select c.event_id, c.user_id, c.ts,
       p.ts as last_purchase_ts,
       p.p_value as last_purchase_value,
       p.p_event_id as last_purchase_event
from c asof left join p on c.user_id = p.user_id and c.ts >= p.ts
"""


PROXIMITY_GAP_SECS = 6 * 3600


def q_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval self-join: event pairs within 6 h per user, via the
    bucketized equi-join (candidates = same/adjacent gap-width bucket)."""
    from .operators.temporal import proximity_pairs

    return proximity_pairs(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        id_col="event_id", max_gap_secs=PROXIMITY_GAP_SECS,
    )


SQL_PROXIMITY = f"""
select cast(least(a.event_id, b.event_id) as bigint) as id_a,
       cast(greatest(a.event_id, b.event_id) as bigint) as id_b,
       cast(abs(epoch_us(a.ts) - epoch_us(b.ts)) as bigint) as gap_us
from events a join events b
  on a.user_id = b.user_id and a.event_id < b.event_id
  and abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {PROXIMITY_GAP_SECS * 1_000_000}
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import sessionize

    return sessionize(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        order_tiebreak="event_id", gap_secs=SESSION_GAP_SECS,
    )


SQL_SESSIONIZE = f"""
with o as (
  select user_id, ts, event_id,
         epoch_us(ts) as us,
         lag(epoch_us(ts)) over (partition by user_id order by ts, event_id) as prev_us
  from events),
f as (
  select *, case when prev_us is null or us - prev_us > {SESSION_GAP_SECS * 1_000_000}
                 then 1 else 0 end as new_s
  from o),
s as (
  select *, cast(sum(new_s) over (partition by user_id order by ts, event_id
                                  rows unbounded preceding) as bigint) as session_id
  from f)
select user_id, session_id,
       cast(count(*) as bigint) as n_events,
       min(ts) as session_start,
       max(ts) as session_end
from s group by user_id, session_id
"""


# ---------------------------------------------------------------------------
# Text-analysis queries over `documents`
# ---------------------------------------------------------------------------


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    m = d.select("doc_id", *quality_metrics("text"))
    return m.withColumn(
        "quality",
        quality_score(F.col("n_tokens"), F.col("stopword_ratio"), F.col("punct_ratio")),
    )


_SW = ", ".join(f"'{w}'" for w in STOPWORDS)

SQL_TEXT_QUALITY = f"""
with t as (select doc_id, text, {TOKS_SQL} as toks from documents),
m as (
  select doc_id,
    cast(len(toks) as bigint) as n_tokens,
    cast(list_aggregate(list_transform(toks, tk -> cast(length(tk) as bigint)), 'sum') as bigint) as sum_len,
    cast(len(list_filter(toks, tk -> tk in ({_SW}))) as bigint) as n_stop,
    cast(length(text) as bigint) as n_char,
    cast(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) as bigint) as n_alnum_sp,
    cast(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) as bigint) as n_upper
  from t),
q as (
  select doc_id, n_tokens,
    sum_len / n_tokens as mean_token_len,
    n_stop / n_tokens as stopword_ratio,
    (n_char - n_alnum_sp) / n_char as punct_ratio,
    n_upper / n_char as upper_ratio
  from m)
select *, (case when n_tokens >= 20 then cast(1.0 as double)
                else n_tokens / cast(20.0 as double) end) * 0.4
          + least(stopword_ratio * 4, cast(1.0 as double)) * 0.4
          + greatest(cast(1.0 as double) - punct_ratio * 4, cast(0.0 as double)) * 0.2
       as quality
from q
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id("text").alias("pred_lang"))


def _lang_exprs() -> tuple[str, str]:
    """(hit-count column list, first-match CASE expr) mirroring
    functions.text.lang_id — shared by the lang_id and corpus_curation
    oracles."""
    langs = list(LANG_MARKERS)
    hits = {
        lang: f"len(list_filter(toks, tk -> tk in ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in LANG_MARKERS.items()
    }
    expr = f"'{langs[-1]}'"
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        conds = " and ".join(f"h_{lang} >= h_{o}" for o in langs[i + 1 :])
        expr = f"case when {conds} then '{lang}' else {expr} end"
    hit_cols = ", ".join(f"{e} as h_{lang}" for lang, e in hits.items())
    return hit_cols, expr


def _lang_sql() -> str:
    hit_cols, expr = _lang_exprs()
    return f"""
with t as (select doc_id, lang, {TOKS_SQL} as toks from documents),
h as (select doc_id, lang, {hit_cols} from t)
select doc_id, lang, {expr} as pred_lang from h
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").cast("long").alias("n_ws_tokens"),
        regex_token_count("text").cast("long").alias("n_bpe_tokens"),
    )


SQL_TOKEN_COUNT = f"""
select doc_id, cast(len({TOKS_SQL}) as bigint) as n_ws_tokens,
       cast(len(regexp_extract_all(text, '{TOKEN_RE}', 0)) as bigint) as n_bpe_tokens
from documents
"""


def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import repetition_metrics

    return repetition_metrics(_t(spark, sf_dir, "documents"), k=2)


def _repetition_sql(k: int = 2) -> str:
    """Mirror of functions.text.repetition_metrics (non-distinct k-grams,
    per-doc multiplicity aggregates)."""
    ngrams = (
        f"list_transform(range(1, greatest(len(toks) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' '))"
    )
    return f"""
with t as (select doc_id, {TOKS_SQL} as toks from documents),
g as (select doc_id, unnest({ngrams}) as g from t),
c as (select doc_id, g, cast(count(*) as bigint) as c from g group by doc_id, g),
a as (select doc_id,
        cast(sum(c) as bigint) as n_kgrams,
        cast(count(*) as bigint) as distinct_kgrams,
        cast(max(c) as bigint) as max_c
      from c group by doc_id)
select doc_id, n_kgrams, distinct_kgrams,
       1.0 - distinct_kgrams / cast(n_kgrams as double) as dup_kgram_frac,
       max_c / cast(n_kgrams as double) as top_kgram_frac
from a
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fingerprint ≡ 1-permutation MinHash (seed 0): explode-based path
    # with the SEEDED portable hash (matches functions.text.doc_fingerprint;
    # minhash_signature now uses the unseeded double-hash family, so it is
    # no longer interchangeable here).
    from .functions.text import word_shingles

    d = _t(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("_sh")
    )
    return ex.groupBy("doc_id").agg(
        F.min(portable_hash64(F.col("_sh"), 0)).alias("fingerprint")
    )


SQL_FINGERPRINT = f"""
with t as (select doc_id, {TOKS_SQL} as toks from documents),
s as (select doc_id, {_shingles_sql(3)} as grams from t)
select doc_id,
       list_min(list_transform(grams, g -> {portable_hash64_sql('g', 0)})) as fingerprint
from s
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


SQL_EXACT_DEDUP = """
select md5(text) as digest, min(doc_id) as canonical_id,
       cast(count(*) as bigint) as n_copies
from documents group by md5(text)
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar doc pairs by exact 3-gram Jaccard."""
    pairs = ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), shingle_k=3)
    return pairs.orderBy(F.col("jaccard").desc(), "id_a", "id_b").limit(20)


SQL_JACCARD = f"""
with t as (select doc_id, {TOKS_SQL} as toks from documents),
s as (select doc_id, {_shingles_sql(3)} as grams from t),
e as (select doc_id, unnest(grams) as sh from s),
sz as (select doc_id, cast(count(*) as bigint) as n from e group by doc_id),
i as (
  select a.doc_id as id_a, b.doc_id as id_b, cast(count(*) as bigint) as n_inter
  from e a join e b on a.sh = b.sh and a.doc_id < b.doc_id
  group by a.doc_id, b.doc_id)
select id_a, id_b, n_inter / (sa.n + sb.n - n_inter) as jaccard
from i join sz sa on sa.doc_id = id_a join sz sb on sb.doc_id = id_b
order by jaccard desc, id_a, id_b limit 20
"""


MINHASH_K = 8
MINHASH_BANDS = 4


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=8) + LSH banding (b=4, r=2) candidate pairs."""
    sig = minhash_signature(
        _t(spark, sf_dir, "documents"), k=MINHASH_K, shingle_k=3
    )
    return lsh_candidate_pairs(sig, k=MINHASH_K, bands=MINHASH_BANDS)


def _minhash_sql() -> str:
    from .functions.hashing import portable_hash64_pair_sql

    h1, h2 = portable_hash64_pair_sql("g")
    m = 1 << 60
    mh = ", ".join(
        f"cast(min((h1 + {i} * h2) % {m}) as bigint) as mh_{i}"
        for i in range(MINHASH_K)
    )
    r = MINHASH_K // MINHASH_BANDS
    band_selects = []
    for b in range(MINHASH_BANDS):
        cat = " || '|' || ".join(
            f"cast(mh_{b * r + j} as varchar)" for j in range(r)
        )
        band_selects.append(
            f"select doc_id, {b} as band, {portable_hash64_sql(f'({cat})')} as bh from sig"
        )
    bands = " union all ".join(band_selects)
    return f"""
with t as (select doc_id, {TOKS_SQL} as toks from documents),
s as (select doc_id, unnest({_shingles_sql(3)}) as g from t),
hh as (select doc_id, {h1} as h1, {h2} as h2 from s),
sig as (select doc_id, {mh} from hh group by doc_id),
bands as ({bands})
select distinct a.doc_id as id_a, b.doc_id as id_b
from bands a join bands b on a.band = b.band and a.bh = b.bh and a.doc_id < b.doc_id
"""


SIMHASH_BITS = 16


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_t(spark, sf_dir, "documents"), bits=SIMHASH_BITS)


SIMHASH_MAX_HAMMING = 3


def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs via pigeonhole chunk buckets."""
    sig = simhash(_t(spark, sf_dir, "documents"), bits=SIMHASH_BITS)
    return simhash_near_pairs(
        sig, bits=SIMHASH_BITS, max_hamming=SIMHASH_MAX_HAMMING
    )


def _simhash_pairs_sql() -> str:
    n_chunks = SIMHASH_MAX_HAMMING + 1
    width = -(-SIMHASH_BITS // n_chunks)
    mask = (1 << width) - 1
    chunk_rows = " union all ".join(
        f"select doc_id, simhash, {i} as ci, "
        f"(simhash >> {i * width}) & {mask} as cv from sig"
        for i in range(n_chunks)
    )
    return f"""
with sig as ({_simhash_sql()}),
ch as ({chunk_rows})
select distinct a.doc_id as id_a, b.doc_id as id_b,
       cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
from ch a join ch b
  on a.ci = b.ci and a.cv = b.cv and a.doc_id < b.doc_id
where bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


def _simhash_sql() -> str:
    terms = " + ".join(
        f"(case when 2 * len(list_filter(hs, v -> (v >> {i}) & 1 = 1)) > n "
        f"then cast({1 << i} as bigint) else cast(0 as bigint) end)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
with t as (select doc_id, list_distinct({TOKS_SQL}) as toks from documents),
h as (select doc_id, list_transform(toks, tk -> {portable_hash64_sql('tk', 99)}) as hs,
             len(toks) as n
      from t)
select doc_id, cast({terms} as bigint) as simhash from h where n > 0
"""


# ---------------------------------------------------------------------------
# Similarity search over `embeddings`
# ---------------------------------------------------------------------------

EMB_DIM = 64
TOPK = 5
N_QUERIES = 20  # vec_id < 20 are the query set


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb, emb.where(F.col("vec_id") < N_QUERIES), k=TOPK
    )


def _cosine_sql(with_knn: bool = False) -> str:
    dot = _dot_sql("qe", "ce")
    qn = _dot_sql("qe", "qe")
    cn = _dot_sql("ce", "ce")
    base = f"""
with q as (select vec_id as qid, embedding as qe from embeddings where vec_id < {N_QUERIES}),
c as (select vec_id as nid, embedding as ce from embeddings),
p as (
  select qid, nid,
         cast({dot} as double) as dot,
         cast({qn} as double) as qn2, cast({cn} as double) as cn2
  from c join q on qid <> nid),
s as (select qid, nid, dot / sqrt(qn2 * cn2) as sim from p),
r as (select qid, nid, sim,
             cast(row_number() over (partition by qid order by sim desc, nid) as int) as rank
      from s)"""
    if not with_knn:
        return base + f"\nselect qid, rank, nid, sim from r where rank <= {TOPK}\n"
    return base + f""",
v as (select qid, label as nlabel, cast(count(*) as bigint) as nv
      from r join embeddings on vec_id = nid where rank <= {TOPK}
      group by qid, label),
rk as (select qid, nlabel,
              row_number() over (partition by qid order by nv desc, nlabel) as rr
       from v)
select qid, cast(nlabel as int) as pred_label from rk where rr = 1
"""


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    topk = cosine_topk(emb, emb.where(F.col("vec_id") < N_QUERIES), k=TOPK)
    return knn_label_vote(topk, emb).select(
        "qid", F.col("pred_label").cast("int").alias("pred_label")
    )


ANN_PLANES = 8
NEAR_DUP_BANDS = 2  # 2 bands × 4 planes: banded SRP-LSH (recall/bucket knob)
NEAR_DUP_T = 0.2  # synthetic embeddings are near-orthogonal; low τ ⇒ non-empty result


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ann_lsh_buckets(emb, dim=EMB_DIM, n_planes=ANN_PLANES)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, dim=EMB_DIM, threshold=NEAR_DUP_T, n_planes=ANN_PLANES,
        bands=NEAR_DUP_BANDS,
    )


def _near_dup_sql() -> str:
    """Banded SRP-LSH mirror: per band, bucket = Σ 2^p·[dot>0] over that
    band's plane slice; candidate pairs = UNION (distinct) over bands of
    same-bucket joins; exact cosine verifies."""
    planes = hyperplanes(EMB_DIM, ANN_PLANES)
    r = ANN_PLANES // NEAR_DUP_BANDS
    bucket_cols = []
    for band in range(NEAR_DUP_BANDS):
        terms = []
        for p in range(r):
            plane = planes[band * r + p]
            lit = "[" + ", ".join(str(x) for x in plane) + "]"
            terms.append(
                f"(case when {_dot_sql('embedding', lit)} > 0 "
                f"then cast({1 << p} as bigint) else cast(0 as bigint) end)"
            )
        bucket_cols.append("(" + " + ".join(terms) + f") as b{band}")
    pair_selects = " union ".join(
        f"select a.vec_id as id_a, b.vec_id as id_b "
        f"from t a join t b on a.b{band} = b.b{band} and a.vec_id < b.vec_id"
        for band in range(NEAR_DUP_BANDS)
    )
    dot = _dot_sql("va.v", "vb.v")
    na = _dot_sql("va.v", "va.v")
    nb = _dot_sql("vb.v", "vb.v")
    return f"""
with t as (select vec_id, embedding as v, {", ".join(bucket_cols)} from embeddings),
p as ({pair_selects}),
s as (
  select id_a, id_b,
         cast({dot} as double) / sqrt(cast({na} as double) * cast({nb} as double)) as sim
  from p join t va on va.vec_id = id_a join t vb on vb.vec_id = id_b)
select id_a, id_b, sim from s where sim >= {NEAR_DUP_T}
"""


def _ann_sql() -> str:
    planes = hyperplanes(EMB_DIM, ANN_PLANES)
    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(str(x) for x in plane) + "]"
        dot = _dot_sql("embedding", lit)
        terms.append(
            f"(case when {dot} > 0 then cast({1 << p} as bigint) else cast(0 as bigint) end)"
        )
    total = " + ".join(terms)
    return f"select vec_id, cast({total} as bigint) as bucket from embeddings\n"


IVF_CELLS = 16
IVF_PROBE = 4


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < N_QUERIES),
        n_cells=IVF_CELLS, n_probe=IVF_PROBE, k=TOPK,
    )


def _ivf_sql() -> str:
    """IVF-flat mirror: hash-sampled codebook (rank by portable hash),
    nearest-centroid assignment, n_probe nearest cells per query, exact
    cosine within probed cells."""
    from .functions.hashing import portable_hash64_sql

    def cos(a: str, b: str) -> str:
        return (
            f"cast({_dot_sql(a, b)} as double) / "
            f"sqrt(cast({_dot_sql(a, a)} as double) * cast({_dot_sql(b, b)} as double))"
        )

    h = portable_hash64_sql("cast(vec_id as varchar)")
    return f"""
with hh as (select vec_id, embedding, {h} as h from embeddings),
cells as (
  select cast(rn - 1 as int) as cell, ce from (
    select embedding as ce, row_number() over (order by h, vec_id) as rn from hh) x
  where rn <= {IVF_CELLS}),
asg as (
  select nid, cv, cell from (
    select e.vec_id as nid, e.embedding as cv, c.cell,
           row_number() over (partition by e.vec_id
             order by {cos('e.embedding', 'c.ce')} desc, c.cell) as ar
    from embeddings e cross join cells c) x
  where ar = 1),
q as (select vec_id as qid, embedding as qv from embeddings where vec_id < {N_QUERIES}),
probe as (
  select qid, qv, cell from (
    select q.qid, q.qv, c.cell,
           row_number() over (partition by q.qid
             order by {cos('q.qv', 'c.ce')} desc, c.cell) as pr
    from q cross join cells c) x
  where pr <= {IVF_PROBE}),
s as (select probe.qid, asg.nid, {cos('probe.qv', 'asg.cv')} as sim
      from probe join asg using (cell) where qid <> nid),
r as (select qid, nid, sim,
             cast(row_number() over (partition by qid order by sim desc, nid) as int) as rank
      from s)
select qid, rank, nid, sim from r where rank <= {TOPK}
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import dedup_components
    from .operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(
        emb, dim=EMB_DIM, threshold=NEAR_DUP_T, n_planes=ANN_PLANES,
        bands=NEAR_DUP_BANDS,
    ).select("id_a", "id_b")
    return dedup_components(pairs)


def _components_sql() -> str:
    """Connected components of the near-dup pair graph via DuckDB's
    recursive CTE (transitive closure, then min reachable id per vertex)
    — an exact cross-engine oracle for the iterative Spark label
    propagation."""
    return f"""
with recursive
nd as (select id_a, id_b from ({_near_dup_sql()}) x),
e as (select id_a as a, id_b as b from nd union select id_b, id_a from nd),
reach(src, dst) as (
  select a, a from e
  union
  select reach.src, e.b from reach join e on e.a = reach.dst
)
select src as id, min(dst) as component from reach group by src
"""


# ---------------------------------------------------------------------------
# Deterministic sampling over `documents`
# ---------------------------------------------------------------------------

SAMPLE_FRAC = 0.2
SAMPLE_SEED = 7
STRATA_FRACS = {"en": 0.5, "de": 0.1}
STRATA_DEFAULT = 0.05
EVAL_FRAC = 0.1


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import hash_sample

    d = _t(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", SAMPLE_FRAC, seed=SAMPLE_SEED).select(
        "doc_id", "lang"
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import stratified_hash_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_hash_sample(
        d, "doc_id", "lang", STRATA_FRACS, default_fraction=STRATA_DEFAULT,
        seed=SAMPLE_SEED,
    ).select("doc_id", "lang")


def q_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import train_eval_split

    d = _t(spark, sf_dir, "documents")
    return train_eval_split(d, "doc_id", EVAL_FRAC, seed=SAMPLE_SEED).select(
        "doc_id", "split"
    )


def _sampling_sqls() -> dict[str, str]:
    from .operators.sampling import RESOLUTION, hash_sample_sql, hash_slot_sql

    plain = hash_sample_sql("doc_id", SAMPLE_FRAC, SAMPLE_SEED)
    cutoff = "case lang " + " ".join(
        f"when '{v}' then {int(f * RESOLUTION)}"
        for v, f in sorted(STRATA_FRACS.items())
    ) + f" else {int(STRATA_DEFAULT * RESOLUTION)} end"
    slot = hash_slot_sql("doc_id", SAMPLE_SEED)
    return {
        "hash_sample": f"select doc_id, lang from documents where {plain}",
        "stratified_sample": (
            f"select doc_id, lang from documents where {slot} < {cutoff}"
        ),
        "train_eval_split": (
            f"select doc_id, case when "
            f"{hash_sample_sql('doc_id', EVAL_FRAC, SAMPLE_SEED)} "
            f"then 'eval' else 'train' end as split from documents"
        ),
    }


# ---------------------------------------------------------------------------
# Distribution stats (exact percentiles) over `documents`
# ---------------------------------------------------------------------------


def q_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-length distribution: exact interpolated
    percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` — both
    implement the same a + (b−a)·f interpolation, verified bit-equal).
    The length-distribution view every corpus curation run starts from;
    at 100 TB swap ``percentile`` for ``percentile_approx`` (t-digest)
    and keep the identical plan shape."""
    d = _t(spark, sf_dir, "documents")
    t = d.select("lang", n_tokens("text").cast("long").alias("_nt"))
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("_nt").alias("min_tokens"),
        F.percentile("_nt", 0.5).alias("p50_tokens"),
        F.percentile("_nt", 0.9).alias("p90_tokens"),
        F.max("_nt").alias("max_tokens"),
    )


SQL_TOKEN_PERCENTILES = f"""
with t as (select lang, cast(len({TOKS_SQL}) as bigint) as nt from documents)
select lang,
       cast(count(*) as bigint) as n_docs,
       cast(min(nt) as bigint) as min_tokens,
       quantile_cont(nt, 0.5) as p50_tokens,
       quantile_cont(nt, 0.9) as p90_tokens,
       cast(max(nt) as bigint) as max_tokens
from t group by lang
"""


# ---------------------------------------------------------------------------
# Per-source corpus health over `documents`
# ---------------------------------------------------------------------------


def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health per ingestion source: volume, exact-dup share,
    language spread, token mass — the triage view that decides which
    source gets dedup/filter attention first. One groupBy; the distinct
    aggregates are partial-aggregated map-side."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            "lang",
            F.md5("text").alias("_digest"),
            n_tokens("text").cast("long").alias("_nt"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("_digest").cast("bigint").alias("n_distinct_texts"),
            (
                F.lit(1.0)
                - F.countDistinct("_digest") / F.count(F.lit(1))
            ).alias("dup_frac"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("_nt").cast("bigint").alias("total_ws_tokens"),
        )
    )


SQL_SOURCE_STATS = f"""
with t as (select source, lang, md5(text) as digest,
                  cast(len({TOKS_SQL}) as bigint) as nt
           from documents)
select source,
       cast(count(*) as bigint) as n_docs,
       cast(count(distinct digest) as bigint) as n_distinct_texts,
       1.0 - count(distinct digest) / cast(count(*) as double) as dup_frac,
       cast(count(distinct lang) as bigint) as n_langs,
       cast(sum(nt) as bigint) as total_ws_tokens
from t group by source
"""


# ---------------------------------------------------------------------------
# Eval-set decontamination over `documents`
# ---------------------------------------------------------------------------


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train docs sharing ≥1 3-gram with the (hash-split) eval set —
    the pre-training decontamination sweep, composed from the same
    leakage-proof split the train_eval_split query exposes."""
    from .operators.dedup import contamination_overlap
    from .operators.sampling import train_eval_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    split = train_eval_split(d, "doc_id", EVAL_FRAC, seed=SAMPLE_SEED)
    train = split.where(F.col("split") == "train")
    ev = split.where(F.col("split") == "eval")
    return contamination_overlap(train, ev, shingle_k=3)


def _decontamination_sql() -> str:
    from .operators.sampling import hash_sample_sql

    is_eval = hash_sample_sql("doc_id", EVAL_FRAC, SAMPLE_SEED)
    return f"""
with s as (select doc_id, text, ({is_eval}) as is_eval from documents),
tt as (select doc_id, {TOKS_SQL} as toks from s where not is_eval),
et as (select doc_id, {TOKS_SQL} as toks from s where is_eval),
tg as (select doc_id, unnest({_shingles_sql(3)}) as g from tt),
eg (g) as (select distinct unnest({_shingles_sql(3)}) from et)
select tg.doc_id, cast(count(*) as bigint) as n_shared_grams
from tg where g in (select g from eg)
group by tg.doc_id
"""


# ---------------------------------------------------------------------------
# Sequence packing over `documents`
# ---------------------------------------------------------------------------

PACK_BUDGET = 2048


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.packing import pack_documents

    # n_shards=8 exercises the two-phase sharded prefix sum against the
    # single-window DuckDB oracle (layout is shard-invariant by design)
    return pack_documents(_t(spark, sf_dir, "documents"), budget=PACK_BUDGET, n_shards=8)


SQL_PACKING = f"""
with t as (
  select doc_id, lang,
         cast(len(regexp_extract_all(text, '{TOKEN_RE}', 0)) as bigint) as n_tokens
  from documents),
c as (
  select doc_id, lang, n_tokens,
         sum(n_tokens) over (partition by lang order by doc_id
                             rows unbounded preceding) as e
  from t)
select doc_id, lang, n_tokens,
       cast(floor((e - n_tokens) / {PACK_BUDGET}) as bigint) as pack_id,
       cast((e - n_tokens) % {PACK_BUDGET} as bigint) as pack_offset
from c
"""


# ---------------------------------------------------------------------------
# Corpus curation — the full training-data pipeline in ONE declarative plan
# ---------------------------------------------------------------------------

CURATION_MIN_QUALITY = 0.5
CURATION_LANGS = ("en", "de")


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship LLM-corpus pipeline: exact dedup → quality gate →
    language filter → leakage-proof train/eval split, composed as ONE
    DataFrame plan (Catalyst fuses the narrow stages; the only wide op
    is the dedup groupBy).

    This is the end-to-end shape a 100 TB pretraining-data job runs:
    every stage is a narrow projection/filter except the digest
    aggregate, so the whole pipeline costs one shuffle over distinct
    digests + a scan.
    """
    from .operators.dedup import exact_dedup
    from .operators.sampling import train_eval_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    deduped = exact_dedup(d)
    m = deduped.select("doc_id", "text", *quality_metrics("text"))
    scored = m.select(
        "doc_id",
        "text",
        "n_tokens",
        quality_score(
            F.col("n_tokens"), F.col("stopword_ratio"), F.col("punct_ratio")
        ),
    ).where(F.col("quality") >= CURATION_MIN_QUALITY)
    tagged = scored.select(
        "doc_id", "n_tokens", "quality", lang_id("text").alias("pred_lang")
    ).where(F.col("pred_lang").isin(*CURATION_LANGS))
    return train_eval_split(tagged, "doc_id", EVAL_FRAC, seed=SAMPLE_SEED).select(
        "doc_id", "pred_lang", "n_tokens", "quality", "split"
    )


def _curation_sql() -> str:
    from .operators.sampling import hash_sample_sql

    hit_cols, lang_expr = _lang_exprs()
    langs_in = ", ".join(f"'{v}'" for v in CURATION_LANGS)
    return f"""
with dd as (select min(doc_id) as doc_id from documents group by md5(text)),
d as (select doc_id, text from documents where doc_id in (select doc_id from dd)),
t as (select doc_id, text, {TOKS_SQL} as toks from d),
m as (
  select doc_id, toks,
    cast(len(toks) as bigint) as n_tokens,
    cast(len(list_filter(toks, tk -> tk in ({_SW}))) as bigint) as n_stop,
    cast(length(text) as bigint) as n_char,
    cast(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) as bigint) as n_alnum_sp
  from t),
q as (
  select doc_id, toks, n_tokens,
    n_stop / n_tokens as stopword_ratio,
    (n_char - n_alnum_sp) / n_char as punct_ratio
  from m),
s as (
  select doc_id, toks, n_tokens,
    (case when n_tokens >= 20 then cast(1.0 as double)
          else n_tokens / cast(20.0 as double) end) * 0.4
    + least(stopword_ratio * 4, cast(1.0 as double)) * 0.4
    + greatest(cast(1.0 as double) - punct_ratio * 4, cast(0.0 as double)) * 0.2
    as quality
  from q),
g as (select * from s where quality >= {CURATION_MIN_QUALITY}),
h as (select doc_id, n_tokens, quality, {hit_cols} from g),
l as (select doc_id, n_tokens, quality, {lang_expr} as pred_lang from h),
k as (select * from l where pred_lang in ({langs_in}))
select doc_id, pred_lang, n_tokens, quality,
       case when {hash_sample_sql('doc_id', EVAL_FRAC, SAMPLE_SEED)}
            then 'eval' else 'train' end as split
from k
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing over `documents` (binary column + mapInPandas)
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_media_from_text(_t(spark, sf_dir, "documents"))
    return decoded_meta(d, binary_col="media", id_cols=("doc_id",))


SQL_MULTIMODAL = """
select doc_id,
       cast(octet_length(encode(text)) as bigint) as n_bytes,
       md5(text) as digest,
       cast(cast(concat('0x', substr(md5(text), 1, 4)) as integer) % 4096 as integer) as width,
       cast(cast(concat('0x', substr(md5(text), 5, 4)) as integer) % 4096 as integer) as height
from documents
"""


# ---------------------------------------------------------------------------
# Sequential bar kernels (applyInPandas) — A4/A5, now with full DuckDB
# oracles: the per-symbol fold is re-expressed as a RECURSIVE CTE over
# BAR CUTS (not rows — O(#bars) iterations): each step finds the next
# cut row via min(rn) against the windowed prefix sums / the renko level
# state, then bars aggregate over the (prev_cut, cut] row ranges. All
# arithmetic stays exact (integer-valued decimal volumes/notionals,
# decimal(38,6) prices cast to double at the edges), so the driver's
# repr()-level float hash matches bit-for-bit. The driver queries run
# top_n=0 and drop the nested topN column (pandas cannot hash list
# cells); topN selection + carry-merge stay pinned by the 440-case
# property suite in tests/test_property_bars.py and the nested-form
# checks in tests/test_aggregations.py.
# ---------------------------------------------------------------------------


def q_thresh_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = thresh_bars(_ticks(spark, sf_dir), "volume", 5000.0, top_n=0)
    return df.drop("topN")


#: Per-symbol row bound for the renko driver query. The DuckDB oracle's
#: recursion costs O(cuts × scanned rows) per symbol — unbounded in SF it
#: cannot finish above sf0.01. A fixed per-symbol span makes the oracle's
#: cost CONSTANT in SF (the sweep is 50/50 at sf0.1 and beyond) while
#: still covering every cut/level/round-up case; the unbounded sequential
#: kernel stays pinned by thresh_bars' full-feed oracle and the 440-case
#: property suite (tests/test_property_bars.py).
_RENKO_SPAN = 4000


def q_renko_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("timestamp", "nanoseconds", "index")
    t = (
        t.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= _RENKO_SPAN)
        .drop("_rn")
    )
    df = renko_bars(t, box_size=25.0, top_n=0)
    return df.drop("topN")


#: Bar-chunk aggregates shared by both bar oracles (reference bar shape,
#: fintick/aggregators/lib.py:31-66): t = windowed tick rows, r = ranges.
_BAR_AGG_SQL = """
       cast(sum(t.volume) as double) as volume,
       cast(sum(case when t."tickRule" = 1 then t.volume
                else cast(0 as decimal(38,6)) end) as double) as "buyVolume",
       cast(sum(t.notional) as double) as notional,
       cast(sum(case when t."tickRule" = 1 then t.notional
                else cast(0 as decimal(38,6)) end) as double) as "buyNotional",
       cast(count(*) as bigint) as ticks,
       cast(count(*) filter (t."tickRule" = 1) as bigint) as "buyTicks"
"""

#: Threshold bars (fintick/aggregators/thresh/lib.py:39-93): cut when the
#: running volume since the previous cut reaches 5000; accumulator resets
#: to 0 at the cut; the tail after the last cut is the (unemitted) partial.
SQL_THRESH_BARS = f"""
with recursive t as (
  select *, row_number() over (partition by symbol order by timestamp, nanoseconds, idx) as rn,
         sum(volume) over (partition by symbol order by timestamp, nanoseconds, idx
                           rows between unbounded preceding and current row) as prefix
  from ({_ticks_sql(None)})
),
cuts as (
  select symbol, cast(0 as bigint) as cut_no, cast(0 as bigint) as rn,
         cast(0 as decimal(38,6)) as base
  from (select distinct symbol from t)
  union all
  select c.symbol, c.cut_no + 1, n.rn, n.prefix
  from cuts c
  join t n on n.symbol = c.symbol
   and n.rn = (select min(t2.rn) from t t2
               where t2.symbol = c.symbol and t2.rn > c.rn and t2.prefix >= c.base + 5000)
),
ranges as (
  select symbol, cut_no, rn as end_rn,
         lag(rn, 1, cast(0 as bigint)) over (partition by symbol order by cut_no) as start_rn
  from cuts
)
select r.symbol,
       cast(arg_min(t.price, t.rn) as double) as open,
       cast(max(t.price) as double) as high,
       cast(min(t.price) as double) as low,
       cast(arg_max(t.price, t.rn) as double) as close,
       arg_max(t.timestamp, t.rn) as timestamp,
       arg_max(t.nanoseconds, t.rn) as nanoseconds,
       {_BAR_AGG_SQL}
from ranges r join t on t.symbol = r.symbol and t.rn > r.start_rn and t.rn <= r.end_rn
where r.cut_no > 0
group by r.symbol, r.cut_no
"""

#: Renko bars (fintick/aggregators/renko/lib.py:25-87): the first trade
#: seeds level = trunc(price/box)·box and is discarded; a cut fires at
#: price ≥ level+box or < level−box; an inexact down-cross rounds the new
#: level back up one box. State recursion is over cuts; mod/trunc run on
#: doubles exactly as the numpy kernel does (positive prices ⇒ DuckDB
#: fmod ≡ numpy %).
_RENKO_BOX = "25.0"
SQL_RENKO_BARS = f"""
with recursive t as (
  select *, cast(price as double) as p,
         row_number() over (partition by symbol order by timestamp, nanoseconds, idx) as rn
  from ({_ticks_sql(None)})
  qualify rn <= {_RENKO_SPAN}
),
cuts as (
  select symbol, cast(0 as bigint) as cut_no, rn, trunc(p / {_RENKO_BOX}) * {_RENKO_BOX} as level
  from t where rn = 1
  union all
  select c.symbol, c.cut_no + 1, n.rn,
         case when n.p < c.level - {_RENKO_BOX} and mod(n.p, {_RENKO_BOX}) <> 0
              then trunc(n.p / {_RENKO_BOX}) * {_RENKO_BOX} + {_RENKO_BOX}
              else trunc(n.p / {_RENKO_BOX}) * {_RENKO_BOX} end as level
  from cuts c
  join t n on n.symbol = c.symbol
   and n.rn = (select min(t2.rn) from t t2
               where t2.symbol = c.symbol and t2.rn > c.rn
                 and (t2.p >= c.level + {_RENKO_BOX} or t2.p < c.level - {_RENKO_BOX}))
),
ranges as (
  select symbol, cut_no, level, rn as end_rn,
         lag(rn, 1, cast(1 as bigint)) over (partition by symbol order by cut_no) as start_rn
  from cuts
)
select r.symbol, r.level,
       cast(arg_max(t.price, t.rn) as double) as price,
       arg_max(t.timestamp, t.rn) as timestamp,
       arg_max(t.nanoseconds, t.rn) as nanoseconds,
       {_BAR_AGG_SQL}
from ranges r join t on t.symbol = r.symbol and t.rn > r.start_rn and t.rn <= r.end_rn
where r.cut_no > 0
group by r.symbol, r.cut_no, r.level
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lww_compact": q_lww_compact,
    "validity_gate": q_validity_gate,
    "run_compaction": q_run_compaction,
    "candles_hourly": q_candles_hourly,
    "daily_consolidation": q_daily_consolidation,
    "topn_per_group": q_topn_per_group,
    "ledger_rollup": q_ledger_rollup,
    "sequence_gaps": q_sequence_gaps,
    "minmax_by": q_minmax_by,
    "replica_final_state": q_replica_final_state,
    "cdc_replay_engine": q_cdc_replay_engine,
    "cdc_replay_mor": q_cdc_replay_mor,
    "scd2_current": q_scd2_current,
    "cdf_changes": q_cdf_changes,
    "merge_into_upsert": q_merge_into_upsert,
    "ttl_retention": q_ttl_retention,
    "rollup_daily": q_rollup_daily,
    "scalar_market_fns": q_scalar_market_fns,
    "futures_active_enrich": q_futures_active_enrich,
    "futures_front_month": q_futures_front_month,
    "pricing_summary": q_pricing_summary,
    "enrich_join": q_enrich_join,
    "semi_anti_join": q_semi_anti_join,
    "running_total": q_running_total,
    "thresh_bars": q_thresh_bars,
    "renko_bars": q_renko_bars,
    "asof_join": q_asof_join,
    "sessionize": q_sessionize,
    "proximity_pairs": q_proximity_pairs,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "token_count": q_token_count,
    "repetition_metrics": q_repetition_metrics,
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "cosine_topk": q_cosine_topk,
    "knn_label_vote": q_knn_label_vote,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "dedup_components": q_dedup_components,
    "multimodal_meta": q_multimodal_meta,
    "matview_refresh": q_matview_refresh,
    "train_eval_split": q_train_eval_split,
    "corpus_curation": q_corpus_curation,
    "sequence_packing": q_sequence_packing,
    "decontamination": q_decontamination,
    "source_stats": q_source_stats,
    "token_percentiles": q_token_percentiles,
}

ORACLES: dict[str, str] = {
    "lww_compact": SQL_LWW,
    "validity_gate": SQL_VALIDITY,
    "run_compaction": SQL_RUN_COMPACTION,
    "candles_hourly": SQL_CANDLES,
    "daily_consolidation": SQL_DAILY,
    "topn_per_group": SQL_TOPN,
    "ledger_rollup": SQL_LEDGER,
    "sequence_gaps": SQL_GAPS,
    "minmax_by": SQL_MINMAX,
    "replica_final_state": SQL_CDC_REPLAY,
    "cdc_replay_engine": SQL_CDC_REPLAY,
    "cdc_replay_mor": SQL_CDC_REPLAY,
    "scd2_current": SQL_SCD2,
    "cdf_changes": SQL_CDF,
    "merge_into_upsert": SQL_MERGE_UPSERT,
    "ttl_retention": SQL_TTL_RETENTION,
    "rollup_daily": SQL_ROLLUP,
    "scalar_market_fns": SQL_SCALAR_FNS,
    "futures_active_enrich": _futures_sql(),
    "futures_front_month": _front_month_sql(),
    "pricing_summary": SQL_PRICING,
    "enrich_join": SQL_ENRICH,
    "semi_anti_join": SQL_SEMI_ANTI,
    "running_total": SQL_RUNNING,
    "thresh_bars": SQL_THRESH_BARS,
    "renko_bars": SQL_RENKO_BARS,
    "asof_join": SQL_ASOF,
    "sessionize": SQL_SESSIONIZE,
    "proximity_pairs": SQL_PROXIMITY,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": _lang_sql(),
    "token_count": SQL_TOKEN_COUNT,
    "repetition_metrics": _repetition_sql(),
    "exact_dedup": SQL_EXACT_DEDUP,
    "ngram_jaccard": SQL_JACCARD,
    "minhash_lsh": _minhash_sql(),
    "simhash": _simhash_sql(),
    "cosine_topk": _cosine_sql(),
    "knn_label_vote": _cosine_sql(with_knn=True),
    "ann_ivf_topk": _ivf_sql(),
    "embedding_near_dup": _near_dup_sql(),
    "dedup_components": _components_sql(),
    "multimodal_meta": SQL_MULTIMODAL,
    # stratified_sample + hash_sample stay implemented + pytest-covered;
    # their registry rows rotated to the lake operational surface
    # (scd2/cdf/merge in round 4; matview_refresh in round 5 — hash_sample
    # is a strict subset of train_eval_split, which keeps the sampling
    # family green)
    **{
        k: v
        for k, v in _sampling_sqls().items()
        if k in ("train_eval_split",)
    },
    "matview_refresh": SQL_MATVIEW,
    "corpus_curation": _curation_sql(),
    "sequence_packing": SQL_PACKING,
    "decontamination": _decontamination_sql(),
    "source_stats": SQL_SOURCE_STATS,
    "token_percentiles": SQL_TOKEN_PERCENTILES,
    # thresh_bars / renko_bars oracles (recursive-CTE-over-cuts) are
    # registered above; topN carry-merge — the one non-SQL-expressible
    # part — stays pinned by tests/test_property_bars.py.
    # doc_fingerprint was folded into the MinHash family (it is 1-perm
    # MinHash with the seeded hash); its SQL/impl remain pytest-covered.
}
