"""Incremental lake→lake replication: ``lake_cdf`` piped into ``lake_sink``.

One Structured Streaming query turns any lake table into a continuously
maintained READ REPLICA of another::

    q = replicate_stream(spark, src_path, dst_path, checkpoint)
    q.awaitTermination()

The composition is the point — both ends are the engine's own public
Spark formats, so replication needs no bespoke machinery:

- source: ``readStream.format("lake_cdf")`` — the change feed with table
  versions as offsets (exactly-once resume from the ordinary streaming
  checkpoint; admission control via ``maxVersionsPerBatch``);
- transform: drop ``update_preimage`` rows, map change types to sink op
  codes (insert/update_postimage → upsert, delete → tombstone), carry
  ``_commit_version`` as the replica's ``lsn``;
- sink: ``writeStream.format("lake_sink")`` — per-batch atomic MOR
  snapshot commits, replays eaten by the applied-batches guard.

LWW correctness of the lsn mapping: within one source commit the feed
emits at most one post-image per key (the merge is LWW-compacted per
commit), and across commits versions are strictly monotone — so
``(warc_ts, _commit_version)`` ranks replica rows exactly as the source
ranked them. A delete's tombstone carries the deleted row's ``warc_ts``
with the HIGHER commit version, so it outranks the row it removes and
is itself outranked by any later re-insert. The replica must be
read-only (its own lsn space belongs to the source); direct writes to
it would interleave foreign lsns — use a distinct ``sinkId`` feed
instead if mixing is ever intended.

Scale: per micro-batch the source plans O(touched buckets) partitions
from a manifest diff and the sink writes O(changed rows) delta bytes —
replication cost tracks the CHANGE RATE, not table size, the same
property Delta/Iceberg CDF replication has. Bootstrap: the default
``starting_version="earliest"`` first streams the earliest retained
snapshot's content as inserts (so a replica of a CLONED or post-expiry
source — whose base snapshot holds rows no retained commit covers — is
complete), then the retained history; alternatively ``clone_to`` a
snapshot and start the feed just past the cloned version.

Reference analogue: mirroring tick tables across BigQuery datasets by
re-running the loaders (/root/reference/fintick/bqloader/base.py:91-112)
— here it is one checkpointed query with row-level deltas.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from .cdf_source import cdf_schema


def replicate_changes(changes_df):
    """The pure transform: CDF rows → sink rows (also usable in batch —
    ``spark.read.format("lake_cdf")`` output goes straight through)."""
    return (
        changes_df.where(F.col("_change_type") != "update_preimage")
        .withColumn(
            "op",
            F.when(F.col("_change_type") == "delete", F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        .withColumn("lsn", F.col("_commit_version").cast("long"))
        .drop("_change_type", "_commit_version")
    )


def create_replica(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    n_buckets: int | None = None,
    write_mode: str = "mor",
):
    """Create (or load) the destination table with the source's current
    schema and key, and additively sync any columns the source gained
    since (the sink never evolves schemas itself, so the replica's DDL
    is applied here, at stream (re)start — the same restart-to-pick-up
    contract the pinned CDF schema has)."""
    from pyspark.sql import types as T

    from .cdf_source import _table
    from .table import LakeTable, _INTERNAL_COLS

    sm = _table(src_path).manifest()
    src_public = [
        f
        for f in T.StructType.fromJson(sm["schema"]).fields
        if f.name not in _INTERNAL_COLS
    ]
    dst = LakeTable.create(
        spark,
        dst_path,
        schema=T.StructType(src_public),
        key=sm["key"],
        n_buckets=n_buckets or int(sm["n_buckets"]),
        if_not_exists=True,
        write_mode=write_mode,
    )
    dst_key = dst.manifest()["key"]
    if dst_key != sm["key"]:
        # fail fast with the real cause — an existing dst keyed
        # differently would otherwise surface as a confusing sink-side
        # error, or silently replicate under the WRONG LWW key
        raise ValueError(
            f"existing table at {dst_path} is keyed on {dst_key!r} but "
            f"the source is keyed on {sm['key']!r} — not a replica of it"
        )
    have = set(dst.schema.fieldNames())
    for f in src_public:
        if f.name not in have:
            dst.add_column(f.name, f.dataType)
    return dst


def replica_position(dst, sink_id: str) -> int | None:
    """Highest source version this sink id has durably applied to the
    replica — parsed from the replica manifest's own applied-batches
    guards (``sink:<sinkId>:<srcVersion>``), so the cursor is committed
    ATOMICALLY with the data it covers and needs no side file."""
    prefix = f"sink:{sink_id}:"
    vs = [
        int(str(g)[len(prefix):])
        for g in dst.manifest()["applied_batches"]
        if str(g).startswith(prefix)
    ]
    return max(vs) if vs else None


def replicate_once(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    n_buckets: int | None = None,
    write_mode: str = "mor",
    sink_id: str | None = None,
    start_version: int | None = None,
):
    """One BATCH drain of the source change feed into the replica — the
    cron-pattern ``availableNow`` invocation without any Structured
    Streaming machinery.

    Why it exists: per-invocation profiling (Spark's own ``durationMs``)
    shows a warm availableNow replication pass spends ~1.3 s in stream
    start/stop + trigger bookkeeping around the actual work — a fixed
    intercept that capped the round-4 pinned 1→4 scaling at 0.729 on
    8M-event inputs. This path is ``spark.read.format("lake_cdf")`` →
    :func:`replicate_changes` → ``df.write.format("lake_sink")``: one
    batch job, same diff kernel, same Arrow write path, same atomic
    commit — the intercept drops to plain job-submission cost.

    Exactly-once without a checkpoint dir: the sink guard id is
    ``sink:<sinkId>:<endVersion>`` and the cursor IS the max guarded end
    version (:func:`replica_position`) — committed in the same manifest
    CAS as the data files, so a crash anywhere re-delivers the same
    version range and the re-apply is swallowed (same id) or converges
    (LWW). One drainer per (replica, sinkId) is the documented
    discipline, like one streaming query per checkpoint.

    Returns ``None`` when caught up, else ``(from_exclusive, to)`` of
    the drained version range. A range whose diff is EMPTY (maintenance
    commits only) commits nothing — no version churn on quiet tables —
    so the cursor re-covers it next call at O(manifest-diff) planning
    cost. Bootstrap mirrors
    :class:`~.consumer.ChangeFeedConsumer`: a fresh cursor starts at the
    source's earliest retained version, which must be EMPTY (clone or
    seed + ``start_version`` otherwise — a batch CDF read cannot
    synthesize the initial-content inserts the stream's ``"earliest"``
    mode emits).

    Reference analogue: the reference re-runs full loaders per cron tick
    (/root/reference/fintick/bqloader/base.py:91-112); this drains only
    the committed delta per tick."""
    from .cdf_source import _table
    from .table import LakeTable

    if sink_id is None:
        from .xxh64 import spark_xxhash64

        sink_id = (
            f"replica-once-{spark_xxhash64(os.path.abspath(src_path)) & 0xFFFFFFFFFFFFFFFF:016x}"
        )
    src = _table(src_path)
    dst = create_replica(spark, src_path, dst_path, n_buckets, write_mode)
    pos = replica_position(dst, sink_id)
    if pos is None:
        if start_version is not None:
            pos = int(start_version)
        else:
            pos = src.earliest_version()
            if src.manifest(pos)["files"]:
                raise ValueError(
                    f"earliest retained snapshot v{pos} of {src_path} is "
                    "non-empty; bootstrap via clone_to/replicate_stream "
                    "and pass start_version"
                )
    cur = src.current_version()
    if cur is None or cur <= pos:
        return None
    ch = (
        spark.read.format("lake_cdf")
        .option("path", src_path)
        .option("startingVersion", pos + 1)
        .option("endingVersion", cur)
        .option("includePreimages", "false")
        .load()
    )
    out = replicate_changes(ch).withColumn(
        "__bucket__", LakeTable.load(spark, dst_path).bucket_expr()
    )
    (
        out.write.format("lake_sink")
        .option("path", dst_path)
        .option("sinkId", sink_id)
        .option("batchId", cur)
        .option("bucketColumn", "__bucket__")
        .mode("append")
        .save()
    )
    return (pos, cur)


def replicate_stream(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    starting_version: "int | str | None" = "earliest",
    sink_id: str | None = None,
    available_now: bool = True,
    max_versions_per_batch: int | None = None,
):
    """Start the replication query (caller awaits/stops it). With
    ``available_now`` the backlog drains and the query stops — the cron
    re-invocation pattern; pass ``False`` for a continuous tail. NOTE:
    with ``max_versions_per_batch`` set, one availableNow invocation
    advances at most that many source versions (the cap latches the
    drain target — `lake_cdf`'s admission-control contract); re-invoke
    until the replica's version stops advancing, or leave the cap unset
    for a true single-shot drain.

    ``sink_id`` defaults to a value derived from the CHECKPOINT path, so
    the exactly-once guard is scoped to this checkpoint's batch-id
    sequence: re-bootstrapping with a FRESH checkpoint gets a fresh
    guard namespace (re-emitted batch ids apply instead of being
    silently swallowed by a previous bootstrap's guards), while restarts
    on the same checkpoint keep exactly-once."""
    if sink_id is None:
        from .xxh64 import spark_xxhash64

        ck = os.path.abspath(checkpoint)
        sink_id = f"replica-{spark_xxhash64(ck) & 0xFFFFFFFFFFFFFFFF:016x}"
    # fail fast (and schema-pin) before any stream machinery spins up
    cdf_schema(src_path)
    reader = (
        spark.readStream.format("lake_cdf")
        .option("path", src_path)
        # replication never reads preimages (replicate_changes drops
        # them) and the sink nulls tombstone payloads, so let the CDF
        # skip old-side payload decode entirely (~95% of old-side bytes
        # on web pages) — delete rows arrive with null payload, which is
        # exactly what the sink would write for them anyway
        .option("includePreimages", "false")
    )
    if starting_version is not None:
        reader = reader.option(
            "startingVersion",
            starting_version
            if isinstance(starting_version, str)
            else int(starting_version),
        )
    if max_versions_per_batch is not None:
        reader = reader.option(
            "maxVersionsPerBatch", int(max_versions_per_batch)
        ).option("checkpointLocation", checkpoint)
    out = replicate_changes(reader.load())
    # precompute the destination bucket in the JVM plan: codegen
    # pmod(xxhash64(key), n) replaces the sink task's per-row
    # pure-Python hash (measured ~81k rows/s/core — the dominant
    # replication cost at high change rates). Pinned at stream start to
    # the destination's CURRENT spec, same as the sink writer's own pin;
    # the writer sample-verifies per task and fails loudly if a rebucket
    # lands between the two manifest reads.
    from .cdf_source import _table

    # the table's own bucket_expr() — the ONE definition of the bucket
    # hash (evolve_bucket_spec keeps manifest n_buckets equal to the
    # current spec's count, so this is the current-spec pin)
    out = out.withColumn("__bucket__", _table(dst_path).bucket_expr())
    w = (
        out.writeStream.format("lake_sink")
        .option("path", dst_path)
        .option("sinkId", sink_id)
        .option("bucketColumn", "__bucket__")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
