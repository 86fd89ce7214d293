"""The CDC ingest pipeline: binlog tail → extract → LWW → MERGE → ledger.

One Structured Streaming job replaces the reference's entire orchestration
stack (Cloud Scheduler → Pub/Sub → chained cloud functions,
/root/reference/fintick/main.py:22-85): stage chaining happens inside
``foreachBatch``, resume comes from the checkpoint (not Firestore pagination
ids), and exactly-once comes from checkpointed batch ids + the LakeTable's
idempotent manifest commit + LWW tombstone merge (re-applying any batch is
a no-op by construction).

Backfill vs tail is the same job in different trigger modes
(``availableNow`` vs continuous micro-batch) — mirroring the reference's
single code path for historical and incremental ingest
(/root/reference/fintick/utils.py:162-217).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.extract import with_extracted_text
from ..lake.table import CommitConflictError, LakeTable
from ..model import PAGES_PHYSICAL_SCHEMA
from ..sources.binlog import read_binlog, read_binlog_stream
from pyspark.sql import types as T

class AuditFailedError(RuntimeError):
    """A write-audit-publish audit rejected a staged batch. The staged
    snapshot was discarded; the committed table is unchanged and the batch
    id remains unapplied (safe to re-run after fixing the feed)."""


#: public pages schema (what queries see)
_PAGES_TABLE_SCHEMA = T.StructType(
    [f for f in PAGES_PHYSICAL_SCHEMA.fields if f.name not in ("lsn", "is_deleted")]
)


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        n_buckets: int = 16,
        key: str = "url",
        write_mode: str = "cow",
        max_deltas: int = 8,
        canonicalize_keys: bool = False,
        audit=None,
        views=None,
        metrics_dir: str | None = None,
        on_violation: str = "fail",
    ):
        """``write_mode="mor"`` switches the lake table to merge-on-read:
        each micro-batch appends O(batch) delta files and the pipeline
        minor-compacts any bucket whose delta count reaches
        ``max_deltas`` — the steady-state shape for high-frequency
        micro-batches at scale (CoW rewrite amplification is O(live
        table) per batch under key-space-wide skew).

        ``canonicalize_keys=True`` rewrites the merge key with
        :func:`~..functions.urls.canonicalize_url` before every merge, so
        spelling variants of one page (scheme/host case, default ports,
        tracking params, fragments) collapse onto one LWW key. Off by
        default: it changes key identity, so it must be chosen at table
        birth and never toggled mid-history (a half-canonicalized table
        has forked keys — the same reason the reference pins one
        canonical symbol spelling per exchange before load).

        ``audit`` turns every merge into write-audit-publish: the batch is
        staged (data + ledger written, committed chain untouched), then
        ``audit(staged_df, summary) -> bool`` inspects the WOULD-BE table
        state; ``True`` publishes atomically, ``False`` discards the
        staged files and raises :class:`AuditFailedError` — the batch id
        is never marked applied, so a corrected feed can re-run the same
        batch under exactly-once. This is the Iceberg WAP pattern; the
        reference's analogue is the post-load validation flag it sets
        only after row counts check out
        (/root/reference/fintick/controllers/base.py:244-267) — but there
        the bad rows are already live; here they never were.

        ``views`` is a list of :class:`~..lake.matview.MaterializedAggregate`
        (or anything with ``refresh()``) kept current inside the same
        ``foreachBatch`` scope: each applied batch refreshes every view
        from the change feed before the next micro-batch starts. View
        refresh is idempotent with its own durable cursor, so a crash
        between table commit and view refresh self-heals on the next
        refresh (the view just consumes a two-version range).

        ``metrics_dir`` lands one JSON document per applied micro-batch
        (batch id, event/insert/update/delete/dedup counts, committed
        version, wall seconds, events/sec) — the job's durable
        observability feed, queryable with :func:`read_metrics`. One file
        per batch id, written atomically, so a crash-replayed batch
        overwrites its own entry instead of duplicating it; a batch
        skipped by the exactly-once guard only writes an entry if none
        exists (the original apply's record is never clobbered). The
        reference's analogue is the Firestore doc count fields written
        after each load (/root/reference/fintick/controllers/base.py:258-267).

        ``on_violation`` is the CHECK-constraint policy passed through to
        every merge (``fail`` | ``quarantine`` | ``drop`` — see
        :meth:`~..lake.table.LakeTable.merge_apply`); it only matters once
        ``add_constraint`` has declared constraints on the table.
        Quarantine counts surface in the per-batch metrics feed."""
        self.spark = spark
        self.table_path = table_path
        self.n_buckets = n_buckets
        self.key = key
        self.write_mode = write_mode
        self.max_deltas = max_deltas
        self.canonicalize_keys = canonicalize_keys
        self.audit = audit
        self.views = list(views or [])
        self.metrics_dir = metrics_dir
        self.on_violation = on_violation

    def ensure_table(self) -> LakeTable:
        return LakeTable.create(
            self.spark,
            self.table_path,
            _PAGES_TABLE_SCHEMA,
            key=self.key,
            n_buckets=self.n_buckets,
            if_not_exists=True,
            write_mode=self.write_mode,
        )

    @property
    def table(self) -> LakeTable:
        return LakeTable.load(self.spark, self.table_path)

    # ------------------------------------------------------------ batches

    def apply_batch(self, changes: DataFrame, batch_id: int) -> dict:
        """The foreachBatch body. Extraction (vectorized pandas UDF) runs
        batch-side so the lake always stores derived ``text``; it is
        applied by the merge to the LWW *winners only* — a superseded
        update never pays the UDF (pure per-row transform ⇒ identical
        output either side of compaction). The merge does LWW + schema
        evolution + bucket-pruned rewrite + ledger in one atomic commit.

        A :class:`CommitConflictError` (a concurrent maintenance commit —
        compaction, retention — won the version CAS) is retried: the
        merge recomputes against the new current snapshot, and because
        LWW merges commute the retried batch converges to the same state
        it would have produced without the race."""
        import time as _time

        t_start = _time.time()
        table = self.ensure_table()
        if self.canonicalize_keys:
            from pyspark.sql import functions as F

            from ..functions.urls import canonicalize_url

            changes = changes.withColumn(
                self.key, canonicalize_url(F.col(self.key))
            )
        last: Exception | None = None
        for _attempt in range(3):
            try:
                if self.audit is None:
                    out = table.merge_apply(
                        changes,
                        batch_id=batch_id,
                        enrich=with_extracted_text,
                        on_violation=self.on_violation,
                    )
                else:
                    out = table.merge_apply(
                        changes,
                        batch_id=batch_id,
                        enrich=with_extracted_text,
                        publish=False,
                        on_violation=self.on_violation,
                    )
                    if not out.get("skipped"):
                        token = out["staged_token"]
                        try:
                            ok = self.audit(table.read(version=token), out)
                        except BaseException:
                            # a CRASHING audit (user-code bug, Spark error
                            # reading the staged frame) must not strand the
                            # staged snapshot: every stream restart would
                            # re-stage a new one, accumulating orphans that
                            # retention treats as live pending commits
                            table.discard_staged(token)
                            raise
                        if not ok:
                            table.discard_staged(token)
                            raise AuditFailedError(
                                f"batch {batch_id} failed its audit; staged "
                                f"snapshot discarded, table unchanged"
                            )
                        try:
                            table.publish(token)
                        except CommitConflictError:
                            # staged against a superseded snapshot — drop
                            # the stale file set and re-merge from the new
                            # current
                            table.discard_staged(token)
                            raise
                break
            except CommitConflictError as e:
                last = e
        else:
            raise last
        if table.write_mode == "mor" and not out.get("skipped"):
            # compaction races external maintenance the same way the merge
            # does: a concurrent commit that rewrote its inputs raises
            # CommitConflictError, and re-calling recomputes from the new
            # head. A persistent race must not kill the streaming query —
            # compaction is an optimization; the delta backlog just drains
            # on a later batch or maintenance pass.
            for _ in range(3):
                try:
                    table.minor_compact(max_deltas=self.max_deltas)
                    break
                except CommitConflictError:
                    continue
        # views refresh on SKIPPED batches too: a replayed batch means the
        # original apply may have crashed between table commit and view
        # refresh — this is exactly the self-heal moment the views
        # contract promises, and refresh() is a cheap cursor-checked no-op
        # when the view is already current
        for v in self.views:
            v.refresh()
        if self.metrics_dir is not None:
            self._record_metrics(table, batch_id, out, _time.time() - t_start)
        return out

    def _record_metrics(
        self, table: LakeTable, batch_id: int, out: dict, wall_sec: float
    ) -> None:
        import json
        import time as _time
        import uuid as _uuid

        os.makedirs(self.metrics_dir, exist_ok=True)
        path = os.path.join(self.metrics_dir, f"batch-{batch_id:012d}.json")
        if out.get("skipped") and os.path.exists(path):
            return  # keep the original apply's record
        doc = {
            "batch_id": batch_id,
            "skipped": bool(out.get("skipped")),
            "version": table.current_version(),
            "wall_sec": round(wall_sec, 4),
            "recorded_at_unix": _time.time(),
        }
        if not out.get("skipped"):
            for k in ("n_events", "n_insert", "n_update", "n_delete", "n_dedup"):
                doc[k] = out.get(k)
            if "n_quarantined" in out:
                doc["n_quarantined"] = out["n_quarantined"]
            doc["events_per_sec"] = (
                round(out["n_events"] / wall_sec, 2) if wall_sec > 0 else None
            )
            doc["schema_changes"] = len(out.get("schema_changes") or [])
        # atomic overwrite through the table's commit backend (replay of
        # the same batch id rewrites its doc in place)
        self.table.backend.put(path, json.dumps(doc).encode())

    # ---------------------------------------------------------- streaming

    def run_stream(
        self,
        binlog_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
        available_now: bool = True,
        timeout_secs: float | None = None,
        source_reader=None,
    ):
        """Tail the binlog directory with checkpointed exactly-once apply.

        Kill-and-resume: Structured Streaming replays the last uncommitted
        micro-batch with the SAME batch_id after restart; ``merge_apply``
        skips already-applied ids and LWW-merge makes even a forced
        re-apply produce the identical table state.

        ``source_reader(spark, dir, max_files_per_trigger)`` overrides the
        feed format — e.g. ``sources.debezium.read_debezium_json_stream``
        for a Debezium ndjson feed; default is the parquet binlog.
        """
        self.ensure_table()
        reader = source_reader or read_binlog_stream
        stream = reader(self.spark, binlog_dir, max_files_per_trigger)

        def _sink(df: DataFrame, batch_id: int) -> None:
            self.apply_batch(df, batch_id)

        return self._start_query(
            stream, _sink, "cdc_apply", checkpoint_dir, available_now,
            timeout_secs,
        )

    def _start_query(
        self,
        stream: DataFrame,
        sink,
        name_prefix: str,
        checkpoint_dir: str,
        available_now: bool,
        timeout_secs: float | None,
    ):
        """Shared writer/trigger/await block for every pipeline stream —
        one place for query naming and trigger semantics, so a fix to
        either cannot silently miss a sibling entry point."""
        writer = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(f"{name_prefix}_{os.path.basename(self.table_path)}")
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
        else:
            q = writer.trigger(processingTime="1 second").start()
        if timeout_secs is not None:
            q.awaitTermination(timeout_secs)
        else:
            q.awaitTermination()
        return q

    def run_debezium_stream(
        self,
        feed_dir: str,
        checkpoint_dir: str,
        dead_letter_dir: str | None = None,
        max_files_per_trigger: int = 1,
        available_now: bool = True,
        timeout_secs: float | None = None,
    ):
        """Tail a Debezium ndjson feed with dead-letter quarantine.

        The stream carries the RAW lines; each micro-batch is parsed ONCE
        (the parsed frame is persisted for the batch) and split into
        valid change events (merged exactly-once like any other batch)
        and dead letters (landed under ``dead_letter_dir/batch-<id>/``
        with their parse reason — default ``<checkpoint_dir>/dead_letter``
        so malformed events are never silently discarded). Both outcomes
        happen in the same ``foreachBatch`` scope, so a replayed batch
        re-lands the SAME dead letters under the SAME batch id
        (overwrite ⇒ no duplicates) — a malformed event can never abort
        the job OR silently vanish.
        """
        from ..sources.debezium import (
            _parsed,
            changes_from_parsed,
            dead_letters_from_parsed,
        )

        self.ensure_table()
        if dead_letter_dir is None:
            # the documented contract is no-silent-vanish; a None default
            # that skipped the quarantine write broke it for every caller
            # that never thought about dead letters
            dead_letter_dir = os.path.join(checkpoint_dir, "dead_letter")
        raw = (
            self.spark.readStream.option(
                "maxFilesPerTrigger", max_files_per_trigger
            ).text(feed_dir)
        )

        def _sink(lines: DataFrame, batch_id: int) -> None:
            # one from_json pass per batch: both splits read the persisted
            # parsed frame instead of each re-parsing every payload
            p = _parsed(lines).persist()
            try:
                (
                    dead_letters_from_parsed(p)
                    .write.mode("overwrite")
                    .parquet(os.path.join(dead_letter_dir, f"batch-{batch_id}"))
                )
                self.apply_batch(changes_from_parsed(p), batch_id=batch_id)
            finally:
                p.unpersist()

        return self._start_query(
            raw, _sink, "cdc_dbz", checkpoint_dir, available_now, timeout_secs
        )

    def fork(
        self,
        table_path: str,
        checkpoint_src: str,
        checkpoint_dst: str,
        **overrides,
    ) -> "CdcPipeline":
        """Disaster-recovery / blue-green fork: clone the lake table
        (zero-copy, :meth:`~..lake.table.LakeTable.clone_to`) AND the
        streaming checkpoint as ONE consistent pair, returning a pipeline
        that resumes the SAME binlog stream against the fork exactly-once.

        The pair must travel together because the two halves of the
        exactly-once contract live in different places: the checkpoint
        holds the committed source offsets (which binlog files are
        consumed), the table manifest holds the applied-batch guard.
        Copying only the checkpoint would skip batches the fork never
        applied; cloning only the table would re-consume the whole feed.
        With both, the order of operations is crash-shaped in the safe
        direction — the CHECKPOINT is copied FIRST, so it can only be
        at-or-behind the cloned table (a batch the live stream applies
        between the two steps lands in the clone but not in the copied
        checkpoint), and any batch Structured Streaming replays on the
        fork is skipped (or LWW re-applied to the same bytes) by the
        carried guard. The reverse order would be the unsafe one: a
        checkpoint AHEAD of the table silently drops the gap batches.
        Resuming both sides against the same feed therefore converges
        them to identical state (tested).

        Always forks the CURRENT version: a pinned older snapshot paired
        with a newer checkpoint would silently drop the batches between
        them (checkpoint says consumed, table never applied them).
        Pipeline config is inherited; ``overrides`` replaces individual
        kwargs. NOT inherited by default (two pipelines must not share
        them): ``metrics_dir`` (a shared metrics feed would interleave
        two batch-id sequences) and ``views`` (a MaterializedAggregate
        is bound to its source-table and view-storage paths — the fork
        refreshing the SAME view state from a different table would
        corrupt it; create fresh views over the fork and pass them via
        ``overrides`` if the fork should maintain its own)."""
        import shutil

        if os.path.exists(checkpoint_dst) and os.listdir(checkpoint_dst):
            raise FileExistsError(
                f"checkpoint dir already exists at {checkpoint_dst}"
            )
        # copying a LIVE stream's checkpoint races Spark's own metadata-log
        # compaction (old offset/commit files deleted mid-listing →
        # shutil.Error on files that vanished): retry on a fresh listing
        for attempt in range(3):
            try:
                shutil.copytree(checkpoint_src, checkpoint_dst, dirs_exist_ok=True)
                break
            except shutil.Error:
                if attempt == 2:
                    shutil.rmtree(checkpoint_dst, ignore_errors=True)
                    raise
                shutil.rmtree(checkpoint_dst, ignore_errors=True)
        try:
            self.table.clone_to(table_path)
        except BaseException:
            # fork is a pair or nothing: a stranded copied checkpoint would
            # block every retry at the exists-guard above with no fork made
            shutil.rmtree(checkpoint_dst, ignore_errors=True)
            raise
        kw = dict(
            n_buckets=self.n_buckets,
            key=self.key,
            write_mode=self.write_mode,
            max_deltas=self.max_deltas,
            canonicalize_keys=self.canonicalize_keys,
            audit=self.audit,
            on_violation=self.on_violation,
            metrics_dir=None,
        )
        kw.update(overrides)
        return CdcPipeline(self.spark, table_path, **kw)

    # ------------------------------------------------------------- replay

    def replay_all(self, binlog_dir: str, batch_id: int = 0) -> dict:
        """Full-replay in a single batch (the oracle path for equivalence
        tests: stream-applied state must equal single-shot replay state)."""
        return self.apply_batch(read_binlog(self.spark, binlog_dir), batch_id=batch_id)


def read_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """The pipeline's per-batch metrics feed as a DataFrame (one row per
    batch id — throughput trend, dedup ratio, schema-change audit). Reads
    the JSON documents written by ``CdcPipeline(metrics_dir=...)``; an
    empty/uncreated feed returns an empty frame (a polling dashboard must
    not crash on PATH_NOT_FOUND before the first batch lands)."""
    import glob as _glob

    if not _glob.glob(os.path.join(metrics_dir, "batch-*.json")):
        return spark.createDataFrame(
            [],
            "batch_id long, skipped boolean, version long, wall_sec double, "
            "recorded_at_unix double, n_events long, n_insert long, "
            "n_update long, n_delete long, n_dedup long, "
            "events_per_sec double, schema_changes long",
        )
    return spark.read.option("multiLine", True).json(
        os.path.join(metrics_dir, "batch-*.json")
    )
