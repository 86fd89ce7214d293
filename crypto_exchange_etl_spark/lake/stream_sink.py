"""``lake_sink`` — the lake table as a first-class Structured Streaming sink.

Lets ANY streaming DataFrame land in a lake table with exactly-once
semantics and no engine imports on the query side::

    spark.dataSource.register(LakeSinkDataSource)
    (df.writeStream.format("lake_sink")
       .option("path", table_path)
       .option("checkpointLocation", ck)
       .start())

The engine's own ingest loop (``CdcPipeline``) remains the CDC path —
it runs the full LWW compaction + extraction + merge DAG per micro-batch
inside ``foreachBatch``. This sink is the *open* face for everything
else: side feeds, enrichment jobs, backfills from foreign streams — any
upstream that can produce rows shaped like the table.

Input contract (validated at query start): the merge key and ``warc_ts``
are required; other public columns are optional (absent → null — the
sink never evolves the schema; use ``merge_into`` for that); two
optional extras steer semantics:

- ``op``  — 'I'/'U'/'D' (case-insensitive; 'D' writes a tombstone). The
  reference envelope's op codes (CHANGES_SCHEMA). Absent column OR null
  value → upsert.
- ``lsn`` — LWW tiebreaker. Absent → derived as ``warc_ts`` unix-micros
  (documented caveat: rows for one key sharing one timestamp then tie
  — provide a real ``lsn`` whenever the upstream has one).

Mechanics (MERGE-ON-READ append, the Iceberg/Delta streaming-sink
shape): executor tasks hash rows to the table's CURRENT bucket spec —
``pmod(xxhash64(key), n)`` via the pure-Python twin (``xxh64``, parity
pinned by tests) — and write one parquet delta file per touched bucket
per task, under the table's physical schema with footer-derived manifest
stats, all OUTSIDE the version chain. The driver's ``commit(messages,
batchId)`` then publishes every staged file as ONE snapshot commit
(optimistic CAS with pure-append rebase on conflict) and records a
ledger row — data+lineage atomicity identical to the merge path.

Exactly-once: the commit carries ``applied_batches`` guard id
``"sink:<sinkId>:<batchId>"``. A restarted/replayed micro-batch rewrites
fresh files, finds the guard, deletes its own files, and commits
nothing. Distinct queries writing one table need distinct ``sinkId``
options (default ``"lake_sink"``); crash-orphaned files (task death,
abort) are invisible to readers and swept by ``remove_orphans``.

Why LWW makes a *sink* (not a transaction log) sufficient: concurrent
writers — the CDC pipeline, other sinks, ``merge_into`` — commute at the
row level (rank ``(warc_ts, lsn)`` decides, not arrival order), so a
pure-append MOR commit never needs to re-read live state; fold happens
at read/compaction time. That is what keeps the sink's write path
O(batch) with zero Spark shuffles beyond the upstream plan itself.

Scale: Arrow batches in (``DataSourceStreamArrowWriter`` — vectorized
boundary), pyarrow parquet out; per-task Python cost is the per-row
bucket hash (the one per-row loop, documented; ~12 µs/row measured) —
eliminate it entirely with ``option("bucketColumn", "__bucket__")``
after adding ``pmod(xxhash64(<key>), n_buckets)`` to the upstream plan
(JVM codegen; tasks sample-verify 8 rows against the pure-Python twin
and fail the batch loudly on any spec mismatch — ``replicate_stream``
does this wiring automatically). Repartition the upstream by key to cut
files-per-bucket when fan-in is wide. Delta backlog drains through the
table's normal ``minor_compact`` / auto-maintenance policy.

Reference analogue: the append-only hourly partition loads
(/root/reference/fintick/bqloader/base.py:91-112) — re-imagined as
atomic snapshot commits with row-level LWW instead of
partition-truncate idempotence.
"""

from __future__ import annotations

import datetime as _dt
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

from .xxh64 import bucket_of

_OPS_DELETE = {"d", "delete"}
_OPS_UPDATE = {"u", "update"}
_OPS_OK = {"i", "u", "d", "c", "r", "insert", "update", "delete"}


def _to_unix_micros(series):
    """tz-aware datetime series → unix micros, independent of the
    incoming pandas unit (Arrow hands datetime64[us], older paths [ns] —
    a bare ``astype(int64)`` silently changes meaning with the unit)."""
    import pandas as pd

    s = pd.to_datetime(series, utc=True)
    return s.dt.as_unit("us").astype("int64")


@dataclass
class SinkCommit(WriterCommitMessage):
    """Per-task staged-file inventory (manifest entries, paths relative
    to the table root) plus op tallies for the ledger row."""

    entries: list = field(default_factory=list)
    n_rows: int = 0
    n_insert: int = 0
    # 'U'-op rows, tallied as UPSERTS (the sink appends deltas without
    # probing the table, so this is the feed's claimed update count, not
    # a matched-key count — the merge path classifies exactly)
    n_update: int = 0
    n_delete: int = 0


class LakeSinkWriter(DataSourceStreamArrowWriter):
    def __init__(self, schema: T.StructType, options: dict):
        from .cdf_source import _table
        from .table import _INTERNAL_COLS

        self.path = options["path"]
        self.sink_id = str(options.get("sinkId", options.get("sinkid", "lake_sink")))
        t = _table(self.path)
        m = t.manifest()
        if m.get("constraints") and str(
            options.get("skipConstraints", options.get("skipconstraints", "false"))
        ).lower() != "true":
            # fail closed: sink tasks stage Arrow batches with no SQL
            # engine, so the table's CHECK constraints cannot be evaluated
            # here — an unchecked append would silently violate them.
            # Route constrained feeds through the merge path, or
            # acknowledge the bypass explicitly.
            raise ValueError(
                f"table {self.path} declares CHECK constraint(s) "
                f"{sorted(m['constraints'])} which lake_sink cannot "
                "enforce; write via merge_apply/merge_into, or opt out "
                "with .option('skipConstraints', 'true')"
            )
        self._key = m["key"]
        self._n_buckets = t._specs(m)[t._current_spec(m)]
        self._spec = t._current_spec(m)
        self._epoch = t._current_epoch(m)
        phys = t._physical_schema(m)
        self._phys_fields = [(f.name, f.dataType) for f in phys.fields]
        self._public = [f.name for f in phys.fields if f.name not in _INTERNAL_COLS]
        # optional JVM-precomputed bucket column — parsed ONCE, before
        # the extras check that must exempt it. "op"/"lsn" are rejected
        # as bucket carriers: write() pops both for their own semantics
        # before bucketing, so designating one would silently degrade to
        # the per-row Python hash with the option ignored.
        self._bucket_col = options.get(
            "bucketColumn", options.get("bucketcolumn")
        )
        if self._bucket_col in ("op", "lsn"):
            raise ValueError(
                f"lake_sink bucketColumn must be a dedicated column, not "
                f"{self._bucket_col!r} (reserved for sink semantics) — "
                "compute pmod(xxhash64(<key>), n_buckets) into its own "
                "column"
            )
        in_cols = set(schema.fieldNames())
        extras = (
            in_cols - set(self._public) - {"op", "lsn", self._bucket_col}
        )
        if extras:
            raise ValueError(
                f"lake_sink input has columns outside the table schema: "
                f"{sorted(extras)} (the sink never evolves the schema — "
                f"use LakeTable.merge_into / the CDC pipeline for that)"
            )
        for req in (self._key, "warc_ts"):
            if req not in in_cols:
                raise ValueError(f"lake_sink input must carry {req!r}")
        self._has_op = "op" in in_cols
        self._has_lsn = "lsn" in in_cols
        # JVM-precomputed bucket semantics: the upstream plan carries
        # pmod(xxhash64(<key>), n_buckets) as an integer column (codegen
        # speed), replacing the sink task's per-row pure-Python hash —
        # the one per-row loop in the engine's write paths. Trust but
        # verify: each task re-hashes a deterministic sample and fails
        # the batch loudly on any mismatch (wrong n, wrong spec, wrong
        # hash), so a stale upstream can never commit mis-bucketed rows.
        if self._bucket_col is not None:
            bf = next(
                (f for f in schema.fields if f.name == self._bucket_col), None
            )
            if bf is None:
                raise ValueError(
                    f"lake_sink bucketColumn {self._bucket_col!r} is not in "
                    "the input schema"
                )
            if not isinstance(bf.dataType, (T.IntegerType, T.LongType)):
                raise ValueError(
                    f"lake_sink bucketColumn {self._bucket_col!r} must be "
                    f"int/long, got {bf.dataType.simpleString()} — compute "
                    "it as pmod(xxhash64(<key>), n_buckets)"
                )
        # validate TYPES, not just names: a mis-typed key hashes to a
        # different bucket than the JVM merge path (int 123 vs "123"),
        # and the final arrow cast would coerce silently — the row would
        # commit where no reader folds or finds it
        want = dict(self._phys_fields)
        want["op"] = T.StringType()
        mism = [
            f"{f.name}: input {f.dataType.simpleString()} vs table "
            f"{want[f.name].simpleString()}"
            for f in schema.fields
            if f.name in want and f.dataType != want[f.name]
        ]
        if mism:
            raise ValueError(
                "lake_sink input column types do not match the table "
                f"schema — cast upstream: {mism}"
            )

    # ------------------------------------------------------ executor side

    def _arrow_schema(self):
        from pyspark.sql.pandas.types import to_arrow_schema

        required = {"lsn", "is_deleted", self._key, "warc_ts"}
        return to_arrow_schema(
            T.StructType(
                [
                    T.StructField(name, dt, name not in required)
                    for name, dt in self._phys_fields
                ]
            )
        )

    def write(self, iterator: Iterator) -> SinkCommit:
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        frames = [b.to_pandas() for b in iterator]
        msg = SinkCommit()
        if not frames:
            return msg
        df = pd.concat(frames, ignore_index=True)
        if df.empty:
            return msg

        if df[self._key].isna().any() or df["warc_ts"].isna().any():
            raise ValueError(
                f"lake_sink rows must have non-null {self._key!r} and 'warc_ts'"
            )
        if self._has_op:
            raw_op = df.pop("op")
            # null op = plain upsert, the same default as an absent op
            # column (astype(str) would stringify None/NaN into literal
            # 'none'/'nan' and reject codes the feed never sent)
            present = raw_op.notna()
            ops = raw_op.where(present, "i").astype(str).str.lower()
            bad = set(ops[present].unique()) - _OPS_OK
            if bad:
                raise ValueError(f"lake_sink unknown op codes: {sorted(bad)}")
            deleted = ops.isin(_OPS_DELETE)
            updated = ops.isin(_OPS_UPDATE) & ~deleted
        else:
            deleted = pd.Series(False, index=df.index)
            updated = pd.Series(False, index=df.index)
        if self._has_lsn:
            if df["lsn"].isna().any():
                raise ValueError("lake_sink 'lsn' column must be non-null")
            lsn = df.pop("lsn").astype("int64")
        else:
            lsn = _to_unix_micros(df["warc_ts"])

        # build STRICTLY in physical-field order: the arrow cast below is
        # order-sensitive, and an evolved schema can carry ``lsn`` between
        # payload columns (merge appends new payload cols after it)
        out = pd.DataFrame(index=df.index)
        for name, _dt in self._phys_fields:
            if name == "lsn":
                out[name] = lsn
            elif name == "is_deleted":
                out[name] = deleted.astype(bool)
            else:
                out[name] = df[name] if name in df.columns else None
        # tombstones carry no payload bytes (merge-path convention).
        # Null via object dtype: a plain loc[...]=None on an int64 column
        # upcasts the WHOLE column to float64, silently corrupting
        # payload longs above 2^53 for every row in the batch (the cast
        # back to int64 is then "safe" and hides it)
        dele_mask = out["is_deleted"].to_numpy()
        if dele_mask.any():
            keep = ~out["is_deleted"]
            for c in self._public:
                if c not in (self._key, "warc_ts"):
                    out[c] = out[c].astype(object).where(keep, None)
        if self._bucket_col is not None:
            # JVM-precomputed buckets (pmod(xxhash64(key), n) computed at
            # codegen speed upstream). Verify a deterministic sample per
            # task against the pure-Python twin: a wrong n / spec / hash
            # upstream mis-buckets nearly every row, so 8 probes catch it
            # with near-certainty — and the failed task fails the batch
            # before anything commits. Never fall back silently: init
            # guarantees the column is in the schema, so its absence
            # here is a bug, not a mode.
            if self._bucket_col not in df.columns:
                raise ValueError(
                    f"lake_sink bucketColumn {self._bucket_col!r} missing "
                    "from the batch frame"
                )
            claimed = df[self._bucket_col]
            if claimed.isna().any():
                raise ValueError(
                    f"lake_sink bucketColumn {self._bucket_col!r} has nulls"
                )
            claimed = claimed.astype("int64")
            if ((claimed < 0) | (claimed >= self._n_buckets)).any():
                raise ValueError(
                    f"lake_sink bucketColumn {self._bucket_col!r} out of "
                    f"range [0, {self._n_buckets}) — computed under a "
                    "different bucket spec?"
                )
            for i in range(min(8, len(out))):
                want_b = bucket_of(out[self._key].iloc[i], self._n_buckets)
                if int(claimed.iloc[i]) != want_b:
                    raise ValueError(
                        f"lake_sink bucketColumn {self._bucket_col!r} "
                        f"disagrees with the table's bucket spec at key "
                        f"{out[self._key].iloc[i]!r}: claimed "
                        f"{int(claimed.iloc[i])}, spec says {want_b} — "
                        f"recompute as pmod(xxhash64(<key>), "
                        f"{self._n_buckets})"
                    )
            out["__b__"] = claimed.to_numpy()
        else:
            # the one per-row Python loop in the engine's write paths —
            # the documented cost of a generic sink (the CDC pipeline's
            # JVM xxhash64 stays the hot path); pass bucketColumn to
            # move it into the upstream JVM plan
            out["__b__"] = [
                bucket_of(v, self._n_buckets) for v in out[self._key]
            ]

        token = uuid.uuid4().hex[:12]
        aschema = self._arrow_schema()
        # one groupby pass, not one full-frame boolean mask per bucket
        for b, grp in out.groupby("__b__", sort=True):
            grp = grp.drop(columns="__b__")
            rel_dir = f"data/sink-{token}/bucket={b}"
            full_dir = os.path.join(self.path, rel_dir)
            os.makedirs(full_dir, exist_ok=True)
            rel = f"{rel_dir}/part-{token}.parquet"
            full = os.path.join(self.path, rel)
            tbl = pa.Table.from_pandas(grp, preserve_index=False).cast(aschema)
            pq.write_table(tbl, full)
            stats: dict[str, Any] = {}
            kv = grp[self._key]
            if isinstance(kv.iloc[0], str):
                # same truncation as the merge path's manifest stats
                # (_STAT_TRUNC prefix lower / bumped-prefix upper):
                # untruncated 2KB urls in every delta entry would bloat
                # every subsequent manifest until compaction
                from .table import LakeTable

                stats[self._key] = [
                    str(kv.min())[: LakeTable._STAT_TRUNC],
                    LakeTable._stat_upper(str(kv.max())),
                ]
            wt = _to_unix_micros(grp["warc_ts"])
            stats["warc_ts"] = [int(wt.min()), int(wt.max())]
            stats["lsn"] = [int(grp["lsn"].min()), int(grp["lsn"].max())]
            entry = {
                "path": rel,
                "bucket": int(b),
                "bytes": os.path.getsize(full),
                "delta": True,
                "rows": int(len(grp)),
                "stats": stats,
            }
            if self._spec:
                entry["spec"] = self._spec
            if self._epoch:
                entry["epoch"] = self._epoch
            msg.entries.append(entry)
        msg.n_rows = int(len(out))
        msg.n_delete = int(out["is_deleted"].sum())
        msg.n_update = int(updated.sum())
        msg.n_insert = msg.n_rows - msg.n_delete - msg.n_update
        return msg

    # -------------------------------------------------------- driver side

    def _guard(self, batch_id: int) -> str:
        return f"sink:{self.sink_id}:{int(batch_id)}"

    def _drop_files(self, messages) -> None:
        for msg in messages:
            for e in getattr(msg, "entries", None) or []:
                try:
                    os.remove(os.path.join(self.path, e["path"]))
                except OSError:
                    pass

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API)
        import json

        from .cdf_source import _table
        from .table import CommitConflictError

        t = _table(self.path)
        entries = [
            e for m in messages if m is not None
            for e in getattr(m, "entries", [])
        ]
        n_rows = sum(getattr(m, "n_rows", 0) for m in messages if m)
        n_ins = sum(getattr(m, "n_insert", 0) for m in messages if m)
        n_upd = sum(getattr(m, "n_update", 0) for m in messages if m)
        n_del = sum(getattr(m, "n_delete", 0) for m in messages if m)
        guard = self._guard(batchId)
        for _attempt in range(64):
            m = t.manifest()
            if guard in set(map(str, m["applied_batches"])):
                # replayed micro-batch: the earlier attempt's commit owns
                # the data — this attempt's files are orphans, drop them
                self._drop_files(messages)
                return
            if not entries:
                return  # empty batch: nothing to commit, no guard needed
            if m["key"] != self._key:
                raise ValueError(
                    f"table key changed under the sink: {m['key']!r}"
                )
            rel_ledger = f"ledger/sink-{self.sink_id}-{batchId}-{uuid.uuid4().hex[:8]}.parquet"
            now = time.time()
            t._write_ledger_file(
                [
                    {
                        # -2 = external-sink lineage (cf. -1 maintenance):
                        # ledger row yes, feed watermark no
                        "partition": -2,
                        "batch_id": int(batchId),
                        "max_lsn": max(
                            int(e["stats"]["lsn"][1]) for e in entries
                        ),
                        "n_events": n_rows,
                        "n_insert": n_ins,
                        # upsert count by the feed's own op codes ('U'
                        # rows), not a matched-key count: sink_append
                        # never probes the table (the merge path's
                        # ledger rows carry exact classification)
                        "n_update": n_upd,
                        "n_delete": n_del,
                        "n_dedup": 0,
                        "ok": True,
                        "committed_at": _dt.datetime.fromtimestamp(
                            now, tz=_dt.timezone.utc
                        ),
                    }
                ],
                rel_ledger,
            )
            nm = {
                **{
                    k: v
                    for k, v in m.items()
                    if k not in ("version", "snapshot_id", "parent_version",
                                 "files", "ledger_files", "applied_batches",
                                 "summary", "committed_at_unix", "files_delta")
                },
                "version": m["version"] + 1,
                "snapshot_id": str(uuid.uuid4()),
                "parent_version": m["version"],
                "files": m["files"] + entries,
                "ledger_files": m["ledger_files"] + [rel_ledger],
                "applied_batches": m["applied_batches"] + [guard],
                "summary": {
                    "operation": "sink_append",
                    "sink_id": self.sink_id,
                    "batch_id": int(batchId),
                    "n_events": n_rows,
                    "n_insert": n_ins,
                    "n_update": n_upd,
                    "n_delete": n_del,
                    "files_added": len(entries),
                },
                "committed_at_unix": now,
            }
            try:
                t._write_manifest(json.loads(json.dumps(nm)))
                return
            except CommitConflictError:
                # pure file append: rebase = re-read head and retry
                try:
                    os.remove(os.path.join(self.path, rel_ledger))
                except OSError:
                    pass
                continue
        raise CommitConflictError(
            f"lake_sink commit lost the version race 64 times at {self.path}"
        )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (API)
        self._drop_files(messages)


class LakeSinkBatchWriter(LakeSinkWriter, DataSourceArrowWriter):
    """Batch face of the sink — identical task write path and driver
    commit (same Arrow staging, same ``sink:<sinkId>:<batchId>`` guard,
    same CAS append-rebase), minus ALL Structured Streaming machinery.

    Measured on this host (4 cores, warm JVM): one availableNow
    replication pass spends ~1.3 s in stream start/stop + trigger
    bookkeeping around a 1.4 s addBatch — the per-invocation intercept
    the round-4 scaling runs kept paying. A batch write pays only the
    job itself, which is what makes frequent cron-style drains scale
    (see :func:`~.replicate.replicate_once`).

    Because a batch write has no engine-assigned micro-batch id, the
    caller MUST pass ``option("batchId", <monotone int>)`` — the
    exactly-once guard key. Re-running the same (sinkId, batchId) is a
    structural no-op, exactly like a replayed micro-batch."""

    def __init__(self, schema: T.StructType, options: dict):
        super().__init__(schema, options)
        bid = options.get("batchId", options.get("batchid"))
        if bid is None:
            raise ValueError(
                "lake_sink batch writes need .option('batchId', <int>) — "
                "the exactly-once guard key a stream gets from its "
                "checkpoint"
            )
        self._batch_id = int(bid)

    def commit(self, messages) -> None:  # batch API: no engine batch id
        LakeSinkWriter.commit(self, messages, self._batch_id)

    def abort(self, messages) -> None:
        LakeSinkWriter.abort(self, messages, self._batch_id)


class LakeSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lake_sink"

    def schema(self) -> T.StructType:
        # write-only source; echo the input schema at plan time
        raise NotImplementedError(
            "lake_sink is write-only — use format('lake') to read"
        )

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> LakeSinkWriter:
        if overwrite:
            raise ValueError(
                "lake_sink appends MOR deltas; complete/overwrite output "
                "modes are not supported (use outputMode('append')/update)"
            )
        return LakeSinkWriter(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool) -> LakeSinkBatchWriter:
        if overwrite:
            raise ValueError(
                "lake_sink appends MOR deltas; use mode('append') "
                "(overwrite would clobber the snapshot chain)"
            )
        return LakeSinkBatchWriter(schema, dict(self.options))
