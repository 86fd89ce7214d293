"""LakeTable — snapshot-versioned, bucket-partitioned parquet lake table.

An Iceberg-shaped table format implemented on parquet + JSON manifests
(no Iceberg runtime jar is available offline — SURVEY.md §7.0 fallback).
It reproduces exactly the properties the engine relies on:

- **Atomic commits**: a commit = write data files + one ledger file, then
  atomically ``rename`` the next ``metadata/v{N}.json`` into place. Readers
  resolve the highest committed version; a crash mid-commit leaves only
  orphan data files (cleaned by ``expire_snapshots``), never a torn table.
  Reference analogue: BigQuery WRITE_TRUNCATE partition decorators as
  atomic partition replace (/root/reference/fintick/bqloader/base.py:79-112).
- **Idempotent re-apply**: each manifest records the set of applied batch
  ids; re-running a micro-batch after a crash is a structural no-op.
  Reference analogue: the Firestore ``ok``-flag guard
  (/root/reference/fintick/controllers/base.py:80-86).
- **Key-partitioned MERGE upsert**: rows live in ``n_buckets`` hash buckets
  of the merge key; a MERGE rewrites only the buckets its batch touches
  (manifest-driven file pruning — Iceberg partition pruning analogue).
- **Snapshot isolation + time travel**: every version is fully described by
  its manifest; ``read(version=...)`` reads history.
- **Per-partition lineage ledger committed atomically with data**: the
  ledger parquet for a batch is referenced by the same manifest rename that
  commits the data — exactly-once for both or neither (hard-part #2,
  SURVEY.md §7.3). Reference analogue: Firestore doc written after load
  (/root/reference/fintick/controllers/base.py:258-267) — NOT atomic there;
  atomic here.

Single-writer discipline (one streaming query owns the table) is assumed,
as with the reference's per-(symbol, partition) cloud functions.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import os
import re
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import LEDGER_SCHEMA, PAGES_INTERNAL_FIELDS
from .commit_backend import CommitBackend, resolve_backend
from ..operators.compaction import (
    ORDER_COLS,
    lww_compact,
    lww_pack_expr,
    lww_unpack,
)
from .schema_evolution import conform, resolve_schema
from .strstat import prefix_successor

_INTERNAL_COLS = [f.name for f in PAGES_INTERNAL_FIELDS]  # lsn, is_deleted

#: resolved file lists per committed (table_path, version) — version files
#: are immutable once CAS-committed, so this never invalidates; bounded LRU.
_FILES_CACHE: "dict[tuple[str, int], list[dict[str, Any]]]" = {}
_FILES_CACHE_MAX = 64

#: a delta chain longer than this is checkpointed with a full file list —
#: bounds manifest-resolution depth the same way Iceberg's manifest lists
#: bound metadata reads.
_DELTA_CHECKPOINT_DEPTH = 32


class CommitConflictError(RuntimeError):
    """Another writer committed this manifest version first (optimistic
    concurrency). The loser's data files are orphans (cleaned by
    ``expire_snapshots``); retrying the operation recomputes against the
    new current snapshot — safe for MERGE because LWW merges commute, so
    a re-applied batch converges to the same final state regardless of
    commit order (Iceberg's commit-retry model)."""


class ConstraintViolationError(RuntimeError):
    """A CHECK constraint failed — at :meth:`LakeTable.add_constraint`
    time (existing live rows violate the new expression) or at merge
    time under ``on_violation='fail'`` (a batch LWW winner violates).
    A failed batch is never marked applied and commits nothing, so a
    corrected feed can re-run the same batch id under exactly-once."""


#: sentinel embedded in the lazy per-row raise so the merge path can
#: re-surface a mid-job constraint failure as ConstraintViolationError
_VIOLATION_MARKER = "CONSTRAINT_VIOLATION"


def _coerce_initial_default(v, dtype: T.DataType):
    """Eagerly validate + canonicalize an add_column initial default
    against the declared type — a default that only failed (or silently
    nulled) at READ time would brick or corrupt every multi-epoch scan
    after a single bad DDL commit. Scalars onto atomic types only."""
    if not isinstance(v, (str, int, float, bool)):
        raise ValueError(
            f"initial default must be a plain scalar, got {type(v).__name__}"
        )
    try:
        if isinstance(dtype, T.DecimalType):
            import decimal

            # validate, but store the CANONICAL STRING: a float round-trip
            # silently loses precision for high-precision decimals and
            # corrupts integer defaults past 2^53 — the read path's
            # lit(<str>).cast(decimal) is exact
            try:
                d = decimal.Decimal(str(v))
            except decimal.InvalidOperation:
                raise ValueError(v) from None
            if not d.is_finite():
                raise ValueError(v)
            return str(d)
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            return float(v)
        if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            if isinstance(v, float) and v != int(v):
                raise ValueError(v)
            return int(v)
        if isinstance(dtype, T.StringType):
            return str(v)
        if isinstance(dtype, T.BooleanType):
            if isinstance(v, bool):
                return v
            if str(v).lower() in ("true", "false"):
                return str(v).lower() == "true"
            raise ValueError(v)
    except (TypeError, ValueError):
        raise ValueError(
            f"initial default {v!r} is not castable to {dtype.simpleString()}"
        ) from None
    raise ValueError(
        f"initial defaults are supported on atomic column types only, "
        f"not {dtype.simpleString()}"
    )


def _fmt_version(v: int) -> str:
    return f"v{v:08d}.json"


#: Estimated broadcast-hash-relation bytes per int64 key (key + hash-map
#: slot + object overhead, measured order-of-magnitude on the JVM).
_BYTES_PER_BROADCAST_KEY = 48

#: Default byte budget for the winner-lsn-set broadcast: 128 MB ⇒ ~2.8M
#: keys. Sized independently of spark.sql.autoBroadcastJoinThreshold
#: (that guards ROW-relation estimates and defaults to 10 MB, which
#: would cap at ~870k keys and push realistic micro-batches onto the
#: shuffle path — measured 2.7× slower end-to-end, because the payload
#: bytes then cross an exchange). 128 MB per executor is safe where a
#: 20M-key ≈ 1 GB relation (the old fixed cutoff) was the OOM risk the
#: round-1 review flagged.
_BROADCAST_KEY_BUDGET_CONF = "spark.cdc.broadcast.keyBudgetBytes"
_BROADCAST_KEY_BUDGET_DEFAULT = 128 * 1024 * 1024


def _parse_bytes(raw: str) -> int:
    """Parse a byte-size conf value: plain int or ``<int>[kmg][b]`` in any
    case (``128m``, ``128mb``, ``64KB``, ``1g`` …). Raises ValueError on
    malformed input so a typo'd conf surfaces instead of silently falling
    back to the default (round-2 review finding)."""
    m = re.fullmatch(r"\s*(\d+)\s*([kmg]?)b?\s*", raw.lower())
    if not m:
        raise ValueError(f"malformed byte size: {raw!r}")
    return int(m.group(1)) * (1 << {"": 0, "k": 10, "m": 20, "g": 30}[m.group(2)])


def _broadcast_key_budget(spark: SparkSession) -> int:
    """Max number of int64 keys worth broadcasting for the winner-set
    semi-join, from ``spark.cdc.broadcast.keyBudgetBytes`` (suffixes
    k/m/g with optional trailing b accepted)."""
    raw = str(
        spark.conf.get(_BROADCAST_KEY_BUDGET_CONF, str(_BROADCAST_KEY_BUDGET_DEFAULT))
    )
    nbytes = _parse_bytes(raw)
    if nbytes <= 0:
        nbytes = _BROADCAST_KEY_BUDGET_DEFAULT
    return nbytes // _BYTES_PER_BROADCAST_KEY


class LakeTable:
    """A bucket-partitioned upsert table with Iceberg-style snapshots."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        backend: "str | CommitBackend | None" = None,
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.meta_dir = os.path.join(self.path, "metadata")
        self.data_dir = os.path.join(self.path, "data")
        self.ledger_dir = os.path.join(self.path, "ledger")
        self._backend = resolve_backend(backend) if backend is not None else None

    @property
    def backend(self) -> CommitBackend:
        """The table's commit-atomicity primitive (see
        :mod:`.commit_backend`). Resolved, in order, from: an explicit
        constructor argument (tests inject hooked backends this way), the
        ``commit-backend.json`` marker persisted at create time, the
        ``SPARK_CDC_COMMIT_BACKEND`` env override, else local-FS."""
        if self._backend is None:
            name = None
            try:
                with open(os.path.join(self.meta_dir, "commit-backend.json")) as fh:
                    name = json.load(fh).get("backend")
            except (FileNotFoundError, json.JSONDecodeError):
                pass
            self._backend = resolve_backend(name)
        return self._backend

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key: str = "url",
        n_buckets: int = 16,
        if_not_exists: bool = False,
        write_mode: str = "cow",
        backend: "str | CommitBackend | None" = None,
    ) -> "LakeTable":
        """``write_mode``:

        - ``"cow"`` (copy-on-write): a MERGE rewrites every touched bucket
          in full — reads stay a plain pruned scan, but per-batch write
          cost is O(live rows in touched buckets). Right for large batches
          over few buckets (backfill replay).
        - ``"mor"`` (merge-on-read): a MERGE appends only the batch's LWW
          winners as per-bucket *delta* files — per-batch write cost is
          O(batch), and reads fold base+delta with the same LWW rule until
          :meth:`minor_compact` folds deltas back into the base (the
          Iceberg merge-on-read + minor-compaction shape). Right for
          frequent micro-batches over a large key space, where CoW's
          rewrite amplification is the scale-killer.
        """
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be cow|mor, got {write_mode!r}")
        t = cls(spark, path, backend=backend)
        if os.path.exists(t.meta_dir) and os.listdir(t.meta_dir):
            if if_not_exists:
                return t
            raise FileExistsError(f"table already exists at {path}")
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.ledger_dir, exist_ok=True)
        # persist the backend choice so every future opener (including a
        # concurrent one racing this create) commits through the same
        # primitive; put_if_absent so a racing creator can't flip it
        t.backend.put_if_absent(
            os.path.join(t.meta_dir, "commit-backend.json"),
            json.dumps(t.backend.describe()).encode(),
        )
        manifest = {
            "version": 0,
            "snapshot_id": str(uuid.uuid4()),
            "parent_version": None,
            "key": key,
            "n_buckets": n_buckets,
            "write_mode": write_mode,
            "schema": json.loads(schema.json()),
            "files": [],
            "ledger_files": [],
            "applied_batches": [],
            "watermarks": {},
            "summary": {"operation": "create", "total_rows": 0},
            "committed_at_unix": time.time(),
        }
        try:
            t._write_manifest(manifest)
        except CommitConflictError:
            if if_not_exists:  # concurrent create raced us — theirs wins
                return t
            raise
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        if t.current_version() is None:
            raise FileNotFoundError(f"no lake table at {path}")
        return t

    # ----------------------------------------------------------- manifests

    def current_version(self) -> int | None:
        if not os.path.isdir(self.meta_dir):
            return None
        # strict name match (like earliest_version): a stray
        # "v5 copy.json" debugging artifact must not brick every
        # operation with a ValueError from int()
        versions = [
            int(m.group(1))
            for f in os.listdir(self.meta_dir)
            if (m := re.fullmatch(r"v(\d+)\.json", f))
        ]
        return max(versions) if versions else None

    def earliest_version(self) -> int | None:
        """Oldest RETAINED version (``expire_snapshots`` advances it).
        Incremental consumers bootstrapping from here must check whether
        that snapshot is EMPTY — a non-empty earliest (post-expiry, or a
        clone's v0) means rows exist that no retained change feed covers,
        and the consumer needs a full-read seed instead."""
        if not os.path.isdir(self.meta_dir):
            return None
        versions = [
            int(m.group(1))
            for f in os.listdir(self.meta_dir)
            if (m := re.fullmatch(r"v(\d+)\.json", f))
        ]
        return min(versions) if versions else None

    def version_as_of(self, ts: "_dt.datetime | float") -> int:
        """Latest RETAINED version committed at or before ``ts`` (Iceberg
        ``timestamp_ms`` time travel analogue). ``ts`` is a datetime
        (naive = UTC, matching the manifest's unix commit stamps) or a
        unix-seconds float. O(retained versions) JSON reads, no Spark
        job. Raises if the table's earliest retained commit is younger
        than ``ts`` — ``expire_snapshots`` bounds how far back this sees,
        exactly like Iceberg."""
        if isinstance(ts, _dt.datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            cutoff = ts.timestamp()
        else:
            cutoff = float(ts)
        best = None
        for h in self.history():
            at = h.get("committed_at_unix")
            if at is not None and at <= cutoff:
                best = h["version"]  # history is oldest→newest
        if best is None:
            raise FileNotFoundError(
                f"no snapshot at or before {cutoff} is retained at {self.path}"
            )
        return best

    def read_as_of(self, ts: "_dt.datetime | float") -> DataFrame:
        """Timestamp time travel: :meth:`read` at :meth:`version_as_of`."""
        return self.read(version=self.version_as_of(ts))

    def resolve_anchor(self, version: "int | str") -> "int | str":
        """Immutable snapshot anchor for ``version``: follows tag /
        branch refs (whose heads can MOVE between two reads) down to a
        committed version int or a staged WAP token string — the one
        resolution order every ref consumer must share (``manifest``
        below, the ``lake`` format's per-query snapshot pin). Ints,
        staged tokens, and unknown names return unchanged (the caller's
        load raises for the last)."""
        seen: set[str] = set()
        v: int | str = version
        while isinstance(v, str) and v not in seen:
            seen.add(v)
            ref = self._load_ref(v, missing_ok=True)
            if ref is None:
                break  # staged token (immutable file) or unknown name
            if ref["type"] == "tag":
                v = ref["version"]
            else:
                v = ref["tokens"][-1] if ref["tokens"] else ref["base_version"]
        return v

    def manifest(self, version: int | str | None = None) -> dict[str, Any]:
        # a str version is a REF NAME (tag/branch — Iceberg named refs) or
        # a STAGED token (write-audit-publish). Refs resolve first: a tag
        # points at a committed version, a branch at its head snapshot
        # (last staged token, or its base version when freshly created).
        if isinstance(version, str):
            anchor = self.resolve_anchor(version)
            if isinstance(anchor, str):
                p = os.path.join(self.meta_dir, f"staged-{anchor}.json")
                if not os.path.exists(p):
                    raise FileNotFoundError(
                        f"no staged snapshot {anchor!r} at {self.path}"
                    )
                with open(p) as fh:
                    return self._resolve_files(json.load(fh))
            version = anchor
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no lake table at {self.path}")
        with open(os.path.join(self.meta_dir, _fmt_version(v))) as fh:
            return self._resolve_files(json.load(fh))

    def _resolve_files(self, m: dict[str, Any]) -> dict[str, Any]:
        """Materialize ``m["files"]`` from an incremental (delta) manifest.

        Commits whose file-set change is small relative to the table store
        only ``files_delta = {base, added, removed, depth}`` — per-commit
        metadata is then O(touched files), not O(table files) (the
        Iceberg manifest-list property; at 10^5 files and hourly commits
        this is KBs per commit instead of tens of MBs). Resolution walks
        the base chain (bounded by ``_DELTA_CHECKPOINT_DEPTH``) through a
        process-wide cache of immutable committed versions."""
        if "files" in m:
            return m
        d = m["files_delta"]
        # key carries the base version file's identity (mtime_ns, size) so
        # a table recreated at the same path, or a manifest materialized
        # in place by expire_snapshots, never hits a stale entry
        st = os.stat(os.path.join(self.meta_dir, _fmt_version(int(d["base"]))))
        ck = (self.path, int(d["base"]), st.st_mtime_ns, st.st_size)
        base = _FILES_CACHE.get(ck)
        if base is None:
            base = self.manifest(d["base"])["files"]
            if len(_FILES_CACHE) >= _FILES_CACHE_MAX:
                _FILES_CACHE.pop(next(iter(_FILES_CACHE)))
            _FILES_CACHE[ck] = base
        removed = set(d["removed"])
        m["files"] = [f for f in base if f["path"] not in removed] + d["added"]
        return m

    def _deltify(self, nm: dict[str, Any]) -> dict[str, Any]:
        """Choose the on-disk representation for a commit's file list:
        an incremental delta against the parent when that is smaller,
        else (create, big rewrites, every ``_DELTA_CHECKPOINT_DEPTH``-th
        link) the full list. Returns a write-copy; ``nm`` keeps its
        resolved ``files`` for the caller."""
        pv = nm.get("parent_version")
        if pv is None or "files" not in nm:
            w = dict(nm)
            w.pop("files_delta", None)  # stale key from a dict(m) writer
            return w
        try:
            pm = self.manifest(pv)
        except FileNotFoundError:
            w = dict(nm)
            w.pop("files_delta", None)
            return w
        depth = int((pm.get("files_delta") or {}).get("depth", 0)) + 1
        if depth >= _DELTA_CHECKPOINT_DEPTH:
            w = dict(nm)
            w.pop("files_delta", None)
            return w
        base_by_path = {f["path"]: f for f in pm["files"]}
        new_files = nm["files"]
        new_paths = {f["path"] for f in new_files}
        added = [f for f in new_files if base_by_path.get(f["path"]) != f]
        removed = [p for p in base_by_path if p not in new_paths] + [
            f["path"] for f in added if f["path"] in base_by_path
        ]
        if len(added) + len(removed) >= max(1, len(new_files)):
            w = dict(nm)
            w.pop("files_delta", None)
            return w
        w = dict(nm)
        w.pop("files")
        w["files_delta"] = {
            "base": pv,
            "added": added,
            "removed": removed,
            "depth": depth,
        }
        return w

    def _write_manifest(self, manifest: dict[str, Any]) -> None:
        """Atomic commit point with optimistic-concurrency CAS: the
        version file is published through the table's
        :class:`CommitBackend` ``put_if_absent`` (local FS: hardlink CAS;
        object store: conditional PUT ``If-None-Match: *``), so if
        another writer already committed this version number the publish
        loses and a :class:`CommitConflictError` surfaces instead of the
        silent last-writer-clobber a plain overwrite would allow."""
        payload = json.dumps(self._deltify(manifest)).encode()
        final = os.path.join(self.meta_dir, _fmt_version(manifest["version"]))
        if not self.backend.put_if_absent(final, payload):
            raise CommitConflictError(
                f"version {manifest['version']} already committed at "
                f"{self.path} by a concurrent writer"
            )

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.manifest()["schema"])

    @property
    def key(self) -> str:
        return self.manifest()["key"]

    @property
    def n_buckets(self) -> int:
        return self.manifest()["n_buckets"]

    @property
    def write_mode(self) -> str:
        return self.manifest().get("write_mode", "cow")

    def applied_batches(self) -> set:
        return set(self.manifest()["applied_batches"])

    def watermarks(self) -> dict[str, int]:
        return dict(self.manifest()["watermarks"])

    # --------------------------------------------------------------- reads

    def _physical_schema(self, manifest: dict[str, Any]) -> T.StructType:
        base = T.StructType.fromJson(manifest["schema"])
        names = {f.name for f in base.fields}
        extra = [f for f in PAGES_INTERNAL_FIELDS if f.name not in names]
        return T.StructType(list(base.fields) + extra)

    # ---------------------------------------- field-id schema evolution

    def _ensure_field_ids(self, m: dict[str, Any]) -> None:
        """Materialize field-id tracking on a manifest (in place).

        Lazy materialization is safe: before the first rename/drop every
        data file was written under the CURRENT names, so one epoch-0
        mapping of the current schema covers all existing files (column
        *adds* are name-stable — a file older than an added column simply
        lacks the physical column and reads as null, epoch or not).
        """
        if "field_ids" in m:
            return
        names = [f["name"] for f in m["schema"]["fields"]]
        m["field_ids"] = {n: i + 1 for i, n in enumerate(names)}
        m["next_field_id"] = len(names) + 1
        m["schema_epochs"] = [{str(i + 1): n for i, n in enumerate(names)}]

    def _current_epoch(self, m: dict[str, Any]) -> int:
        eps = m.get("schema_epochs")
        return len(eps) - 1 if eps else 0

    @staticmethod
    def _file_epoch(f: dict[str, Any]) -> int:
        return int(f.get("epoch", 0))

    def _name_at_epoch(self, m: dict[str, Any], f: dict[str, Any], col: str) -> str | None:
        """Physical column name of CURRENT column ``col`` inside file
        ``f``, resolved by field id through the file's write-time schema
        epoch; ``None`` if the column did not exist then. Untracked
        columns (internal lineage, ``__key_hash__``) are name-stable."""
        eps = m.get("schema_epochs")
        if not eps:
            return col
        fid = (m.get("field_ids") or {}).get(col)
        if fid is None:
            return col
        e = min(self._file_epoch(f), len(eps) - 1)
        return eps[e].get(str(fid))

    def _file_stat(self, m: dict[str, Any], f: dict[str, Any], col: str):
        """Manifest min/max stats for current column ``col`` in file
        ``f`` — stats were captured under the file's write-time names, so
        look them up via the field-id epoch mapping."""
        name = self._name_at_epoch(m, f, col)
        return (f.get("stats") or {}).get(name) if name is not None else None

    def _read_raw(self, m: dict[str, Any], files: list[dict[str, Any]]) -> DataFrame:
        """Physical read of manifest file entries → DataFrame with CURRENT
        column names, resolving renamed/dropped/re-added columns by FIELD
        ID per file epoch (the Iceberg name-mapping read path; reference
        analogue: static schema splicing between table generations,
        /root/reference/fintick/bqloader/schema.py:23-47).

        Single-epoch snapshots — the overwhelmingly common case — take the
        direct one-scan path: the plan is identical to a plain schema'd
        parquet read (no projection node, no union). Multi-epoch
        snapshots read one column-pruned scan PER DISTINCT EPOCH (a
        handful at most — epochs are DDL events, not writes) and union;
        filter/column pushdown passes through the per-epoch alias
        projections, so at 100 TB the cost over a plain read is one extra
        scan-node per rename/drop generation, not a data rewrite."""
        schema = self._physical_schema(m)
        if not files:
            return self.spark.createDataFrame([], schema)
        eps = m.get("schema_epochs")
        cur = self._current_epoch(m)
        groups: dict[int, list[dict[str, Any]]] = {}
        for f in files:
            groups.setdefault(min(self._file_epoch(f), cur), []).append(f)
        if eps is None or set(groups) == {cur}:
            paths = [os.path.join(self.path, f["path"]) for f in files]
            # explicit schema => old files read with added-cols-as-null and
            # widened numeric types (schema evolution without history rewrite)
            return self.spark.read.schema(schema).parquet(*paths)
        fids = m["field_ids"]
        defaults = m.get("column_defaults") or {}
        parts = []
        for e, grp in sorted(groups.items()):
            emap = eps[e]  # str(field id) -> name at that epoch
            read_fields: list[T.StructField] = []
            sel = []
            for fld in schema.fields:
                fid = fids.get(fld.name)
                old = emap.get(str(fid)) if fid is not None else fld.name
                if old is None:  # column added after this epoch — fill
                    # with the initial default (Iceberg v3) when declared
                    sel.append(
                        F.lit(defaults.get(fld.name)).cast(fld.dataType)
                        .alias(fld.name)
                    )
                else:
                    read_fields.append(T.StructField(old, fld.dataType, True))
                    sel.append(F.col(old).alias(fld.name))
            paths = [os.path.join(self.path, f["path"]) for f in grp]
            parts.append(
                self.spark.read.schema(T.StructType(read_fields))
                .parquet(*paths)
                .select(*sel)
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read_physical(
        self,
        buckets: list[int] | None = None,
        version: int | str | None = None,
        fold: bool = True,
        files: list[dict[str, Any]] | None = None,
    ) -> DataFrame:
        """Read physical rows (incl. tombstones + lineage cols), pruning
        data files to the requested buckets via the manifest — the
        Iceberg-style partition pruning this format exists to provide.

        ``buckets`` are CURRENT-spec bucket ids; files written under an
        older spec are included whenever their own bucket class could
        intersect (exact for multiple/divisor spec pairs, conservative
        otherwise — see :meth:`evolve_bucket_spec`). ``files`` bypasses
        bucket pruning with an explicit manifest-entry list (internal
        callers that already computed an exact per-spec prune).

        In merge-on-read mode, ``fold=True`` (default) applies the LWW
        rule across base+delta rows so callers see one row per key — the
        same two-phase ``max_by`` hash aggregate the merge itself uses
        (map-side partial agg; shuffle = O(distinct keys per split)). A
        snapshot with no delta files folds for free (no-op branch).
        ``fold=False`` exposes raw versions (compaction internals)."""
        m = self.manifest(version)
        if files is None:
            files = m["files"]
            if buckets is not None:
                bset = set(buckets)
                cur_nb = self._specs(m)[self._current_spec(m)]
                files = [
                    f for f in files
                    if self._file_overlaps_buckets(m, f, cur_nb, bset)
                ]
        df = self._read_raw(m, files)
        if fold and any(f.get("delta") for f in files):
            df = lww_compact(df, key=m["key"], order_cols=ORDER_COLS)
        return df

    def read(self, version: int | str | None = None) -> DataFrame:
        """Logical read: tombstones filtered, internal columns hidden."""
        m = self.manifest(version)
        df = self.read_physical(version=version)
        public = [f.name for f in T.StructType.fromJson(m["schema"]).fields
                  if f.name not in _INTERNAL_COLS]
        return df.where(~F.col("is_deleted")).select(*public)

    @staticmethod
    def _to_micros(ts: _dt.datetime) -> int:
        if ts.tzinfo is not None:
            ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return int((ts - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)

    def scan_file_plan(
        self,
        ts_from: _dt.datetime | None = None,
        ts_to: _dt.datetime | None = None,
        ts_col: str = "warc_ts",
        version: int | str | None = None,
    ) -> dict[str, Any]:
        """Plan a time-range scan against manifest column stats — zero
        file I/O (the stats were captured from the footers at write time).

        Pruning rules are correctness-driven by the LWW fold:

        - a bucket with NO delta files holds exactly one row per key (CoW
          rewrites are whole-bucket), so both range bounds prune files
          individually;
        - a bucket WITH delta files folds base+delta before the range
          filter, so a file may be pruned only when it provably contains
          neither in-range rows nor rows that could supersede them. Under
          (ts, lsn) rank ordering a row with ts < ts_from can never beat
          an in-range row, so ``ts_max < ts_from`` files prune safely —
          the tail-scan shape (the reference's 2-day hot window,
          /root/reference/fintick/constants.py:52) skips every settled
          delta at planning time. ``ts_to`` cannot prune MOR files: a
          LATER row must be seen to suppress the in-range version it
          superseded.

        Files without recorded stats (pre-stats manifests) are always
        kept — pruning only ever skips provably-irrelevant files.
        """
        m = self.manifest(version)
        lo = self._to_micros(ts_from) if ts_from is not None else None
        hi = self._to_micros(ts_to) if ts_to is not None else None

        def bounds(f: dict[str, Any]):
            st = self._file_stat(m, f, ts_col)
            return (st[0], st[1]) if st else (None, None)

        files = m["files"]
        specs = self._specs(m)
        deltas = [(specs[self._file_spec(f)], f["bucket"]) for f in files
                  if f.get("delta")]

        def _mor_affected(f: dict[str, Any]) -> bool:
            # spec-aware: a base file folds with any delta whose bucket
            # class could share keys with it (conservative across
            # incompatible specs — fold safety beats pruning)
            nb_f = specs[self._file_spec(f)]
            return any(
                self._buckets_intersect(nb_f, f["bucket"], nb_d, b_d)
                for nb_d, b_d in deltas
            )

        chosen = []
        for f in files:
            fmin, fmax = bounds(f)
            if deltas and _mor_affected(f):
                if lo is not None and fmax is not None and fmax < lo:
                    continue
            else:
                if lo is not None and fmax is not None and fmax < lo:
                    continue
                if hi is not None and fmin is not None and fmin >= hi:
                    continue
            chosen.append(f)
        return {
            "files": chosen,
            "n_candidates": len(files),
            "n_chosen": len(chosen),
            "manifest": m,
        }

    def scan(
        self,
        ts_from: _dt.datetime | None = None,
        ts_to: _dt.datetime | None = None,
        ts_col: str = "warc_ts",
        version: int | str | None = None,
    ) -> DataFrame:
        """Logical read restricted to ``ts_from <= ts_col < ts_to``, with
        planning-time file pruning from manifest stats (see
        :meth:`scan_file_plan`). Semantically identical to
        ``read(version).where(range)`` — the residual predicate still
        applies (and pushes down to row-group skipping inside the chosen
        files); the stats only decide which files never get scheduled."""
        plan = self.scan_file_plan(ts_from, ts_to, ts_col=ts_col, version=version)
        m = plan["manifest"]
        schema = self._physical_schema(m)
        public = [
            f.name
            for f in T.StructType.fromJson(m["schema"]).fields
            if f.name not in _INTERNAL_COLS
        ]
        if not plan["files"]:
            return self.spark.createDataFrame(
                [], T.StructType([f for f in schema.fields if f.name in set(public)])
            ).select(*public)
        df = self._read_raw(m, plan["files"])
        if any(f.get("delta") for f in plan["files"]):
            df = lww_compact(df, key=m["key"], order_cols=ORDER_COLS)
        pred = ~F.col("is_deleted")
        if ts_from is not None:
            pred = pred & (F.col(ts_col) >= F.lit(ts_from))
        if ts_to is not None:
            pred = pred & (F.col(ts_col) < F.lit(ts_to))
        return df.where(pred).select(*public)

    def ledger(self) -> DataFrame:
        files = self.manifest()["ledger_files"]
        if not files:
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(
            *[os.path.join(self.path, p) for p in files]
        )

    def bucket_expr(self, col: str | None = None) -> F.Column:
        return F.pmod(F.xxhash64(F.col(col or self.key)), F.lit(self.n_buckets)).cast("int")

    # --------------------------------------------------------------- MERGE

    def merge_apply(
        self,
        changes: DataFrame,
        batch_id: int,
        enrich=None,
        publish: bool = True,
        branch: str | None = None,
        on_violation: str = "fail",
    ) -> dict[str, Any]:
        """Apply one micro-batch of change events as a key-partitioned MERGE.

        Logical plan (all Catalyst built-ins):
          1. skip if ``batch_id`` already applied (exactly-once guard);
          2. LWW-compact the batch per key — two-phase ``max_by`` groupBy
             (map-side partial agg ⇒ hot keys reduced before shuffle);
             then apply ``enrich`` (e.g. the vectorized extraction UDF) to
             the *winners only* — superseded events never pay the UDF;
          3. resolve additive schema evolution vs the table schema;
          4. prune to affected buckets (manifest file skipping);
          5. union current bucket rows + batch winners, LWW again ⇒ merged
             state. Deletes become tombstones, so replay order and batch
             boundaries cannot change the final state (MERGE idempotence);
          6. rewrite only affected buckets + ledger rows, commit atomically.

        ``enrich`` must be a pure per-row transform (a projection adding
        derived columns) — purity is what makes post-compaction placement
        equivalent to pre-compaction and the output replay-stable.

        ``branch`` merges against that branch's HEAD snapshot instead of
        the committed table and lands the result as the branch's next
        staged snapshot (never touching main) — Iceberg branch writes,
        generalizing write-audit-publish from one staged snapshot to a
        chain. The exactly-once guard is per-branch (the head manifest's
        ``applied_batches``); :meth:`fast_forward` later publishes the
        whole chain onto main atomically-per-snapshot. Single writer per
        branch is assumed (same discipline as the table itself).

        ``on_violation`` picks the CHECK-constraint policy when the table
        carries constraints (:meth:`add_constraint`): ``"fail"`` (default
        — any violating batch winner aborts the merge with
        :class:`ConstraintViolationError`, nothing commits), ``"quarantine"``
        (violating winners divert to ``quarantine/batch-<id>`` parquet with
        the violated constraint names; the clean rest applies), or
        ``"drop"`` (violators silently filtered). See
        :meth:`_constraint_gate` for cost and exactness notes.
        """
        base_ref: int | str | None = None
        if branch is not None:
            ref = self._load_ref(branch)
            if ref["type"] != "branch":
                raise ValueError(f"ref {branch!r} is a tag, not a branch")
            base_ref = ref["tokens"][-1] if ref["tokens"] else ref["base_version"]
            publish = False
        m = self.manifest(base_ref)
        if batch_id in set(m["applied_batches"]):
            return {"skipped": True, "batch_id": batch_id}

        key = m["key"]
        n_buckets = m["n_buckets"]

        # opt-in phase timing (SPARK_CDC_TIMING=1): phases land in the
        # returned summary as {"timing": {phase: sec}}
        _timing: dict[str, float] = {}
        _t0 = [time.time()]

        def _mark(phase: str) -> None:
            now = time.time()
            _timing[phase] = round(now - _t0[0], 3)
            _t0[0] = now

        # -- JOB 1a (narrow, per-key): one column-pruned pass computes the
        # batch-local LWW winner per key. Page payloads (html/text — the
        # wide bytes) never enter this shuffle: the winner of each key is
        # decided on a single packed decimal rank (see lww_winner_keys) —
        # a pure two-phase HashAggregate, ~24 B/key shuffled, hot keys
        # collapsed map-side. NOTE no collect_set here: an object-typed
        # aggregate would force ObjectHashAggregate, whose sort-based
        # fallback (128-group threshold) sorts the whole input once the
        # millions of key groups appear. Affected buckets come from a
        # distinct over the CACHED winner rows (no rescan, ≤ n_buckets
        # result rows).
        #
        # -- JOB 1b (narrow, per-partition): high-watermarks + batch size
        # from a scan of ONLY (partition, lsn) — two int64 columns, no
        # key string. Splitting 1a/1b beats the previous single
        # GROUPING SETS pass (measured 3.34 s vs 4.61 s warm at 20M
        # events): grouping sets Expand doubles the agg input AND drags
        # the key string through the partition arrangement, while 1b's
        # column-pruned scan is nearly free next to 1a.
        ka = (
            changes.groupBy(key)
            .agg(F.max(lww_pack_expr()).alias("_p"))
            .cache()
        )
        try:
            part_rows = (
                changes.groupBy("partition")
                .agg(
                    F.max("lsn").alias("max_lsn"),
                    F.count(F.lit(1)).alias("n_events"),
                )
                .collect()
            )
            n_events = sum(int(r["n_events"]) for r in part_rows)
            # Affected buckets under EVERY live spec (exact cross-spec file
            # pruning: the batch's keys are hashed under each spec a live
            # file was written with, so a key's old-spec file is always
            # found and never guessed at). Single-spec tables — the common
            # case — keep the original one-column distinct.
            specs = self._specs(m)
            cur_spec = self._current_spec(m)
            live_specs = sorted({self._file_spec(f) for f in m["files"]} | {cur_spec})
            if len(live_specs) == 1:
                s0 = live_specs[0]
                affected_rows = [
                    (s0, int(r["b"]))
                    for r in ka.select(self._bucket(key, specs[s0]).alias("b"))
                    .distinct()
                    .collect()
                ]
            else:
                sb = F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(s).alias("s"),
                            self._bucket(key, specs[s]).alias("b"),
                        )
                        for s in live_specs
                    ])
                ).alias("sb")
                affected_rows = [
                    (int(r["s"]), int(r["b"]))
                    for r in ka.select(sb).select("sb.s", "sb.b").distinct().collect()
                ]
            affected_map: dict[int, set[int]] = {}
            for s, b in affected_rows:
                affected_map.setdefault(s, set()).add(b)
            _mark("narrow_aggs")

            # Upsert metrics come from the same narrow world: winners joined
            # against the column-pruned live-key scan of the affected buckets.
            # Bootstrap batches (affected buckets hold no files at all — the
            # backfill-replay shape) skip the join: the live side is empty by
            # construction, so every non-delete winner is an insert. Measured
            # ~1.0 s of a 10.5 s 20M-event replay.
            wk = lww_unpack(ka, key=key)
            touched_files = [
                f for f in m["files"]
                if f["bucket"] in affected_map.get(self._file_spec(f), ())
            ]
            bootstrap = not touched_files
            is_del = F.col("op") == "D"
            if bootstrap:
                winners_only = wk.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(~is_del, 1).otherwise(0)).alias("ins"),
                    F.sum(F.when(is_del, 1).otherwise(0)).alias("dele"),
                ).collect()[0]
                stats = {
                    "n": winners_only["n"],
                    "ins": winners_only["ins"],
                    "upd": 0,
                    "dele": winners_only["dele"],
                }
            else:
                cur_live = (
                    self.read_physical(files=touched_files, version=base_ref)
                    .where(~F.col("is_deleted"))
                    .select(key)
                )
                stats = (
                    wk.join(cur_live.withColumn("_m", F.lit(1)), on=key, how="left")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(F.when(~is_del & F.col("_m").isNull(), 1).otherwise(0)).alias("ins"),
                        F.sum(F.when(~is_del & F.col("_m").isNotNull(), 1).otherwise(0)).alias("upd"),
                        F.sum(F.when(is_del, 1).otherwise(0)).alias("dele"),
                    )
                    .collect()[0]
                )
            _mark("upsert_stats")

            # -- 3. winner payload fetch: broadcast the winning lsn set and
            # semi-join it against the raw batch — a map-side hash probe, so
            # payload bytes move at most once (scan → write), never through an
            # exchange. lsn is the envelope's unique event id; duplicate
            # deliveries of the same lsn survive the semi-join but collapse in
            # the final per-key window. The broadcast is explicit (the hint
            # bypasses autoBroadcastJoinThreshold), so the cutoff is sized from
            # the session's broadcast budget — ~48 B per long key in a
            # LongHashedRelation — instead of a fixed row count; above it the
            # plan falls back to a shuffle join (huge micro-batch).
            lsn_set = wk.select("lsn")
            if int(stats["n"]) <= _broadcast_key_budget(self.spark):
                winners = changes.join(F.broadcast(lsn_set), "lsn", "left_semi")
            else:  # pragma: no cover - cluster-scale escape hatch
                winners = changes.join(lsn_set, "lsn", "left_semi")

            # Bootstrap (backfill) fast path: when the affected buckets hold no
            # current rows, every post-merge survivor IS a batch winner, so the
            # (pure, per-row) enrich can run AFTER the bucket exchange, on
            # exactly the rows being written — the derived bytes (extracted
            # text: measured 45% of the html+text payload on the bench corpus)
            # then never cross the exchange. On tmpfs shuffle the end-to-end
            # effect is within host noise (the one full payload scan dominates
            # memory traffic); on a real cluster the exchange is the NETWORK
            # hop, where 45% fewer bytes is the point. Incremental batches
            # keep the pre-exchange placement: post-window rows coming from
            # current state would re-pay the UDF (Arrow evaluates a UDF for
            # every row in its node — a null-gate cannot skip them), and
            # current >> batch in steady state. A deferred enrich sees
            # conformed physical rows (payload + lsn/is_deleted), not the
            # op/partition envelope — fine for any pure payload projection,
            # which is what the enrich contract requires.
            # SPARK_CDC_DEFER_ENRICH=0 restores pre-exchange placement (A/B).
            mode = m.get("write_mode", "cow")
            defer_enrich = (
                enrich is not None
                and bootstrap
                and mode != "mor"
                and os.environ.get("SPARK_CDC_DEFER_ENRICH", "1") != "0"
            )
            if enrich is not None:
                enriched = enrich(winners)
                if not defer_enrich:
                    winners = enriched
            else:
                enriched = winners

            # -- 4. schema evolution: batch payload columns vs table schema
            # (resolved against the ENRICHED schema even when the enrich
            # computation itself is deferred past the exchange)
            table_schema = T.StructType.fromJson(m["schema"])
            payload = T.StructType(
                [f for f in enriched.schema.fields if f.name not in ("op", "partition")]
            )  # lsn is both envelope and lineage; exclude op/partition only
            bad_payload = {f.name for f in payload.fields} & {"bucket", "__key_hash__"}
            if bad_payload:
                raise ValueError(
                    f"batch payload column(s) {sorted(bad_payload)} collide with "
                    "the write-path namespace (bucket exchange / z-order hash) — "
                    "rename them upstream"
                )
            res = resolve_schema(table_schema, payload)
            new_schema = res.schema

            # field-id bookkeeping (present once rename/drop has ever run on
            # this table): added columns get fresh ids and open a new schema
            # epoch, so files written before the add are never confused with
            # a later re-add of the same name after a drop. Renames/drops
            # themselves are DDL-only (rename_column / drop_column).
            fid_state: dict[str, Any] = {}
            new_epoch = 0
            if m.get("field_ids"):
                fids = dict(m["field_ids"])
                nxt = int(m["next_field_id"])
                eps = [dict(e) for e in m["schema_epochs"]]
                added = [c.column for c in res.changes if c.kind == "add"]
                if added:
                    for c in added:
                        fids[c] = nxt
                        nxt += 1
                    eps.append({str(i): n for n, i in fids.items()})
                fid_state = {
                    "field_ids": fids,
                    "next_field_id": nxt,
                    "schema_epochs": eps,
                }
                new_epoch = len(eps) - 1

            phys_schema = T.StructType(
                [f for f in new_schema.fields if f.name not in _INTERNAL_COLS]
            )
            phys_plus = T.StructType(
                list(phys_schema.fields)
                + [T.StructField("lsn", T.LongType(), False),
                   T.StructField("is_deleted", T.BooleanType(), False)]
            )
            incoming = conform(
                winners.withColumn("is_deleted", F.col("op") == F.lit("D")), phys_plus
            )
            gate_info: dict[str, Any] = {}
            if m.get("constraints") and not defer_enrich:
                # CHECK constraints judge the batch's conformed winners (post-
                # enrich values) and must never re-judge surviving CURRENT
                # rows. With deferred enrich the gate moves past the exchange
                # (below) — the bootstrap invariant guarantees the post-merge
                # frame holds ONLY batch winners there.
                incoming = self._constraint_gate(
                    incoming, m["constraints"], on_violation, batch_id, key, gate_info
                )
            phys_cols = [f.name for f in phys_plus.fields]
            snap = str(uuid.uuid4())[:8]

            if mode == "mor":
                # -- 5+6 (merge-on-read): append ONLY the batch winners as
                # per-bucket delta files — written bytes are O(batch), never
                # O(live table). No union with current state, no window: the
                # LWW fold is deferred to read_physical(fold=True) and undone
                # periodically by minor_compact. dropDuplicates(key) collapses
                # duplicate deliveries of the winning lsn (byte-identical
                # envelope rows, so the survivor is value-deterministic).
                merged = (
                    incoming.dropDuplicates([key])
                    .withColumn("bucket", self._bucket(key, n_buckets))
                    .select(*phys_cols, "bucket")
                )
                rel_out = f"data/delta-{snap}"
                keep = list(m["files"])  # nothing superseded by an append
            else:
                current = conform(
                    self.read_physical(files=touched_files, fold=False, version=base_ref),
                    phys_plus,
                )
                # -- 5+6 (copy-on-write): single bucket-aligned MERGE shuffle +
                # write. The union of (current bucket rows ∪ batch winners) is
                # shuffled ONCE, keyed by bucket; within each bucket partition
                # rows sort by (key, warc_ts desc, lsn desc) and a lag()
                # run-boundary filter keeps exactly the first row per key —
                # LWW by sort order. Because the shuffle key IS the storage
                # bucket, the dynamic-partition write needs no second
                # repartition: each task writes only its own bucket files.
                # Parallelism of this stage = n_buckets — size n_buckets to ≥
                # the cluster's cores (the north_rule's table-layout knob).
                u = current.unionByName(incoming).withColumn(
                    "bucket", self._bucket(key, n_buckets)
                )
                wspec = Window.partitionBy("bucket").orderBy(
                    F.col(key).asc(),
                    *[F.col(c).desc() for c in ORDER_COLS],
                )
                prev_key = F.lag(F.col(key)).over(wspec)
                merged = u.withColumn("_pk", prev_key).where(
                    F.col("_pk").isNull() | (F.col("_pk") != F.col(key))
                )
                if defer_enrich:
                    merged = enrich(merged)
                    if m.get("constraints"):
                        # bootstrap invariant: the touched buckets held no
                        # current rows, so every post-merge survivor IS a
                        # batch winner — gating here judges exactly the rows
                        # being written, with post-enrich values, while the
                        # fast path keeps its "derived bytes never cross the
                        # exchange" property.
                        merged = self._constraint_gate(
                            merged, m["constraints"], on_violation, batch_id,
                            key, gate_info,
                        )
                merged = merged.select(*phys_cols, "bucket")
                rel_out = f"data/snap-{snap}"
                touched_paths = {f["path"] for f in touched_files}
                keep = [f for f in m["files"] if f["path"] not in touched_paths]

            out_dir = os.path.join(self.path, rel_out)
            try:
                merged.write.partitionBy("bucket").mode("overwrite").parquet(out_dir)
            except Exception as e:
                ka.unpersist()
                if _VIOLATION_MARKER in str(e):
                    # the on_violation='fail' lazy per-row raise fired inside
                    # the write job: surface it typed. Nothing committed; the
                    # partial out_dir is an orphan (remove_orphans sweeps it).
                    line = next(
                        (ln for ln in str(e).splitlines() if _VIOLATION_MARKER in ln),
                        str(e)[:500],
                    )
                    raise ConstraintViolationError(
                        f"batch {batch_id} violates a CHECK constraint; merge "
                        f"aborted, table unchanged. {line.strip()}"
                    ) from None
                raise
        except Exception:
            # any failure between the cache and the merge write —
            # schema-evolution rejection, constraint-gate errors, the
            # eager quarantine write, a bad on_violation — must not
            # leak the cached winners frame: a streaming retry loop
            # re-attempting the failing batch would pin one cached
            # RDD per attempt. (unpersist is idempotent; the write's
            # violation remap below releases it on its own path too.)
            ka.unpersist()
            raise
        _mark("merge_write")
        ka.unpersist()
        new_files = self._scan_files(
            rel_out, delta=(mode == "mor"), stat_cols="*", trunc_except=(key,),
            spec=cur_spec, epoch=new_epoch,
        )
        _mark("scan_files")

        # ledger parquet for this batch (same commit scope)
        rel_ledger = f"ledger/batch-{batch_id}-{snap}.parquet"
        wm = dict(m["watermarks"])
        ledger_rows = []
        now = time.time()
        for r in part_rows:
            p = int(r["partition"])
            if p >= 0:  # negative = maintenance lineage (delete_where /
                # update_where): ledger row yes, feed watermark no — a
                # one-shot synthetic partition must not cap the min-over-
                # partitions applied-LSN watermark forever
                wm[str(p)] = max(int(r["max_lsn"]), wm.get(str(p), -1))
            ledger_rows.append(
                {
                    "partition": p,
                    "batch_id": int(batch_id),
                    "max_lsn": int(r["max_lsn"]),
                    "n_events": int(r["n_events"]),
                    "n_insert": int(stats["ins"] or 0),
                    "n_update": int(stats["upd"] or 0),
                    "n_delete": int(stats["dele"] or 0),
                    "n_dedup": int(n_events - stats["n"]),
                    "ok": True,
                    "committed_at": _dt.datetime.fromtimestamp(now, tz=_dt.timezone.utc),
                }
            )
        # ledger rows are METADATA (≤ n_partitions rows) — written
        # driver-side with pyarrow like the manifest itself; a Spark job
        # for 8 rows costs ~0.5-3 s of pure scheduling latency per batch.
        self._write_ledger_file(ledger_rows, rel_ledger)
        _mark("ledger_write")

        new_manifest = {
            "version": m["version"] + 1,
            "snapshot_id": str(uuid.uuid4()),
            "parent_version": m["version"],
            "key": key,
            "n_buckets": n_buckets,
            "write_mode": mode,
            "schema": json.loads(new_schema.json()),
            **fid_state,
            "files": keep + new_files,
            **(
                {"bucket_specs": m["bucket_specs"], "current_spec": cur_spec}
                if m.get("bucket_specs") else {}
            ),
            "ledger_files": m["ledger_files"] + [rel_ledger],
            "applied_batches": m["applied_batches"] + [batch_id],
            "watermarks": wm,
            "summary": {
                "operation": "merge",
                "batch_id": batch_id,
                "n_events": n_events,
                "n_insert": int(stats["ins"] or 0),
                "n_update": int(stats["upd"] or 0),
                "n_delete": int(stats["dele"] or 0),
                "n_dedup": int(n_events - stats["n"]),
                "schema_changes": [c.__dict__ for c in res.changes],
                **gate_info,
            },
            "committed_at_unix": now,
        }
        if m.get("constraints"):
            # CHECK constraints are table metadata — they outlive every
            # merge commit (same carry rule as column_defaults below)
            new_manifest["constraints"] = m["constraints"]
        if m.get("blooms"):
            # bloom side table carries forward: rewritten buckets' new
            # files simply have no bloom row until the next build_blooms
            new_manifest["blooms"] = m["blooms"]
        if m.get("column_defaults"):
            # initial defaults (add_column DDL) are table metadata — they
            # outlive every merge commit
            new_manifest["column_defaults"] = m["column_defaults"]
        if publish:
            self._write_manifest(new_manifest)
        else:
            # write-audit-publish: land the snapshot as a STAGED manifest —
            # data + ledger files exist, but the committed version chain is
            # untouched until publish(token) CAS-advances it. Readers of
            # the committed table never see staged rows; audits read them
            # via read(version=token).
            new_manifest["staged"] = {
                "token": snap,
                "rel_out": rel_out,
                "rel_ledger": rel_ledger,
            }
            self.backend.put(
                os.path.join(self.meta_dir, f"staged-{snap}.json"),
                json.dumps(new_manifest).encode(),
            )
            new_manifest["summary"]["staged_token"] = snap
            if branch is not None:
                ref = self._load_ref(branch)
                ref["tokens"].append(snap)
                ref["updated_at_unix"] = time.time()
                self._write_ref(ref)
                new_manifest["summary"]["branch"] = branch
        if os.environ.get("SPARK_CDC_TIMING"):
            new_manifest["summary"]["timing"] = _timing
        return new_manifest["summary"]

    # ------------------------------------------------- write-audit-publish

    def list_staged(self) -> list[str]:
        return sorted(
            f[len("staged-"):-5]
            for f in os.listdir(self.meta_dir)
            if f.startswith("staged-") and f.endswith(".json")
        )

    def publish(self, token: str) -> dict[str, Any]:
        """Commit a staged snapshot (the P of write-audit-publish).

        The staged manifest was computed against ``parent_version``; if
        any other commit advanced the table since staging, the staged
        file set is stale (it rewrote buckets from the old snapshot), so
        the publish fails with :class:`CommitConflictError` and the
        caller re-merges — identical semantics to losing the version CAS,
        which also backstops two concurrent publishers of the same
        version number."""
        sm = self.manifest(token)
        cur = self.current_version()
        staged_path = os.path.join(self.meta_dir, f"staged-{token}.json")
        if self._staged_is_published(sm):
            # crash window: a previous publish committed the manifest but
            # died before unlinking the staged file. The snapshot IS on
            # main — finish the cleanup and return idempotently instead
            # of raising a conflict that wedges fast_forward (whose
            # drop_ref advice would then discard_staged the COMMITTED
            # snapshot's data dir)
            os.unlink(staged_path)
            sm.pop("staged", None)
            return sm["summary"]
        if cur != sm["parent_version"]:
            raise CommitConflictError(
                f"staged snapshot {token} was computed against version "
                f"{sm['parent_version']} but the table is now at {cur}"
            )
        sm.pop("staged", None)
        self._write_manifest(sm)
        os.unlink(staged_path)
        return sm["summary"]

    def _staged_is_published(self, sm: dict[str, Any]) -> bool:
        """True when the staged manifest ``sm`` already landed on the
        committed chain — the crash window between ``_write_manifest``
        and the staged-file unlink in :meth:`publish`. Identity is the
        snapshot_id at the staged manifest's own version number (UUID:
        no other commit can carry it)."""
        try:
            committed = self.manifest(int(sm["version"]))
        except FileNotFoundError:
            return False
        return committed.get("snapshot_id") == sm.get("snapshot_id")

    def discard_staged(self, token: str) -> None:
        """Drop a staged snapshot that failed its audit: delete its data
        dir, ledger file, and staged manifest. The committed table was
        never touched, and the batch id was never recorded as applied —
        so a corrected batch can re-use the SAME batch id and the
        exactly-once guard still holds."""
        sm = self.manifest(token)
        st = sm.get("staged", {})
        escaped = self._staged_is_published(sm)
        if not escaped and st.get("rel_out"):
            # second line of defense, independent of version retention:
            # a dir the CURRENT committed snapshot reads was adopted by
            # main some other way (e.g. rollback() onto a branch head)
            prefix = st["rel_out"].rstrip("/") + "/"
            escaped = any(
                f["path"].startswith(prefix) for f in self.manifest()["files"]
            )
        if escaped:
            # the snapshot's bytes back a committed version (publish's
            # commit-then-unlink crash window, or a rollback adoption):
            # deleting them would corrupt the table — drop only the
            # leftover staged pointer
            os.unlink(os.path.join(self.meta_dir, f"staged-{token}.json"))
            return
        if st.get("rel_out"):
            shutil.rmtree(os.path.join(self.path, st["rel_out"]), ignore_errors=True)
        if st.get("rel_ledger"):
            try:
                os.unlink(os.path.join(self.path, st["rel_ledger"]))
            except FileNotFoundError:
                pass
        os.unlink(os.path.join(self.meta_dir, f"staged-{token}.json"))

    # ------------------------------------------------------- refs (tags/branches)
    #
    # Iceberg-style named refs over the snapshot chain. A TAG is an
    # immutable pointer to a committed version ("the snapshot the eval set
    # was built from") — expire_snapshots keeps tagged versions readable
    # until the tag is dropped. A BRANCH is a mutable head over a chain of
    # STAGED snapshots rooted at a committed base version: merge_apply(
    # branch=...) advances it without touching main, fast_forward()
    # publishes the chain onto main (the WAP machinery generalized from
    # one staged snapshot to many). The reference has no snapshot model at
    # all (BigQuery WRITE_TRUNCATE clobbers in place,
    # /root/reference/fintick/bqloader/base.py:79-112) — refs are part of
    # what the lake format adds over it.

    _REF_NAME = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}")

    def _ref_path(self, name: str) -> str:
        return os.path.join(self.meta_dir, f"ref-{name}.json")

    def _load_ref(self, name: str, missing_ok: bool = False) -> dict[str, Any] | None:
        try:
            with open(self._ref_path(name)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            if missing_ok:
                return None
            raise FileNotFoundError(f"no ref {name!r} at {self.path}") from None

    def _write_ref(self, ref: dict[str, Any], exclusive: bool = False) -> None:
        """Atomic ref write; ``exclusive`` uses the same create-exclusive
        :class:`CommitBackend` CAS as version commits, so two concurrent
        creators of the same ref name cannot silently clobber each other.
        Branch ADVANCES use plain atomic overwrite — single writer per
        branch is the documented discipline (same as the table's own
        single-streaming-writer assumption)."""
        payload = json.dumps(ref).encode()
        final = self._ref_path(ref["name"])
        if exclusive:
            if not self.backend.put_if_absent(final, payload):
                raise FileExistsError(
                    f"ref {ref['name']!r} already exists at {self.path}"
                )
        else:
            self.backend.put(final, payload)

    def _check_ref_name(self, name: str) -> None:
        if not self._REF_NAME.fullmatch(name):
            raise ValueError(
                f"invalid ref name {name!r} (want [A-Za-z0-9][A-Za-z0-9._-]*, ≤64 chars)"
            )

    def refs(self) -> dict[str, dict[str, Any]]:
        """All named refs: ``{name: {"type": "tag"|"branch", ...}}``."""
        out: dict[str, dict[str, Any]] = {}
        for f in os.listdir(self.meta_dir):
            if f.startswith("ref-") and f.endswith(".json"):
                with open(os.path.join(self.meta_dir, f)) as fh:
                    ref = json.load(fh)
                out[ref["name"]] = ref
        return out

    def create_tag(
        self, name: str, version: int | None = None, message: str | None = None
    ) -> dict[str, Any]:
        """Pin a committed snapshot under an immutable name. ``read(name)``
        / ``lookup(..., version=name)`` / ``rollback(name)`` resolve it;
        :meth:`expire_snapshots` retains the tagged version (manifest AND
        data files) until :meth:`drop_ref`."""
        self._check_ref_name(name)
        v = self.current_version() if version is None else int(version)
        self.manifest(v)  # raises if the target snapshot does not exist
        ref = {
            "name": name,
            "type": "tag",
            "version": v,
            "message": message,
            "created_at_unix": time.time(),
        }
        self._write_ref(ref, exclusive=True)
        return ref

    def create_branch(self, name: str, from_version: int | None = None) -> dict[str, Any]:
        """Open a mutable branch rooted at a committed version (default:
        current). Writes land via ``merge_apply(..., branch=name)``."""
        self._check_ref_name(name)
        v = self.current_version() if from_version is None else int(from_version)
        self.manifest(v)
        ref = {
            "name": name,
            "type": "branch",
            "base_version": v,
            "tokens": [],
            "created_at_unix": time.time(),
            "updated_at_unix": time.time(),
        }
        self._write_ref(ref, exclusive=True)
        return ref

    def drop_ref(self, name: str) -> None:
        """Delete a ref. Dropping a branch discards its staged snapshot
        chain (data + ledger + staged manifests) — main was never touched,
        so this is the branch-scoped ``discard_staged``. Dropping a tag
        releases the version for :meth:`expire_snapshots` but deletes
        nothing itself."""
        ref = self._load_ref(name)
        if ref["type"] == "branch":
            for tok in reversed(ref["tokens"]):
                try:
                    self.discard_staged(tok)
                except FileNotFoundError:  # already published/discarded
                    pass
        os.unlink(self._ref_path(name))

    def fast_forward(self, name: str) -> dict[str, Any]:
        """Publish a branch's staged chain onto main, oldest first, then
        drop the ref (Iceberg ``fast_forward`` analogue). Requires main to
        still be at the branch's base version — if any other commit
        advanced main, the first publish raises
        :class:`CommitConflictError` (the branch's rewrites are stale) and
        the branch is left intact for the caller to rebase or drop.
        Each snapshot in the chain publishes with the same CAS as any
        commit, so a crash mid-forward leaves a prefix published and the
        ref pointing at the unpublished suffix — re-running fast_forward
        resumes exactly where it stopped."""
        ref = self._load_ref(name)
        if ref["type"] != "branch":
            raise ValueError(f"ref {name!r} is a tag, not a branch")
        published = []
        while ref["tokens"]:
            tok = ref["tokens"][0]
            try:
                summary = self.publish(tok)  # CommitConflictError if main moved
            except FileNotFoundError:
                # crash between a previous publish and the ref advance:
                # the token is already on main — just advance the ref
                summary = {"already_published": True}
            published.append({"token": tok, "summary": summary})
            ref["tokens"] = ref["tokens"][1:]
            ref["base_version"] = self.current_version()
            self._write_ref(ref)
        os.unlink(self._ref_path(name))
        return {
            "operation": "fast_forward",
            "branch": name,
            "published": published,
            "head_version": self.current_version(),
        }

    def _write_ledger_file(self, rows: list[dict[str, Any]], rel_path: str) -> None:
        """Driver-side pyarrow write of the per-batch ledger parquet
        (schema mirrors LEDGER_SCHEMA so Spark's schema-enforced read
        sees identical types)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                pa.field("partition", pa.int32(), False),
                pa.field("batch_id", pa.int64(), False),
                pa.field("max_lsn", pa.int64(), False),
                pa.field("n_events", pa.int64(), False),
                pa.field("n_insert", pa.int64(), False),
                pa.field("n_update", pa.int64(), False),
                pa.field("n_delete", pa.int64(), False),
                pa.field("n_dedup", pa.int64(), False),
                pa.field("ok", pa.bool_(), False),
                pa.field("committed_at", pa.timestamp("us", tz="UTC"), False),
            ]
        )
        table = pa.Table.from_pylist(rows, schema=schema)
        out = os.path.join(self.path, rel_path)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        pq.write_table(table, out)

    def _bucket(self, key: str, n_buckets: int) -> F.Column:
        return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")

    # ---------------------------------------------- partition specs
    #
    # Lazy bucket-layout evolution (Iceberg partition evolution analogue):
    # the manifest carries an append-only ``bucket_specs`` map
    # {spec_id: n_buckets} plus ``current_spec``; every data file records
    # the spec it was written under (absent = spec 0). Writes always use
    # the current spec; old files migrate lazily — a CoW merge rewrites
    # every file it touches under the current spec, and a full rewrite op
    # (compact_files / rebucket / rewrite_clustered) finishes the
    # migration in one pass. ``n_buckets`` in the manifest is kept equal
    # to the CURRENT spec's count so all write paths stay unchanged.

    @staticmethod
    def _file_spec(f: dict[str, Any]) -> int:
        return int(f.get("spec", 0))

    @staticmethod
    def _specs(m: dict[str, Any]) -> dict[int, int]:
        raw = m.get("bucket_specs")
        if raw is None:
            return {0: int(m["n_buckets"])}
        return {int(k): int(v) for k, v in raw.items()}

    @staticmethod
    def _current_spec(m: dict[str, Any]) -> int:
        return int(m.get("current_spec", 0))

    @staticmethod
    def _buckets_intersect(nb_a: int, b_a: int, nb_b: int, b_b: int) -> bool:
        """Could bucket ``b_a`` (of an ``nb_a``-bucket spec) and bucket
        ``b_b`` (of ``nb_b``) share any key? Exact when one count divides
        the other (``pmod(h, q·n) % n == pmod(h, n)``), conservatively
        True for incompatible counts — pruning may only ever skip
        provably-disjoint files."""
        if nb_a == nb_b:
            return b_a == b_b
        if nb_b % nb_a == 0:  # a coarser: b's bucket refines a's
            return b_b % nb_a == b_a
        if nb_a % nb_b == 0:  # a finer
            return b_a % nb_b == b_b
        return True

    @classmethod
    def _changed_classes(
        cls, m_old: dict[str, Any], m_new: dict[str, Any]
    ) -> "set[tuple[int, int]]":
        """Bucket CLASSES ``(spec_n_buckets, bucket)`` whose file set
        differs between two adjacent manifests — the pure-metadata diff
        both the CDF kernel and the ``lake_cdf`` planner prune with
        (bare bucket ids are ambiguous across spec evolution)."""
        old_paths = {f["path"] for f in m_old["files"]}
        new_paths = {f["path"] for f in m_new["files"]}
        specs_old, specs_new = cls._specs(m_old), cls._specs(m_new)
        return (
            {(specs_old[cls._file_spec(f)], f["bucket"])
             for f in m_old["files"] if f["path"] not in new_paths}
            | {(specs_new[cls._file_spec(f)], f["bucket"])
               for f in m_new["files"] if f["path"] not in old_paths}
        )

    @classmethod
    def _class_touched(
        cls,
        m: dict[str, Any],
        classes: "set[tuple[int, int]] | list[tuple[int, int]]",
    ) -> "list[dict[str, Any]]":
        """Files of manifest ``m`` that could share keys with any of the
        given bucket classes. Symmetric inclusion on both sides of a diff
        keeps extra unchanged keys out (equal LWW rank ⇒ no change row)."""
        sp = cls._specs(m)
        return [
            f for f in m["files"]
            if any(
                cls._buckets_intersect(
                    sp[cls._file_spec(f)], f["bucket"], nb, b
                )
                for nb, b in classes
            )
        ]

    def _file_overlaps_buckets(
        self,
        m: dict[str, Any],
        f: dict[str, Any],
        target_nb: int,
        target_buckets: set[int],
    ) -> bool:
        """Does file ``f`` (under its own spec) possibly hold keys of any
        of ``target_buckets`` under a ``target_nb``-bucket spec?"""
        nb_f = self._specs(m)[self._file_spec(f)]
        return any(
            self._buckets_intersect(nb_f, f["bucket"], target_nb, b)
            for b in target_buckets
        )

    #: columns whose min/max land in every manifest file entry (Iceberg
    #: column-stats analogue): the merge key (point-lookup pruning), the
    #: event-time column (time-range scan + retention pruning), and lsn
    #: (settled-only retention).
    _STAT_COLS = ("warc_ts", "lsn")

    @staticmethod
    def _json_stat(v: Any) -> Any:
        """JSON-encode a parquet footer min/max: timestamps as unix
        micros, dates as ISO strings (both compare correctly in their
        encoding — the manifest is JSON), bytes and exotic types skipped,
        non-finite floats skipped (no sound JSON bound exists)."""
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            epoch = _dt.datetime(1970, 1, 1)
            return int((v - epoch).total_seconds() * 1_000_000)
        if isinstance(v, _dt.date):
            return v.isoformat()
        if isinstance(v, float) and not math.isfinite(v):
            return None
        if isinstance(v, (str, bool, int, float)):
            return v
        return None

    #: string min/max wider than this are truncated in the manifest
    #: (Iceberg write.metadata.metrics truncate(16) analogue): lower
    #: bound = prefix (still ≤ every value), upper bound = prefix with
    #: last codepoint bumped (still ≥ every value) — pruning stays sound
    #: and a wide text column cannot bloat the manifest.
    _STAT_TRUNC = 32

    @classmethod
    def _stat_upper(cls, s: str) -> str:
        if len(s) <= cls._STAT_TRUNC:
            return s
        up = prefix_successor(s[: cls._STAT_TRUNC])
        return up if up is not None else s  # un-incrementable: keep exact

    def _scan_files(
        self,
        rel_dir: str,
        delta: bool = False,
        stat_cols: "tuple[str, ...] | str | None" = None,
        spec: int = 0,
        epoch: int = 0,
        trunc_except: tuple[str, ...] = (),
    ) -> list[dict[str, Any]]:
        """Inventory just-written data files. With ``stat_cols`` the
        parquet footers (hot in page cache — written moments ago) are read
        ONCE and their per-file min/max land in the manifest, so later
        point lookups, time-range scans, and retention passes prune at
        PLANNING time with zero file I/O — the Iceberg manifest
        column-stats model. At 100 TB this is the difference between the
        driver consulting a JSON it already holds and opening 10⁵ footers
        over the network per query.

        ``stat_cols="*"`` records min/max for EVERY footer column with
        usable statistics (full Iceberg column metrics) — binary/nested
        columns skip themselves (`_json_stat` → None). String bounds
        outside ``trunc_except`` are truncated to ``_STAT_TRUNC``
        codepoints (lower = prefix, upper = bumped prefix), so wide text
        columns cost ~64 chars per file, not two page bodies."""
        import pyarrow.parquet as pq

        out = []
        base = os.path.join(self.path, rel_dir)
        for root, _dirs, files in os.walk(base):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, self.path)
                bucket = None
                for part in rel.split(os.sep):
                    if part.startswith("bucket="):
                        bucket = int(part.split("=", 1)[1])
                if bucket is None:
                    raise ValueError(f"file outside bucket partition: {rel}")
                entry = {"path": rel, "bucket": bucket, "bytes": os.path.getsize(full)}
                if delta:
                    entry["delta"] = True
                if spec:
                    entry["spec"] = spec
                if epoch:
                    entry["epoch"] = epoch
                if stat_cols:
                    md = pq.ParquetFile(full).metadata
                    idx = {
                        md.schema.column(i).name: i for i in range(md.num_columns)
                    }
                    stats: dict[str, Any] = {}
                    nulls: dict[str, int] = {}
                    cols = list(idx) if stat_cols == "*" else stat_cols
                    for col in cols:
                        if col not in idx:
                            continue
                        lo = hi = None
                        ok = True
                        nc = 0
                        ok_n = True
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(idx[col]).statistics
                            if st is None:
                                ok = ok_n = False
                                break
                            if st.has_null_count:
                                nc += st.null_count
                            else:
                                ok_n = False
                            if not st.has_min_max:
                                ok = False
                                continue
                            lo = st.min if lo is None else min(lo, st.min)
                            hi = st.max if hi is None else max(hi, st.max)
                        if ok_n:  # exact per-file null count (Iceberg
                            nulls[col] = nc  # value_counts/null_value_counts)
                        lo, hi = self._json_stat(lo), self._json_stat(hi)
                        if ok and lo is not None and hi is not None:
                            if isinstance(lo, str) and col not in trunc_except:
                                lo = lo[: self._STAT_TRUNC]
                                hi = self._stat_upper(hi)
                            stats[col] = [lo, hi]
                    if nulls:
                        entry["nulls"] = nulls
                    entry["rows"] = md.num_rows
                    if stats:
                        entry["stats"] = stats
                out.append(entry)
        return out

    # -------------------------------------------------------- maintenance

    def _applied_lsn_watermark(self, m: dict[str, Any]) -> int:
        """Globally-applied LSN watermark: every event with lsn ≤ this has
        been applied on its binlog partition (min over per-partition max
        applied lsn)."""
        wm = m.get("watermarks") or {}
        return min(int(v) for v in wm.values()) if wm else -1

    def _gc_tombstones(self, df: DataFrame, m: dict[str, Any]) -> DataFrame:
        """Drop tombstones at/below the applied-LSN watermark.

        Safe because (a) the input is already LWW-folded, so every older
        version the tombstone suppressed is gone; (b) re-delivery of an
        applied batch is a structural no-op (``applied_batches`` guard);
        (c) any yet-undelivered event has lsn > its partition's watermark
        and, per the binlog's per-key ordering guarantee, a higher
        (warc_ts, lsn) rank — it would out-rank the tombstone anyway.
        Without this rule a high-churn table grows without bound (the
        reference's TTL expiry analogue for deleted keys,
        /root/reference/fintick/bqloader/bqloader.py:9-13).

        PRECONDITION: run only from a maintenance context where delivery
        is quiescent or per-partition ordered up to the watermark. A file
        stream can surface segment files out of lsn order mid-ingest, and
        then the watermark over-reports progress — GC'ing a tombstone
        while an older version of its key is still undelivered would
        resurrect it (measured, not hypothetical). Hence ingest-loop
        compaction keeps tombstones and only scheduled maintenance GCs —
        the Iceberg ingest-vs-maintenance split."""
        gc_wm = self._applied_lsn_watermark(m)
        return df.where(~(F.col("is_deleted") & (F.col("lsn") <= F.lit(gc_wm))))

    def delta_file_counts(self) -> dict[tuple[int, int], int]:
        """Outstanding delta files per (spec_id, bucket) group — the
        merge-on-read read-amplification gauge minor compaction drains."""
        counts: dict[tuple[int, int], int] = {}
        for f in self.manifest()["files"]:
            if f.get("delta"):
                k = (self._file_spec(f), f["bucket"])
                counts[k] = counts.get(k, 0) + 1
        return counts

    def _commit_file_swap(
        self,
        nm: dict[str, Any],
        removed_paths: set[str],
        added_files: list[dict[str, Any]],
        ledger_add: list[str] | None = None,
        overlay: dict[str, Any] | None = None,
        max_retries: int = 5,
        ledger_swap: tuple[set[str], list[str]] | None = None,
    ) -> dict[str, Any]:
        """Commit a maintenance snapshot with Iceberg-style validation +
        REBASE instead of recompute.

        A maintenance rewrite (compaction, retention, bloom build) races
        merges for the version CAS. Losing the CAS does not invalidate
        the expensive work: the op's effect is "swap these input files
        for those output files". On conflict, reload the head and — if
        every input file is still present (nobody rewrote or dropped it)
        — re-point the same swap at the new head, carrying the
        concurrent commit's files, watermarks, schema and specs forward,
        and retry. LWW-fold commutativity makes this safe even when the
        concurrent commit APPENDED delta files to a compacted bucket:
        the kept delta still folds correctly against the new base. Only
        when an input file disappeared (a concurrent CoW rewrite) does
        the caller truly need to recompute — surfaced as
        :class:`CommitConflictError` after validation, exactly Iceberg's
        ``ValidationException`` model. Output files were stamped with the
        spec/epoch ids of the snapshot they were computed from; both are
        append-only registries, so a rebased commit never mislabels them.
        """
        summary = nm["summary"]
        for attempt in range(max_retries):
            try:
                self._write_manifest(nm)
                return nm["summary"]
            except CommitConflictError:
                cur = self.manifest()
                cur_paths = {f["path"] for f in cur["files"]}
                missing = removed_paths - cur_paths
                if missing:
                    raise CommitConflictError(
                        f"{summary.get('operation')} inputs were rewritten "
                        f"by a concurrent commit ({len(missing)} file(s) "
                        "gone); recompute against the new snapshot"
                    ) from None
                if ledger_swap and (ledger_swap[0] - set(cur["ledger_files"])):
                    raise CommitConflictError(
                        f"{summary.get('operation')} ledger inputs were "
                        "rewritten by a concurrent commit; recompute "
                        "against the new snapshot"
                    ) from None
                nm = dict(cur)
                nm.update(
                    version=cur["version"] + 1,
                    snapshot_id=str(uuid.uuid4()),
                    parent_version=cur["version"],
                    files=[
                        f for f in cur["files"] if f["path"] not in removed_paths
                    ] + added_files,
                    summary={**summary, "rebased_onto": cur["version"]},
                    committed_at_unix=time.time(),
                )
                if ledger_add:
                    nm["ledger_files"] = cur["ledger_files"] + ledger_add
                if ledger_swap:
                    removed_l, added_l = ledger_swap
                    # the concurrent commit may have APPENDED ledger files;
                    # carry them, swap only our inputs for our output
                    nm["ledger_files"] = [
                        p for p in cur["ledger_files"] if p not in removed_l
                    ] + added_l
                if overlay:
                    nm.update(overlay)
        raise CommitConflictError(
            f"{summary.get('operation')} lost the version CAS "
            f"{max_retries} times; table is under heavy concurrent commits"
        )

    def minor_compact(
        self,
        max_deltas: int = 8,
        buckets: list[int] | None = None,
        gc_tombstones: bool = False,
    ) -> dict[str, Any]:
        """Fold delta files back into base files for every bucket whose
        delta count reached ``max_deltas`` (or the explicit ``buckets``).

        This is the merge-on-read cost bound: reads fold at most
        ``max_deltas`` deltas per bucket, and each minor compaction
        touches only the buckets that need it — write cost O(live rows of
        those buckets), amortized O(batch) per merge when batches spread
        across buckets. ``gc_tombstones=True`` (maintenance contexts only
        — see :meth:`_gc_tombstones` for the delivery-order precondition)
        additionally drops tombstones at/below the applied-LSN
        watermark.

        Spec evolution: delta groups are (spec, bucket); folding a group
        must see EVERY version of every key it holds, so the input set is
        the transitive INTERSECTION CLOSURE of the selected groups over
        bucket classes (a coarser old-spec file pulls in the rest of its
        class). The whole closure rewrites under the CURRENT spec —
        minor compaction doubles as lazy migration, same as merges."""
        m = self.manifest()
        specs = self._specs(m)
        cur_spec = self._current_spec(m)
        counts = self.delta_file_counts()
        if buckets is None:
            groups = {k for k, c in counts.items() if c >= max_deltas}
        else:
            # explicit buckets are CURRENT-spec ids: select delta groups
            # whose key space intersects any of them
            bset = set(buckets)
            groups = {
                k for k in counts
                if any(
                    self._buckets_intersect(specs[k[0]], k[1], specs[cur_spec], b)
                    for b in bset
                )
            }
        if not groups:
            return {"operation": "minor_compact", "buckets": []}
        # intersection closure over ALL files (base + delta): fold safety
        # requires that for every key in the input, every file that could
        # hold a version of it is also in the input — otherwise the
        # folded winner would coexist with an unfolded older version
        sel: set[tuple[int, int]] = set(groups)
        grew = True
        while grew:
            grew = False
            for f in m["files"]:
                kf = (self._file_spec(f), f["bucket"])
                if kf in sel:
                    continue
                if any(
                    self._buckets_intersect(specs[kf[0]], kf[1], specs[s], b)
                    for s, b in sel
                ):
                    sel.add(kf)
                    grew = True
        in_files = [
            f for f in m["files"] if (self._file_spec(f), f["bucket"]) in sel
        ]
        df = self.read_physical(files=in_files, fold=True)
        if gc_tombstones:
            df = self._gc_tombstones(df, m)
        snap = str(uuid.uuid4())[:8]
        rel_out = f"data/minor-{snap}"
        (
            df.withColumn("bucket", self._bucket(m["key"], m["n_buckets"]))
            .repartition(min(m["n_buckets"], max(1, len(sel))), F.col("bucket"))
            .sortWithinPartitions(m["key"])
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(os.path.join(self.path, rel_out))
        )
        new_files = self._scan_files(
            rel_out, stat_cols="*", trunc_except=(m["key"],), spec=cur_spec,
            epoch=self._current_epoch(m),
        )
        in_paths = {f["path"] for f in in_files}
        keep = [f for f in m["files"] if f["path"] not in in_paths]
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            files=keep + new_files,
            summary={"operation": "minor_compact",
                     "buckets": sorted(b for _s, b in sel),
                     "groups": sorted([s, b] for s, b in sel),
                     "files_folded": len(m["files"]) - len(keep),
                     "files_after": len(new_files)},
            committed_at_unix=time.time(),
        )
        return self._commit_file_swap(nm, in_paths, new_files)

    def compact_files(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        gc_tombstones: bool = False,
    ) -> dict[str, Any]:
        """Rewrite each bucket's files into ~target-size files (Iceberg
        ``rewrite_data_files`` analogue — the north_rule's file-size
        compaction knob). On a merge-on-read table this also folds every
        outstanding delta into the base (the folded read is the input).
        ``gc_tombstones=True`` additionally drops tombstones at/below the
        applied-LSN watermark (:meth:`_gc_tombstones`); retained
        tombstones above it remain load-bearing for LWW replay.
        """
        m = self.manifest()
        df = self.read_physical()
        if gc_tombstones:
            df = self._gc_tombstones(df, m)
        total_bytes = sum(f["bytes"] for f in m["files"]) or 1
        n_files = max(1, round(total_bytes / target_file_bytes))
        snap = str(uuid.uuid4())[:8]
        rel_out = f"data/compact-{snap}"
        (
            df.withColumn("bucket", self._bucket(m["key"], m["n_buckets"]))
            .repartition(max(n_files, m["n_buckets"]), F.col("bucket"))
            .sortWithinPartitions(m["key"])
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(os.path.join(self.path, rel_out))
        )
        new_files = self._scan_files(
            rel_out, stat_cols="*", trunc_except=(m["key"],),
            spec=self._current_spec(m), epoch=self._current_epoch(m),
        )
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            files=new_files,
            summary={"operation": "compact", "files_before": len(m["files"]),
                     "files_after": len(new_files)},
            committed_at_unix=time.time(),
        )
        # full-table rewrite: every current file is an input, so a rebase
        # can only succeed against metadata-only concurrent commits —
        # anything that touched data invalidates the inputs (validated)
        return self._commit_file_swap(
            nm, {f["path"] for f in m["files"]}, new_files
        )

    def compact_ledger(self, max_files: int = 1) -> dict[str, Any]:
        """Fold the per-batch ledger parquets into ``max_files`` file(s).

        Every applied micro-batch appends one tiny ledger parquet; at
        10^5 micro-batches ``ledger()`` opens 10^5 files and every full
        manifest lists them all. This is the ledger's analogue of data
        compaction: rows are carried verbatim (the lineage record is
        immutable history — nothing is aggregated away), only the file
        layout changes. Older snapshots keep their own ledger lists, so
        time travel still sees the pre-compaction layout; superseded
        files are released by ``expire_snapshots``/``remove_orphans``.

        Driver-side pyarrow: ledger rows are ~10 small columns per batch,
        so even 10^5 batches concat in memory in well under a second —
        no Spark job. Commits through the rebase path: a concurrent
        merge APPENDS a new ledger file and rebases cleanly; a concurrent
        ledger compaction invalidates our inputs and raises."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        m = self.manifest()
        files = list(m["ledger_files"])
        max_files = max(1, int(max_files))
        if len(files) <= max_files:
            return {"operation": "compact_ledger",
                    "files_before": len(files), "files_after": len(files)}
        merged = pa.concat_tables(
            [pq.read_table(os.path.join(self.path, p)) for p in files]
        )
        snap = str(uuid.uuid4())[:8]
        new_rel: list[str] = []
        n = merged.num_rows
        per = -(-n // max_files)  # ceil; max_files=1 → one file
        for i in range(max_files):
            chunk = merged.slice(i * per, per)
            if chunk.num_rows == 0:
                break
            rel = f"ledger/compacted-{snap}-{i}.parquet"
            pq.write_table(chunk, os.path.join(self.path, rel))
            new_rel.append(rel)
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            ledger_files=new_rel,
            summary={"operation": "compact_ledger",
                     "files_before": len(files),
                     "files_after": len(new_rel), "rows": n},
            committed_at_unix=time.time(),
        )
        return self._commit_file_swap(
            nm, set(), [], ledger_swap=(set(files), new_rel)
        )

    # --------------------------------------------------------- key blooms

    #: double-hash family salt for the second bloom hash (K-M, same
    #: construction as the MinHash family in operators/dedup.py)
    _BLOOM_SALT = "cee-bloom-h2"

    def _bloom_hashes(self, key: str):
        """The two Spark-side hash expressions the bloom is built from.
        Build (executor pandas) and probe (driver) MUST derive bit
        positions from these same two values."""
        return (
            F.xxhash64(F.col(key)).alias("_h1"),
            F.xxhash64(F.lit(self._BLOOM_SALT), F.col(key)).alias("_h2"),
        )

    @staticmethod
    def _bloom_positions(h1: int, h2: int, n_hashes: int, n_bits: int):
        """Kirsch-Mitzenmacher positions from two signed-int64 hashes.
        Pure-python unsigned-mod arithmetic — identical on the build and
        probe side by construction."""
        u1, u2 = h1 & 0xFFFFFFFFFFFFFFFF, h2 & 0xFFFFFFFFFFFFFFFF
        return [((u1 + i * u2) % (1 << 64)) % n_bits for i in range(n_hashes)]

    def build_blooms(
        self, bits_per_key: int = 10, n_hashes: int = 7
    ) -> dict[str, Any]:
        """Per-file key Bloom filters (Iceberg puffin-blob analogue) for
        point-lookup file skipping.

        Motivation: the manifest's min/max key stats prune string-keyed
        lookups weakly — url ranges inside one hash bucket are wide, so a
        bucket with many files (merge-on-read deltas, straddling
        compactions) opens most of them for a single key. A 10-bits/key
        7-hash bloom answers "key definitely absent" at ~0.8% false
        positives, so a lookup opens ~1 file regardless of file count.

        Build is fully distributed: one narrow pass over the CURRENT
        files' key column (column-pruned scan), two JVM-side xxhash64
        values per row, then one Arrow-batched ``applyInPandas`` group per
        file folds them into a bitset — the shuffle carries two longs per
        row, the result one row per file. Blooms land in a parquet side
        table referenced by the manifest; a new snapshot version commits
        the reference atomically.

        Blooms are built from the PHYSICAL rows, tombstones included — a
        delta file whose tombstone were bloom-invisible would let a
        lookup resurrect the deleted base row (tested). Files written by
        later merges simply have no bloom row and are never pruned by
        this tier (safe degradation); rebuild on a maintenance cadence,
        e.g. with file compaction. The superseded bloom dir is deleted at
        commit — bloom pointers in older snapshots degrade gracefully
        (lookup falls back to stats-only pruning).
        """
        import pandas as pd

        m = self.manifest()
        key, bpk, k = m["key"], int(bits_per_key), int(n_hashes)
        if not m["files"]:
            return {"operation": "build_blooms", "files": 0}
        table_root = self.path

        def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            n_bits = max(64, ((len(pdf) * bpk + 7) // 8) * 8)
            bits = np.zeros(n_bits // 8, dtype=np.uint8)
            u1 = pdf["_h1"].to_numpy().astype(np.uint64)
            u2 = pdf["_h2"].to_numpy().astype(np.uint64)
            for i in range(k):
                # uint64 arithmetic wraps mod 2^64 — same rule as the
                # probe side's ((u1 + i*u2) % 2^64) % n_bits
                pos = (u1 + np.uint64(i) * u2) % np.uint64(n_bits)
                np.bitwise_or.at(bits, (pos // 8).astype(np.int64),
                                 np.left_shift(1, (pos % 8).astype(np.uint8),
                                               dtype=np.uint8))
            uri = pdf["_file"].iloc[0]
            local = uri[len("file:"):] if uri.startswith("file:") else uri
            rel = os.path.relpath(local, table_root)
            return pd.DataFrame(
                {"path": [rel], "n_bits": [n_bits], "bloom": [bits.tobytes()]}
            )

        hashed = self._read_raw(m, m["files"]).select(
            F.input_file_name().alias("_file"), *self._bloom_hashes(key)
        )
        rel_out = f"blooms/bloom-{str(uuid.uuid4())[:8]}"
        (
            hashed.groupBy("_file")
            .applyInPandas(_fold, schema="path string, n_bits long, bloom binary")
            .write.parquet(os.path.join(self.path, rel_out))
        )

        old = (m.get("blooms") or {}).get("dir")
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            blooms={"dir": rel_out, "bits_per_key": bpk, "n_hashes": k},
            summary={"operation": "build_blooms", "files": len(m["files"]),
                     "bits_per_key": bpk, "n_hashes": k},
            committed_at_unix=time.time(),
        )
        # rebase-safe against ANY concurrent commit: files added since we
        # scanned simply lack a bloom row (never pruned — safe), files
        # removed since leave harmless dead bloom rows
        summary = self._commit_file_swap(
            nm, set(), [],
            overlay={"blooms": nm["blooms"]},
        )
        if old:
            shutil.rmtree(os.path.join(self.path, old), ignore_errors=True)
        return summary

    def _bloom_prune(
        self, m: dict[str, Any], value: Any, candidates: list[dict[str, Any]]
    ) -> list[dict[str, Any]]:
        """Drop candidate files whose bloom proves the key absent. Files
        without a bloom row (written after the last build, or the bloom
        dir was superseded) are kept — this tier only ever removes work."""
        bl = m.get("blooms")
        if not bl or not candidates:
            return candidates
        bloom_path = os.path.join(self.path, bl["dir"])
        if not os.path.isdir(bloom_path):
            return candidates  # superseded by a later build — stats only
        key = m["key"]
        key_field = next(
            f for f in self._physical_schema(m).fields if f.name == key
        )
        r = (
            self.spark.createDataFrame([(value,)], T.StructType([key_field]))
            .select(*self._bloom_hashes(key))
            .collect()[0]
        )
        rels = {f["path"] for f in candidates}
        rows = {
            row["path"]: row
            for row in self.spark.read.parquet(bloom_path)
            .where(F.col("path").isin(*rels))
            .collect()
        }
        kept = []
        for f in candidates:
            row = rows.get(f["path"])
            if row is None:
                kept.append(f)
                continue
            bits = row["bloom"]
            hit = all(
                bits[p // 8] & (1 << (p % 8))
                for p in self._bloom_positions(
                    r["_h1"], r["_h2"], bl["n_hashes"], row["n_bits"]
                )
            )
            if hit:
                kept.append(f)
        return kept

    # ------------------------------------------------------------- clone

    def clone_to(
        self, target_path: str, version: int | str | None = None
    ) -> "LakeTable":
        """Clone a snapshot into an independent table (Delta ``CLONE``
        analogue). Data files are ``os.link``-hardlinked when the target
        shares a filesystem — a ZERO-COPY deep clone at any table size —
        falling back to byte copies across devices. The clone starts its
        own version chain at v0 (with this table's schema, specs, field
        ids, watermarks and applied-batch guard carried over), so
        replay/merges against the clone converge exactly as they would
        have on the source: the dev/staging-fork workflow (experiment on
        a fork of production, then throw it away) with no storage bill.
        Because both tables' manifests reference their OWN paths,
        retention on either side never breaks the other — hardlinked
        bytes live until the last referent unlinks (the same contract
        Iceberg gets from object-store refcounts)."""
        m = self.manifest(version)
        t = LakeTable(self.spark, target_path, backend=self.backend.name)
        if os.path.exists(t.meta_dir) and os.listdir(t.meta_dir):
            raise FileExistsError(f"table already exists at {target_path}")
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.ledger_dir, exist_ok=True)
        t.backend.put_if_absent(
            os.path.join(t.meta_dir, "commit-backend.json"),
            json.dumps(t.backend.describe()).encode(),
        )

        def _link(rel: str) -> None:
            src = os.path.join(self.path, rel)
            dst = os.path.join(t.path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:  # cross-device: fall back to a copy
                shutil.copy2(src, dst)

        for f in m["files"]:
            _link(f["path"])
        for rel in m["ledger_files"]:
            _link(rel)
        bl = m.get("blooms")
        if bl and os.path.isdir(os.path.join(self.path, bl["dir"])):
            for root, _d, files in os.walk(os.path.join(self.path, bl["dir"])):
                for fn in files:
                    _link(os.path.relpath(os.path.join(root, fn), self.path))

        nm = dict(m)
        nm.pop("files_delta", None)
        nm.pop("staged", None)
        nm.update(
            version=0,
            snapshot_id=str(uuid.uuid4()),
            parent_version=None,
            summary={
                "operation": "clone",
                "source": self.path,
                "source_version": m["version"],
                "total_rows": m.get("summary", {}).get("total_rows"),
            },
            committed_at_unix=time.time(),
        )
        t._write_manifest(nm)
        return t

    # ------------------------------------------------------ row-level DML

    def _max_lsn(self, m: dict[str, Any]) -> int:
        """Highest lsn in the table — from manifest stats when every file
        carries them (zero I/O), else one column-pruned scan."""
        maxes = [
            (f.get("stats") or {}).get("lsn", [None, None])[1] for f in m["files"]
        ]
        if maxes and all(v is not None for v in maxes):
            return int(max(maxes))
        if not m["files"]:
            return -1
        row = self.read_physical(fold=False).agg(F.max("lsn").alias("m")).collect()[0]
        return int(row["m"]) if row["m"] is not None else -1

    def _dml_changes(self, m: dict[str, Any], condition, op: str):
        cond = F.expr(condition) if isinstance(condition, str) else condition
        public = [
            f.name
            for f in T.StructType.fromJson(m["schema"]).fields
            if f.name not in _INTERNAL_COLS
        ]
        live = self.read_physical(fold=True).where(~F.col("is_deleted")).where(cond)
        lsn = self._max_lsn(m) + 1
        schema = T.StructType.fromJson(m["schema"])
        structural = {m["key"], *ORDER_COLS}

        def payload_col(c: str):
            if op == "D" and c not in structural:
                # tombstones carry no payload bytes (feed-delete contract)
                return F.lit(None).cast(schema[c].dataType).alias(c)
            return F.col(c)

        # keep each row's own warc_ts: the synthetic event ranks equal on
        # ts and above on lsn, so it beats the live row — and any LATER
        # feed event for the key still beats it (normal LWW)
        out = live.select(
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(-1).cast("int").alias("partition"),
            F.lit(op).alias("op"),
            *[payload_col(c) for c in public],
        )
        # pin the O(live table) scan+fold+filter ONCE: isEmpty() plus the
        # merge's several traversals (winner agg, bucket collect, stats,
        # lsn semi-join, write) would otherwise re-execute it 5-6× per
        # DML call — the same re-evaluation hazard merge_into checkpoints
        # its classification plan against
        return out.localCheckpoint(eager=True)

    def delete_where(
        self, condition, batch_id: int | None = None
    ) -> dict[str, Any]:
        """Row-level ``DELETE ... WHERE`` (Iceberg/Delta DELETE analogue):
        live rows matching ``condition`` become LWW tombstones through the
        SAME merge path as feed deletes — bucket-pruned, atomically
        committed with a ledger row (``partition=-1`` maintenance
        lineage), idempotent under replay via the exactly-once guard.
        Cost is one pruned scan + a merge of O(matching keys); nothing is
        physically erased (older snapshots still time-travel) until
        compaction folds and ``expire_snapshots`` drops the bytes.
        Reference analogue: the unconditional partition drops of the
        hot-window reload (/root/reference/fintick/bqloader/base.py:91-112)
        — here row-granular and replay-safe."""
        m = self.manifest()
        changes = self._dml_changes(m, condition, "D")
        if changes.isEmpty():
            return {"operation": "delete_where", "n_events": 0, "skipped": True}
        bid = batch_id if batch_id is not None else -(uuid.uuid4().int >> 66)
        s = self.merge_apply(changes, batch_id=bid)
        s["operation"] = "delete_where"
        return s

    def update_where(
        self,
        condition,
        assignments: dict[str, Any],
        batch_id: int | None = None,
    ) -> dict[str, Any]:
        """Row-level ``UPDATE ... SET ... WHERE``: live rows matching
        ``condition`` re-enter the merge as higher-lsn update events with
        ``assignments`` applied (column -> Column or SQL expression string,
        evaluated against the matched row). Same cost/lineage contract as
        :meth:`delete_where`. Derived columns are NOT recomputed (an
        update of ``html`` does not re-extract ``text`` — run the
        pipeline's enrich explicitly if needed)."""
        m = self.manifest()
        bad = set(assignments) & {m["key"], *ORDER_COLS, *_INTERNAL_COLS}
        if bad:
            raise ValueError(
                f"cannot update structural column(s) {sorted(bad)} — the "
                "merge key and LWW order columns define row identity"
            )
        unknown = set(assignments) - {f["name"] for f in m["schema"]["fields"]}
        if unknown:
            raise ValueError(f"unknown column(s) {sorted(unknown)}")
        changes = self._dml_changes(m, condition, "U")
        for col, val in assignments.items():
            expr = F.expr(val) if isinstance(val, str) else val
            changes = changes.withColumn(col, expr)
        if changes.isEmpty():
            return {"operation": "update_where", "n_events": 0, "skipped": True}
        bid = batch_id if batch_id is not None else -(uuid.uuid4().int >> 66)
        s = self.merge_apply(changes, batch_id=bid)
        s["operation"] = "update_where"
        return s

    def merge_into(
        self,
        source: DataFrame,
        *,
        when_matched_update: "bool | dict[str, Any]" = True,
        when_matched_delete: Any = None,
        matched_condition: Any = None,
        when_not_matched_insert: bool = True,
        when_not_matched_by_source_delete: Any = None,
        when_not_matched_by_source_update: "dict[str, Any] | None" = None,
        batch_id: int | None = None,
    ) -> dict[str, Any]:
        """Generic ``MERGE INTO`` (Delta/Iceberg analogue): classify an
        arbitrary keyed source against the live table and route each row
        through the engine's OWN exactly-once LWW merge path — one atomic
        ledgered commit, idempotent under replay, time-travel intact.

        Clauses (evaluated per matched key; delete wins over update):

        - ``when_matched_update`` — ``True`` (default): source columns
          overwrite the target's, target keeps columns the source lacks
          (Delta ``UPDATE SET *`` with partial sources); a dict maps
          column -> Column/SQL expression (``UPDATE SET col = expr``) —
          expressions see SOURCE columns by name and TARGET columns as
          ``t_<name>``; unassigned target columns are kept. ``False``
          disables the clause.
        - ``when_matched_delete`` — ``True`` or a boolean Column/SQL
          condition (same namespace); rows satisfying it become LWW
          tombstones instead of updates.
        - ``matched_condition`` — extra gate on BOTH matched clauses
          (``MERGE ... WHEN MATCHED AND <cond>``); non-qualifying matched
          rows are no-ops.
        - ``when_not_matched_insert`` — insert source rows whose key is
          absent (or deleted) in the table; the source must carry
          ``warc_ts`` for this clause.
        - ``when_not_matched_by_source_delete`` / ``_update`` — Delta's
          third clause family: live TARGET rows whose key is absent from
          the source get tombstoned (``True`` or a SQL/Column condition
          over target columns, plain names — there is no source row) or
          updated (dict of assignments over target columns). Unlike the
          other clauses this is O(live table), not O(source buckets): it
          must scan every bucket to find non-matches — the same cost
          Delta pays — so it is opt-in and the scan happens only when one
          of the two is set. The classic use is snapshot-sync: make the
          table equal a full source snapshot with
          ``merge_into(snap, when_not_matched_by_source_delete=True)``.

        Matched events reuse the TARGET row's ``warc_ts`` and a fresh
        max+1 lsn, so they win LWW now but any later feed event for the
        key still beats them — identical contract to :meth:`update_where`.
        Source columns unknown to the table evolve the schema through the
        normal merge path. A source with duplicate keys is rejected
        (Delta's multiple-matches error); ``matched_condition`` does not
        gate the by-source clauses (Delta's rule: each clause family has
        its own conditions).

        Scale shape: the live side reads ONLY the buckets the source
        keys can hash to (manifest file pruning — O(n_buckets) driver
        rows, never a full scan), the classification is one equi-join on
        the merge key, and the write is the same single bucket-aligned
        merge shuffle every CDC batch pays. Reference analogue: none —
        the reference's only upsert is its tick-replay loop; this is the
        declarative face the north rule's lake users expect.
        """
        m = self.manifest()
        key = m["key"]
        if key not in source.columns:
            raise ValueError(f"source must carry the merge key {key!r}")
        schema = T.StructType.fromJson(m["schema"])
        tgt_public = [f.name for f in schema.fields if f.name not in _INTERNAL_COLS]
        reserved = ({"lsn", "op", "partition", "bucket", "__key_hash__"}
                    | set(_INTERNAL_COLS)) - {key}
        bad_src = set(source.columns) & reserved
        if bad_src:
            raise ValueError(
                f"source columns {sorted(bad_src)} collide with the change-"
                "envelope / write-path namespace — rename them before the "
                "merge (silently dropping them would lose data)"
            )
        src_payload = list(source.columns)
        extras = [c for c in src_payload if c not in tgt_public]
        clash = set(source.columns) & (
            {f"t_{c}" for c in tgt_public} | {"t__matched"}
        )
        if clash:
            raise ValueError(
                f"source columns {sorted(clash)} collide with the t_-prefixed "
                "target namespace used by merge conditions"
            )

        def _validate_assignments(d: dict) -> None:
            bad = set(d) & {key, *ORDER_COLS, *_INTERNAL_COLS}
            if bad:
                raise ValueError(
                    f"cannot update structural column(s) {sorted(bad)}"
                )
            unknown = set(d) - set(tgt_public) - set(extras)
            if unknown:
                raise ValueError(f"unknown column(s) {sorted(unknown)}")

        if isinstance(when_matched_update, dict):
            _validate_assignments(when_matched_update)
        bs_del = when_not_matched_by_source_delete
        bs_del = None if bs_del is False else bs_del
        bs_upd = when_not_matched_by_source_update
        if bs_upd:
            _validate_assignments(bs_upd)
        if when_not_matched_insert and "warc_ts" not in source.columns:
            raise ValueError(
                "when_not_matched_insert needs warc_ts in the source "
                "(the LWW order column of inserted rows)"
            )
        # all pure-metadata validation precedes the first Spark job.
        # Bind the key to the table's type BEFORE hashing: a dtype-skewed
        # key (int vs long) hashes to different buckets than the write
        # side and corrupts both pruning and classification.
        source = source.withColumn(key, F.col(key).cast(schema[key].dataType))
        # pin the source before it is consulted by several independent
        # jobs (dup guard, bucket collect, classification, merge write):
        # a lazily re-evaluated non-deterministic source could pass the
        # guard yet produce duplicates later — Delta materializes the
        # MERGE source for the same reason
        source = source.localCheckpoint(eager=True)
        dup_probe = (
            source.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__n_rows"))
            .where(F.col("__n_rows") > 1)  # aliased: a source column
            # literally named "count" must not shadow the probe
        )
        if dup_probe.limit(1).count():
            raise ValueError(
                "source has duplicate merge keys — MERGE requires at most "
                "one source row per target row (dedupe upstream, e.g. "
                "lww_compact)"
            )

        nb = self._specs(m)[self._current_spec(m)]
        buckets = [
            int(r["b"])
            for r in source.select(self._bucket(key, nb).alias("b"))
            .distinct().collect()
        ]
        live = (
            self.read_physical(buckets=buckets, fold=True)
            .select(
                F.col(key),
                *[F.col(c).alias(f"t_{c}") for c in tgt_public if c != key],
                # live rows match; tombstones join through (their warc_ts
                # is needed below) but classify as NOT matched
                F.when(~F.col("is_deleted"), F.lit(True)).alias("t__matched"),
            )
        )
        j = source.join(live, on=key, how="left")
        matched = F.col("t__matched").isNotNull()
        mc = (
            F.lit(True) if matched_condition is None
            else F.expr(matched_condition)
            if isinstance(matched_condition, str) else matched_condition
        )
        del_cond = None
        if when_matched_delete is not None and when_matched_delete is not False:
            del_cond = (
                F.lit(True) if when_matched_delete is True
                else F.expr(when_matched_delete)
                if isinstance(when_matched_delete, str) else when_matched_delete
            )

        def _src_type(c: str) -> T.DataType:
            return source.schema[c].dataType

        def _tgt_type(c: str) -> T.DataType:
            return schema[c].dataType if c in {f.name for f in schema.fields} \
                else _src_type(c)

        lsn = self._max_lsn(m) + 1

        def ev(frame: DataFrame, op: str, cols, where) -> DataFrame:
            return frame.where(where).select(
                F.lit(lsn).cast("long").alias("lsn"),
                F.lit(-1).cast("int").alias("partition"),
                F.lit(op).alias("op"),
                *cols,
            )

        if when_not_matched_insert:
            # a not-matched row whose LWW rank would be NULL (null source
            # warc_ts AND no tombstone ts to adopt) cannot win the merge
            # window — it would be silently dropped; refuse loudly instead
            bad_ins = (
                j.where(
                    ~F.coalesce(matched, F.lit(False))
                    & F.col("warc_ts").isNull()
                    & F.col("t_warc_ts").isNull()
                )
                .limit(1).count()
            )
            if bad_ins:
                raise ValueError(
                    "when_not_matched_insert requires a non-null warc_ts "
                    "on every inserted source row (a null LWW rank would "
                    "silently drop the insert)"
                )

        events: list[DataFrame] = []
        if del_cond is not None:
            dcols = []
            for c in tgt_public + extras:
                if c == key:
                    dcols.append(F.col(key))
                elif c == "warc_ts":
                    dcols.append(F.col("t_warc_ts").alias("warc_ts"))
                else:  # tombstones carry no payload bytes
                    dcols.append(F.lit(None).cast(_tgt_type(c)).alias(c))
            events.append(ev(j, "D", dcols, matched & mc & del_cond))
        if when_matched_update is not False:
            ucols = []
            for c in tgt_public + extras:
                if c == key:
                    ucols.append(F.col(key))
                elif c == "warc_ts":
                    ucols.append(F.col("t_warc_ts").alias("warc_ts"))
                elif isinstance(when_matched_update, dict):
                    if c in when_matched_update:
                        v = when_matched_update[c]
                        ucols.append(
                            (F.expr(v) if isinstance(v, str) else v).alias(c)
                        )
                    elif c in extras:  # unassigned new column: null
                        ucols.append(F.lit(None).cast(_src_type(c)).alias(c))
                    else:  # unassigned target column: kept
                        ucols.append(F.col(f"t_{c}").alias(c))
                elif c in src_payload:  # UPDATE SET *: source overwrites
                    ucols.append(F.col(c))
                else:  # column the source lacks: target value kept
                    ucols.append(F.col(f"t_{c}").alias(c))
            w = matched & mc
            if del_cond is not None:
                w = w & ~F.coalesce(del_cond, F.lit(False))
            events.append(ev(j, "U", ucols, w))
        if when_not_matched_insert:
            icols = []
            for c in tgt_public + extras:
                if c == "warc_ts":
                    # a key "absent" because a NEWER tombstone holds it
                    # would silently out-order a plain source timestamp;
                    # adopting max(source ts, tombstone ts) + max+1 lsn
                    # makes the insert actually land (Delta's WHEN NOT
                    # MATCHED guarantee), while a LATER feed event still
                    # wins normally
                    icols.append(
                        F.greatest(F.col("warc_ts"), F.col("t_warc_ts"))
                        .alias("warc_ts")
                    )
                elif c in src_payload:
                    icols.append(F.col(c))
                else:
                    icols.append(F.lit(None).cast(_tgt_type(c)).alias(c))
            events.append(ev(j, "I", icols, ~F.coalesce(matched, F.lit(False))))
        if bs_del is not None or bs_upd:
            # WHEN NOT MATCHED BY SOURCE: inherently O(live table) — every
            # bucket must be scanned to find keys the source lacks
            nms = (
                self.read_physical(fold=True)
                .where(~F.col("is_deleted"))
                .select(*tgt_public)
                .join(source.select(key), on=key, how="left_anti")
            )
            dcond = None
            if bs_del is not None:
                dcond = (
                    F.lit(True) if bs_del is True
                    else F.expr(bs_del) if isinstance(bs_del, str) else bs_del
                )

            if dcond is not None:
                dcols = []
                for c in tgt_public + extras:
                    if c in (key, "warc_ts"):
                        dcols.append(F.col(c))
                    else:
                        dcols.append(F.lit(None).cast(_tgt_type(c)).alias(c))
                events.append(ev(nms, "D", dcols, dcond))
            if bs_upd:
                ucols = []
                for c in tgt_public + extras:
                    if c in bs_upd:
                        v = bs_upd[c]
                        ucols.append(
                            (F.expr(v) if isinstance(v, str) else v).alias(c)
                        )
                    elif c in extras:  # no source row: new columns null
                        ucols.append(F.lit(None).cast(_src_type(c)).alias(c))
                    else:
                        ucols.append(F.col(c))
                w = F.lit(True) if dcond is None \
                    else ~F.coalesce(dcond, F.lit(False))
                events.append(ev(nms, "U", ucols, w))
        if not events:
            return {"operation": "merge_into", "n_events": 0, "skipped": True}
        changes = events[0]
        for e in events[1:]:
            changes = changes.unionByName(e)
        # the classification plan (including any O(table) by-source scan)
        # would otherwise re-execute for the empty probe, the narrow aggs,
        # and the winner fetch — pin the O(events) result once
        changes = changes.localCheckpoint(eager=True)
        if changes.isEmpty():
            return {"operation": "merge_into", "n_events": 0, "skipped": True}
        bid = batch_id if batch_id is not None else -(uuid.uuid4().int >> 66)
        s = self.merge_apply(changes, batch_id=bid)
        s["operation"] = "merge_into"
        return s

    def expire_rows(
        self,
        older_than: _dt.datetime,
        ts_col: str = "warc_ts",
        settled_only: bool = True,
    ) -> dict[str, Any]:
        """Time-based retention: expire rows whose ``ts_col`` is before
        ``older_than`` — the reference's 6-day hourly-partition TTL
        (/root/reference/fintick/bqloader/bqloader.py:9-13,
        fintick/constants.py:52-53) re-expressed for a bucket-partitioned
        lake table where age is a ROW property, not a partition.

        Three-tier cost, Iceberg-style:

        - files whose parquet-footer max(ts) is already past the cutoff
          are dropped from the manifest WITHOUT reading data — O(1) per
          file, the analogue of the reference's whole-partition drop
          (physical deletion deferred to :meth:`expire_snapshots`, so
          older snapshots still time-travel);
        - files whose footer min(ts) is at/after the cutoff are untouched
          — never opened;
        - only straddling files are rewritten with the retention filter,
          base and delta rewritten separately so merge-on-read fold
          semantics survive.

        Tombstone correctness: with ``settled_only`` (default) a row —
        live OR tombstone — expires only when ``lsn`` ≤ the applied-LSN
        watermark, so no still-undelivered event at/below it can observe
        the gap: LWW replay of the live range is unchanged (same
        precondition argument as :meth:`_gc_tombstones`). A table with no
        recorded watermarks then expires nothing. ``settled_only=False``
        is the reference's unconditional drop.

        The expiry is committed atomically with a ledger row
        (``partition=-1`` marks maintenance lineage; ``n_delete`` =
        expired rows), mirroring how data+ledger commit together in
        :meth:`merge_apply`.
        """
        m = self.manifest()
        if ts_col in (self.manifest().get("column_defaults") or {}):
            raise ValueError(
                f"ts_col {ts_col!r} carries an initial default: files that "
                "predate the column read a value the parquet footers and "
                "manifest bounds cannot see, so age pruning would silently "
                "never expire those rows — drop the default first"
            )
        cutoff = older_than
        if cutoff.tzinfo is not None:
            cutoff = cutoff.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        wm = self._applied_lsn_watermark(m) if settled_only else None
        if settled_only and wm < 0:
            return {"operation": "expire_rows", "n_expired": 0,
                    "reason": "no applied-LSN watermark; nothing settled"}

        import pyarrow.parquet as pq

        def _naive(v):
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return v

        epoch = _dt.datetime(1970, 1, 1)

        def _file_bounds(f: dict[str, Any]):
            """(ts_min, ts_max, lsn_max, n_rows) — manifest stats when the
            entry carries them (zero I/O), else one footer open."""
            mst = f.get("stats") or {}
            ts_stat = self._file_stat(m, f, ts_col)
            if ts_stat is not None and "rows" in f:
                ts_lo = epoch + _dt.timedelta(microseconds=ts_stat[0])
                ts_hi = epoch + _dt.timedelta(microseconds=ts_stat[1])
                lmax = mst["lsn"][1] if "lsn" in mst else None
                return ts_lo, ts_hi, lmax, f["rows"]
            phys_ts = self._name_at_epoch(m, f, ts_col)
            md = pq.ParquetFile(os.path.join(self.path, f["path"])).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if phys_ts is None or phys_ts not in idx:
                # column physically absent from this file (added after it
                # was written, or dropped-and-readded) — reads as all
                # nulls, which never satisfy ts < cutoff: report bounds at
                # the cutoff so the caller KEEPS the file untouched
                return cutoff, cutoff, None, md.num_rows
            mins, maxs, lsn_max = [], [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[phys_ts]).statistics
                if st is None or not st.has_min_max:
                    return None, None, None, md.num_rows
                mins.append(_naive(st.min)); maxs.append(_naive(st.max))
                lst = md.row_group(rg).column(idx["lsn"]).statistics
                lsn_max.append(lst.max if lst is not None and lst.has_min_max
                               else None)
            lmax = (max(lsn_max) if lsn_max and all(x is not None for x in lsn_max)
                    else None)
            return min(mins), max(maxs), lmax, md.num_rows

        drop, rewrite, keep = [], [], []
        dropped_rows = 0
        for f in m["files"]:
            ts_lo, ts_hi, lsn_max, n_rows = _file_bounds(f)
            if ts_lo is None:  # no stats ⇒ must rewrite conservatively
                rewrite.append(f)
            elif ts_lo >= cutoff:
                keep.append(f)  # nothing old inside — never opened
            elif ts_hi < cutoff and (
                wm is None or (lsn_max is not None and lsn_max <= wm)
            ):
                drop.append(f)  # whole file expired — metadata-only delete
                dropped_rows += n_rows
            else:
                rewrite.append(f)

        expired_pred = F.col(ts_col) < F.lit(cutoff)
        if wm is not None:
            expired_pred = expired_pred & (F.col("lsn") <= F.lit(wm))

        new_files: list[dict[str, Any]] = []
        rewritten_expired = 0
        snap = str(uuid.uuid4())[:8]
        for flag in (False, True):  # base files, then delta files
            group = [f for f in rewrite if bool(f.get("delta")) == flag]
            if not group:
                continue
            src = self._read_raw(m, group)
            rewritten_expired += src.where(expired_pred).count()
            rel_out = f"data/expire-{snap}-{'delta' if flag else 'base'}"
            (
                src.where(~expired_pred)
                .withColumn("bucket", self._bucket(m["key"], m["n_buckets"]))
                .repartition(
                    max(1, len({f["bucket"] for f in group})), F.col("bucket")
                )
                .sortWithinPartitions(m["key"])
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(os.path.join(self.path, rel_out))
            )
            new_files.extend(
                self._scan_files(
                    rel_out, delta=flag, stat_cols="*", trunc_except=(m["key"],),
                    spec=self._current_spec(m), epoch=self._current_epoch(m),
                )
            )

        n_expired = dropped_rows + rewritten_expired
        now = time.time()
        ledger_rel = f"ledger/expire-{snap}.parquet"
        self._write_ledger_file(
            [{
                "partition": -1,
                "batch_id": m["version"] + 1,
                "max_lsn": int(wm if wm is not None else -1),
                "n_events": int(n_expired),
                "n_insert": 0,
                "n_update": 0,
                "n_delete": int(n_expired),
                "n_dedup": 0,
                "ok": True,
                "committed_at": _dt.datetime.fromtimestamp(
                    now, tz=_dt.timezone.utc
                ),
            }],
            ledger_rel,
        )
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            files=keep + new_files,
            ledger_files=m["ledger_files"] + [ledger_rel],
            summary={
                "operation": "expire_rows",
                "cutoff": cutoff.isoformat(),
                "n_expired": int(n_expired),
                "files_dropped": len(drop),
                "files_rewritten": len(rewrite),
                "files_untouched": len(keep),
            },
            committed_at_unix=now,
        )
        return self._commit_file_swap(
            nm,
            {f["path"] for f in (*drop, *rewrite)},
            new_files,
            ledger_add=[ledger_rel],
        )

    def expire_snapshots(
        self,
        keep_last: int = 1,
        older_than: "_dt.datetime | float | None" = None,
    ) -> int:
        """Delete manifests older than the last ``keep_last`` and any data
        files no longer referenced (Iceberg ``expire_snapshots`` analogue —
        the reference's hourly-partition TTL,
        /root/reference/fintick/bqloader/bqloader.py:9-13).

        ``older_than`` (datetime, naive = UTC, or unix seconds) adds
        Iceberg's age form: only snapshots COMMITTED before it are
        eligible, so ``keep_last`` becomes a floor rather than the
        policy — ``expire_snapshots(keep_last=1, older_than=now-5d)``
        is Iceberg's default "expire older than 5 days" shape. A recent
        snapshot is never dropped by count alone when it is younger
        than the cutoff."""
        cur = self.current_version()
        if cur is None:
            return 0
        keep_versions = set(range(max(0, cur - keep_last + 1), cur + 1))
        if older_than is not None:
            cutoff = (
                float(older_than) if isinstance(older_than, (int, float))
                else self._to_micros(older_than) / 1_000_000
            )
            for f in os.listdir(self.meta_dir):
                mm = re.fullmatch(r"v(\d+)\.json", f)
                if not mm:
                    continue
                v = int(mm.group(1))
                committed = self.manifest(v).get("committed_at_unix")
                if committed is None or float(committed) >= cutoff:
                    keep_versions.add(v)  # too young to expire
        # named refs pin snapshots: a tag's version stays readable until
        # the tag is dropped; a branch's base version stays so its staged
        # chain can still publish/diff against it
        for ref in self.refs().values():
            pinned = ref["version"] if ref["type"] == "tag" else ref["base_version"]
            if pinned <= cur:  # never resurrect a number above the head
                keep_versions.add(pinned)
        referenced: set[str] = set()
        # staged (write-audit-publish) snapshots are live pending commits:
        # their files must survive expiry even though no version references
        # them yet
        for v in [*keep_versions, *self.list_staged()]:
            mv = self.manifest(v)
            referenced |= {f["path"] for f in mv["files"]}
            referenced |= set(mv["ledger_files"])
        removed = 0
        # materialize any SURVIVING incremental manifest whose delta base
        # is being expired — its chain link would dangle. Ascending order
        # makes one pass transitive (a kept base was already fixed).
        for v in sorted(keep_versions):
            p = os.path.join(self.meta_dir, _fmt_version(v))
            if not os.path.exists(p):
                continue
            with open(p) as fh:
                raw = json.load(fh)
            if "files" in raw or raw["files_delta"]["base"] in keep_versions:
                continue
            raw["files"] = self.manifest(v)["files"]  # chain still intact
            raw.pop("files_delta", None)
            # content-equivalent rewrite, still atomic to readers
            self.backend.put(p, json.dumps(raw).encode())
        # drop old manifests (strict name match: never parse — let alone
        # delete — a stray non-manifest file)
        for f in list(os.listdir(self.meta_dir)):
            mm = re.fullmatch(r"v(\d+)\.json", f)
            if mm and int(mm.group(1)) not in keep_versions:
                os.remove(os.path.join(self.meta_dir, f))
        # drop unreferenced data files
        for sub in ("data", "ledger"):
            base = os.path.join(self.path, sub)
            for root, _d, files in os.walk(base, topdown=False):
                for fn in files:
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, self.path)
                    if fn.endswith(".parquet") and rel not in referenced:
                        os.remove(full)
                        removed += 1
                if not os.listdir(root) and root != base:
                    shutil.rmtree(root, ignore_errors=True)
        return removed

    def remove_orphans(
        self, older_than_secs: float = 3 * 24 * 3600, dry_run: bool = False
    ) -> dict[str, Any]:
        """Delete data/ledger parquet files referenced by NO retained
        snapshot (Iceberg ``remove_orphan_files`` analogue). Orphans come
        from crashes between data write and manifest rename, from
        optimistic-concurrency losers (``CommitConflictError``), and from
        abandoned write-audit-publish stages — none are reachable by any
        reader, but they accumulate storage.

        Unlike :meth:`expire_snapshots` (which GCs as a side effect of
        dropping history) this keeps EVERY retained version readable and
        applies an age threshold: a file younger than ``older_than_secs``
        (default 3 days, Iceberg's default) is never touched, because an
        unreferenced-but-recent file may be a concurrent writer's
        in-flight commit that simply hasn't renamed its manifest yet —
        deleting it would corrupt that commit at the moment it wins.
        Staged (WAP) snapshots are counted as referenced regardless of
        age: they are live pending commits by design.

        Metadata-only scan: O(retained manifests) JSON reads + one
        filesystem walk; no Spark job. Returns removal/skip counts and
        the removed paths (relative); ``dry_run`` reports without
        deleting.
        """
        cur = self.current_version()
        if cur is None:
            return {"removed": 0, "skipped_recent": 0, "paths": []}
        referenced: set[str] = set()
        bloom_dirs: set[str] = set()

        def _note(mv: dict[str, Any]) -> None:
            referenced.update(fl["path"] for fl in mv["files"])
            referenced.update(mv["ledger_files"])
            bd = (mv.get("blooms") or {}).get("dir")
            if bd:
                bloom_dirs.add(bd.rstrip("/"))

        for f in os.listdir(self.meta_dir):
            m = re.fullmatch(r"v(\d+)\.json", f)
            if not m:
                continue
            _note(self.manifest(int(m.group(1))))
        for tok in self.list_staged():
            _note(self.manifest(tok))
        cutoff = time.time() - older_than_secs
        removed: list[str] = []
        skipped = 0
        # blooms are swept here (not in expire_snapshots): dirs orphaned
        # by a failed/crashed build_blooms would otherwise accumulate
        # forever, and only this path's age threshold protects a build
        # currently in flight (written before its commit, like data files)
        for sub in ("data", "ledger", "blooms"):
            base = os.path.join(self.path, sub)
            for root, _d, files in os.walk(base, topdown=False):
                for fn in files:
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, self.path)
                    if not fn.endswith(".parquet") or rel in referenced:
                        continue
                    if sub == "blooms" and any(
                        rel.startswith(d + "/") for d in bloom_dirs
                    ):
                        continue  # inside a manifest-referenced bloom dir
                    if os.path.getmtime(full) > cutoff:
                        skipped += 1
                        continue
                    removed.append(rel)
                    if not dry_run:
                        os.remove(full)
                if not dry_run and root != base and not os.listdir(root):
                    shutil.rmtree(root, ignore_errors=True)
        return {
            "removed": len(removed),
            "skipped_recent": skipped,
            "paths": sorted(removed),
        }

    # ------------------------------------------------- column DDL (field ids)

    @staticmethod
    def _check_constraint_refs(m: dict[str, Any], col: str, verb: str) -> None:
        """Refuse DDL on a column a CHECK constraint references — the
        stored expression addresses it by name, so the rename/drop would
        silently break (or falsify) the constraint. Drop the constraint
        first, re-add it against the new name."""
        holders = [
            n
            for n, c in (m.get("constraints") or {}).items()
            if col in c.get("refs", ())
        ]
        if holders:
            raise ValueError(
                f"column {col!r} is referenced by CHECK constraint(s) "
                f"{sorted(holders)} and cannot be {verb}; drop_constraint first"
            )

    def _structural_cols(self, m: dict[str, Any]) -> set[str]:
        """Columns the engine's merge/fold/lineage machinery addresses by
        name: the merge key, the LWW order columns, internal lineage.
        Rename/drop is refused for these — the Iceberg rule that columns
        referenced by the partition spec or sort order cannot be dropped
        until the spec is evolved away from them."""
        return {m["key"], *ORDER_COLS, *_INTERNAL_COLS}

    def rename_column(self, old: str, new: str) -> dict[str, Any]:
        """Metadata-only column rename (Iceberg ``renameColumn``).

        No data file is touched: files written under the old name are
        resolved by FIELD ID at read time (:meth:`_read_raw` groups files
        by write-time schema epoch and aliases per group), so the rename
        is O(1) regardless of table size — at 100 TB this is one JSON
        commit, not a rewrite. Incoming merge batches bind by CURRENT
        name (Iceberg write semantics): after the rename a batch still
        carrying the old name evolves a NEW column of that name with a
        fresh field id, and old files' values do not leak into it.
        """
        m = self.manifest()
        self._ensure_field_ids(m)
        sch = T.StructType.fromJson(m["schema"])
        names = {f.name for f in sch.fields}
        if old not in names:
            raise ValueError(f"no column {old!r} to rename (have {sorted(names)})")
        if new in names or new in _INTERNAL_COLS:
            raise ValueError(f"column {new!r} already exists")
        if new in ("op", "partition", "bucket", "__key_hash__"):
            raise ValueError(f"column name {new!r} is reserved")
        if old in self._structural_cols(m):
            raise ValueError(
                f"column {old!r} is structural (merge key / LWW order / "
                "lineage) and cannot be renamed"
            )
        self._check_constraint_refs(m, old, "renamed")
        fields = [
            T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
            for f in sch.fields
        ]
        fids = dict(m["field_ids"])
        fids[new] = fids.pop(old)
        nm = dict(m)
        if old in (m.get("column_defaults") or {}):
            dfl = dict(m["column_defaults"])
            dfl[new] = dfl.pop(old)
            nm["column_defaults"] = dfl
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            schema=json.loads(T.StructType(fields).json()),
            field_ids=fids,
            schema_epochs=list(m["schema_epochs"])
            + [{str(i): n for n, i in fids.items()}],
            summary={
                "operation": "rename_column",
                "from": old,
                "to": new,
                "field_id": fids[new],
            },
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    def drop_column(self, name: str) -> dict[str, Any]:
        """Metadata-only column drop (Iceberg ``deleteColumn``): the
        column disappears from the current schema; data files keep the
        physical bytes (older snapshots still time-travel to it) and the
        read path simply never projects it. Re-adding the same name later
        (explicitly or via merge-batch schema evolution) creates a NEW
        field id, so pre-drop values never resurrect — the classic
        field-id correctness property this machinery exists for."""
        m = self.manifest()
        self._ensure_field_ids(m)
        sch = T.StructType.fromJson(m["schema"])
        if name not in {f.name for f in sch.fields}:
            raise ValueError(f"no column {name!r} to drop")
        if name in self._structural_cols(m):
            raise ValueError(
                f"column {name!r} is structural (merge key / LWW order / "
                "lineage) and cannot be dropped"
            )
        self._check_constraint_refs(m, name, "dropped")
        fields = [f for f in sch.fields if f.name != name]
        fids = dict(m["field_ids"])
        dropped_id = fids.pop(name)
        nm = dict(m)
        if name in (m.get("column_defaults") or {}):
            dfl = dict(m["column_defaults"])
            dfl.pop(name)
            nm["column_defaults"] = dfl
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            schema=json.loads(T.StructType(fields).json()),
            field_ids=fids,
            schema_epochs=list(m["schema_epochs"])
            + [{str(i): n for n, i in fids.items()}],
            summary={
                "operation": "drop_column",
                "column": name,
                "field_id": dropped_id,
            },
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    def add_column(
        self, name: str, dtype: "T.DataType | str", default: Any = None
    ) -> dict[str, Any]:
        """Metadata-only explicit column add (Iceberg ``addColumn``),
        completing the DDL triad with :meth:`rename_column` /
        :meth:`drop_column`. Merge batches already evolve new payload
        columns implicitly (``resolve_schema``); this is the declarative
        path for adding a column BEFORE any batch carries it.

        The column is appended NULLABLE (Iceberg's rule: a required
        column cannot be added to a non-empty table without a default,
        and existing files have no bytes for it) with a FRESH field id
        and a new schema epoch — so if ``name`` was previously dropped,
        the old files' values never resurrect: their epoch maps the old
        field id, not this one. Existing files read the column as null;
        no data file is touched — one JSON commit at any table size.

        ``default`` is an Iceberg-v3-style INITIAL DEFAULT: rows written
        BEFORE the column existed (file epoch predates the add) read this
        value instead of null — resolved at SCAN time from metadata, so
        it too costs zero rewrites at any table size. Rows written after
        the add keep whatever the writer supplied (a post-add null stays
        null — initial-default, not write-default, semantics). Any
        rewrite (compaction/z-order) reads through the default and
        therefore materializes it physically, which is exactly the
        Iceberg contract. Must be a JSON-plain scalar (str/int/float/
        bool), cast to ``dtype`` at read.

        ``dtype`` accepts a ``pyspark.sql.types.DataType`` or a DDL
        string (``"bigint"``, ``"array<double>"``).
        """
        if isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)
        if default is not None:
            default = _coerce_initial_default(default, dtype)
        m = self.manifest()
        self._ensure_field_ids(m)
        sch = T.StructType.fromJson(m["schema"])
        if name in {f.name for f in sch.fields} or name in _INTERNAL_COLS:
            raise ValueError(f"column {name!r} already exists")
        if name in ("op", "partition", "bucket", "__key_hash__"):
            # change-envelope / write-path names: a payload column with
            # one of these would be clobbered by the merge machinery
            raise ValueError(f"column name {name!r} is reserved")
        fields = list(sch.fields) + [T.StructField(name, dtype, True)]
        fids = dict(m["field_ids"])
        fids[name] = nxt = int(m["next_field_id"])
        nm = dict(m)
        if default is not None:
            dfl = dict(m.get("column_defaults") or {})
            dfl[name] = default
            nm["column_defaults"] = dfl
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            schema=json.loads(T.StructType(fields).json()),
            field_ids=fids,
            next_field_id=nxt + 1,
            schema_epochs=list(m["schema_epochs"])
            + [{str(i): n for n, i in fids.items()}],
            summary={
                "operation": "add_column",
                "column": name,
                "type": dtype.simpleString(),
                "field_id": nxt,
                **({"default": default} if default is not None else {}),
            },
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    # ------------------------------------------------- CHECK constraints

    @property
    def constraints(self) -> dict[str, str]:
        """``name -> SQL expression`` of every declared CHECK constraint."""
        return {
            n: c["expr"]
            for n, c in (self.manifest().get("constraints") or {}).items()
        }

    def _public_schema(self, m: dict[str, Any]) -> T.StructType:
        return T.StructType(
            [
                f
                for f in T.StructType.fromJson(m["schema"]).fields
                if f.name not in _INTERNAL_COLS
            ]
        )

    def _constraint_refs(self, expr: str, public: T.StructType) -> list[str]:
        """Public columns ``expr`` references, found by resolution
        probing: the expression is analyzed against the public schema
        with each column removed in turn — failing to resolve without
        column ``c`` means ``c`` is referenced. Driver-only analyses over
        empty frames, O(columns); no data is read. Also validates that
        the expression resolves at all and is boolean-typed."""
        base = self.spark.createDataFrame([], public)
        try:
            out_t = base.select(F.expr(expr).alias("_c")).schema["_c"].dataType
        except Exception as e:
            raise ValueError(
                f"constraint expression does not resolve against the "
                f"table schema: {expr!r} ({e})"
            ) from None
        if not isinstance(out_t, T.BooleanType):
            raise ValueError(
                f"constraint expression must be boolean, got "
                f"{out_t.simpleString()}: {expr!r}"
            )
        refs = []
        for f in public.fields:
            probe = self.spark.createDataFrame(
                [], T.StructType([g for g in public.fields if g.name != f.name])
            )
            try:
                probe.select(F.expr(expr)).schema  # noqa: B018 (forces analysis)
            except Exception:
                refs.append(f.name)
        return refs

    def add_constraint(
        self, name: str, expr: str, validate: bool = True
    ) -> dict[str, Any]:
        """Declare a CHECK constraint (Delta ``ALTER TABLE … ADD
        CONSTRAINT`` analogue): a SQL boolean expression over PUBLIC
        columns that every row landing in the table must satisfy. SQL
        CHECK semantics: a row violates only when the expression
        evaluates to FALSE — NULL (unknown) passes, so constraints stay
        sound across additive schema evolution (older batches' conformed
        nulls don't trip them).

        Enforced by every future :meth:`merge_apply` (and everything
        riding it: the CDC pipeline, :meth:`merge_into`, row-level DML,
        SCD2 refreshes) under the writer's ``on_violation`` policy.
        Delete tombstones are exempt (they carry no payload). ``validate``
        (default, Delta's rule) first verifies CURRENT live rows — one
        full scan; a violating table refuses the DDL, reporting the count.

        Metadata-only commit. Referenced columns become rename/drop-
        protected until the constraint is dropped (the Iceberg rule for
        spec-referenced columns, applied to constraints). ``lake_sink``
        cannot evaluate SQL in its Arrow tasks and fails closed on
        constrained tables (see lake/stream_sink.py)."""
        if not name or not re.fullmatch(r"[A-Za-z0-9_.\-]+", name):
            raise ValueError(
                f"constraint name must be [A-Za-z0-9_.-]+, got {name!r}"
            )
        m = self.manifest()
        cons = dict(m.get("constraints") or {})
        if name in cons:
            raise ValueError(f"constraint {name!r} already exists")
        refs = self._constraint_refs(expr, self._public_schema(m))
        validated = bool(validate and m["files"])
        if validated:
            n_bad = (
                self.read()
                .where(~F.coalesce(F.expr(expr), F.lit(True)))
                .count()
            )
            if n_bad:
                raise ConstraintViolationError(
                    f"cannot add constraint {name!r}: {n_bad} live row(s) "
                    f"violate {expr!r}"
                )
        cons[name] = {"expr": expr, "refs": refs}
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            constraints=cons,
            summary={
                "operation": "add_constraint",
                "name": name,
                "expr": expr,
                "refs": refs,
                "validated": validated,
            },
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    def drop_constraint(self, name: str) -> dict[str, Any]:
        """Remove a CHECK constraint — metadata-only commit; releases the
        rename/drop protection on its referenced columns."""
        m = self.manifest()
        cons = dict(m.get("constraints") or {})
        if name not in cons:
            raise ValueError(f"no constraint {name!r} (have {sorted(cons)})")
        cons.pop(name)
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            constraints=cons,
            summary={"operation": "drop_constraint", "name": name},
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    def _constraint_gate(
        self,
        incoming: DataFrame,
        cons: dict[str, dict[str, Any]],
        on_violation: str,
        batch_id: int,
        key: str,
        info: dict[str, Any],
    ) -> DataFrame:
        """Apply the table's CHECK constraints to the batch's conformed
        LWW winners (post-enrich, pre-write — constraints never re-judge
        current rows, and a violating event that LOSES batch LWW is a
        no-op, same as any superseded event). Placement: pre-exchange on
        incremental batches; post-exchange on the deferred-enrich
        bootstrap path, where the merged frame provably holds only batch
        winners (see merge_apply) — same judged set either way.

        Policies and their cost:

        - ``fail``: a lazy per-row ``raise_error`` folded into the
          ``lsn`` projection — ZERO extra scans when the batch is clean
          (the common case pays one vectorized boolean per written row);
          a violation aborts the merge write job before any commit.
          Because ``lsn`` is also the LWW sort key, the check fires for
          every batch winner entering the merge, including ones a
          CURRENT row would out-rank.
        - ``quarantine``: one extra pass over batch winners (violator
          scan + parquet write to ``quarantine/batch-<id>`` with the
          violated names and batch id; overwrite mode, so a crash-replay
          rewrites the same files instead of duplicating). The ledger's
          op counts are classified BEFORE the gate (the narrow stats pass
          cannot evaluate payload constraints); the summary carries
          ``n_quarantined`` separately.
        - ``drop``: violators silently filtered, one extra filter, no
          count (use quarantine when you need the evidence).
        """
        if on_violation not in ("fail", "quarantine", "drop"):
            raise ValueError(
                f"on_violation must be fail|quarantine|drop, got {on_violation!r}"
            )
        checks = {
            n: F.coalesce(F.expr(c["expr"]), F.lit(True))
            for n, c in sorted(cons.items())
        }
        all_ok = F.lit(True)
        for ok in checks.values():
            all_ok = all_ok & ok
        viol = (~F.col("is_deleted")) & ~all_ok
        info["constraints_checked"] = sorted(cons)
        if on_violation == "fail":
            names = F.concat_ws(
                ",", *[F.when(~ok, F.lit(n)) for n, ok in checks.items()]
            )
            msg = F.concat(
                F.lit(f"{_VIOLATION_MARKER}: key="),
                F.col(key).cast("string"),
                F.lit(" failed ["),
                names,
                F.lit("]"),
            )
            return incoming.withColumn(
                "lsn",
                F.when(viol, F.raise_error(msg).cast("long")).otherwise(
                    F.col("lsn")
                ),
            )
        if on_violation == "quarantine":
            import pyarrow.parquet as _pq

            # materialize the upstream ONCE: the violator write below and
            # the merge's main write would otherwise each execute the full
            # plan (scan → LWW agg → semi-join → enrich UDF; plus the
            # union+window on the deferred-enrich path) — roughly doubling
            # batch latency even when zero rows violate
            incoming = incoming.localCheckpoint(eager=True)
            qrel = f"quarantine/batch-{batch_id}"
            qdir = os.path.join(self.path, qrel)
            names_arr = F.array_compact(
                F.array(*[F.when(~ok, F.lit(n)) for n, ok in checks.items()])
            )
            (
                # drop merge-internal columns (present when the gate runs
                # post-exchange on the deferred-enrich path) so quarantine
                # contents are uniform across gate placements
                incoming.where(viol)
                .drop("_pk", "bucket")
                .withColumn("_violated", names_arr)
                .withColumn("_batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .parquet(qdir)
            )
            n_q = 0
            for fn in os.listdir(qdir):
                if fn.endswith(".parquet"):
                    n_q += _pq.ParquetFile(os.path.join(qdir, fn)).metadata.num_rows
            if n_q:
                info["n_quarantined"] = n_q
                info["quarantine_path"] = qrel
            else:
                shutil.rmtree(qdir, ignore_errors=True)
                info["n_quarantined"] = 0
            return incoming.where(~viol)
        return incoming.where(~viol)

    def quarantine(self) -> DataFrame:
        """Every quarantined row (``on_violation='quarantine'`` merges):
        the row's public payload plus ``_violated`` (constraint names)
        and ``_batch_id``. Schemas merge across batches (quarantined
        batches may span schema evolution)."""
        qroot = os.path.join(self.path, "quarantine")
        subdirs = (
            [
                os.path.join(qroot, d)
                for d in sorted(os.listdir(qroot))
                if os.path.isdir(os.path.join(qroot, d))
            ]
            if os.path.isdir(qroot)
            else []
        )
        subdirs = [
            d
            for d in subdirs
            if any(f.endswith(".parquet") for f in os.listdir(d))
        ]
        if not subdirs:
            return self.spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("_batch_id", T.LongType()),
                        T.StructField("_violated", T.ArrayType(T.StringType())),
                    ]
                ),
            )
        return self.spark.read.option("mergeSchema", "true").parquet(*subdirs)

    def evolve_bucket_spec(self, n_buckets: int) -> dict[str, Any]:
        """LAZY bucket-layout evolution — a METADATA-ONLY commit (Iceberg
        partition evolution analogue; contrast :meth:`rebucket`, the eager
        O(table) rewrite). Appends a new spec ``{spec_id: n_buckets}`` and
        makes it current; no data file is read, written, or dropped.

        From the next merge on:

        - new files are written under the new spec;
        - file pruning stays EXACT: a merge hashes its batch keys under
          every spec still present in the file list, so an old-spec file
          is touched iff it can hold a batch key — and a touched file is
          rewritten entirely under the CURRENT spec, migrating lazily at
          zero extra cost (the rewrite was happening anyway);
        - point lookups hash the probe key under each file's own spec;
        - read-side bucket pruning and MoR fold-grouping use bucket-class
          intersection — exact when the new count is a multiple or
          divisor of the old (``pmod(h, q·n) % n == pmod(h, n)``),
          conservative (no pruning between those two specs) otherwise.
          Prefer doubling/halving chains at scale.

        ``compact_files`` / ``rewrite_clustered`` / ``rebucket`` finish
        the migration in one pass when wanted. At 100 TB this op is the
        difference between growing the merge-stage width in O(1) and
        scheduling a 100 TB rewrite before the table can scale out.

        Reference analogue: none — the reference recreates tables by hand
        (/root/reference/fintick/bqloader/base.py:60-77)."""
        m = self.manifest()
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        specs = self._specs(m)
        cur = self._current_spec(m)
        if n_buckets == specs[cur]:
            return {"operation": "evolve_bucket_spec", "n_buckets": n_buckets,
                    "skipped": True}
        new_id = max(specs) + 1
        specs[new_id] = n_buckets
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            n_buckets=n_buckets,
            bucket_specs={str(k): v for k, v in specs.items()},
            current_spec=new_id,
            summary={"operation": "evolve_bucket_spec",
                     "spec_id": new_id,
                     "n_buckets_before": specs[cur],
                     "n_buckets": n_buckets,
                     "live_files_on_old_specs": len(m["files"])},
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    def rebucket(self, n_buckets: int) -> dict[str, Any]:
        """Bucket-layout evolution: rewrite the table into ``n_buckets``
        hash buckets. The bucket count is the table's parallelism knob
        (merge-stage width, file pruning granularity); a table that grew
        100× since creation needs more buckets than it started with.

        One full rewrite — a single shuffle keyed by the NEW bucket, the
        same exchange shape as a merge, cost O(live table) once. (Iceberg
        partition evolution instead applies the new spec lazily to new
        files only; with hash buckets that would make every merge prune
        and rewrite under BOTH specs until compaction finishes the
        migration — this engine takes the one-shot rewrite for plan
        simplicity, scheduled like any other maintenance op.) Delta files
        are folded in (the rewrite IS a major compaction); tombstones are
        kept — replay semantics survive the new layout."""
        m = self.manifest()
        if n_buckets == m["n_buckets"]:
            return {"operation": "rebucket", "n_buckets": n_buckets,
                    "skipped": True}
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        df = self.read_physical(fold=True)
        snap = str(uuid.uuid4())[:8]
        rel_out = f"data/rebucket-{snap}"
        (
            df.withColumn("bucket", self._bucket(m["key"], n_buckets))
            .repartition(n_buckets, F.col("bucket"))
            .sortWithinPartitions(m["key"])
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(os.path.join(self.path, rel_out))
        )
        # spec bookkeeping: on an evolved table the eager rewrite lands
        # everything on one fresh spec (the chain stays append-only); a
        # never-evolved table keeps the implicit spec-0 model
        spec_extra: dict[str, Any] = {}
        new_spec = 0
        if m.get("bucket_specs"):
            specs = self._specs(m)
            new_spec = max(specs) + 1
            specs[new_spec] = n_buckets
            spec_extra = {
                "bucket_specs": {str(k): v for k, v in specs.items()},
                "current_spec": new_spec,
            }
        new_files = self._scan_files(
            rel_out, stat_cols="*", trunc_except=(m["key"],), spec=new_spec,
            epoch=self._current_epoch(m),
        )
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            n_buckets=n_buckets,
            files=new_files,
            **spec_extra,
            summary={"operation": "rebucket",
                     "n_buckets_before": m["n_buckets"],
                     "n_buckets": n_buckets,
                     "files_after": len(new_files)},
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    def rewrite_clustered(
        self,
        by: str | list[str] = "warc_ts",
        max_rows_per_file: int = 100_000,
        zorder: bool = False,
    ) -> dict[str, Any]:
        """Cluster each bucket's data by ``by`` (default event time) into
        rolled files — the Iceberg sort-order rewrite. Merges write
        key-sorted buckets (tight KEY ranges → point-lookup skipping);
        this maintenance op re-sorts each bucket by TIME and rolls a new
        file every ``max_rows_per_file`` rows, so each file covers a
        narrow time slice and :meth:`scan` prunes WITHIN buckets from the
        manifest stats — the layout for read-mostly/archived tables whose
        queries are time-ranged.

        Trade-off (documented, not hidden): key ranges per file widen to
        ~full-bucket, so :meth:`lookup` reads every file of the key's
        bucket again (one bucket, not the table). The next MERGE into a
        bucket restores key order for that bucket — clustering is a
        read-optimization pass, not an invariant.

        ``zorder=True`` with ``by`` a list of 2-4 columns removes the
        trade-off's sharp edge: each column maps to a 16-bit dimension
        code (strings → top bits of ``xxhash64``; timestamps/numerics →
        min-max linear scale) and rows sort by the Morton interleave of
        the codes, so every rolled file covers a small RECTANGLE of the
        key×time space instead of a stripe — both point lookups and
        time-range scans prune to ~sqrt(files) within a bucket (the
        Iceberg/Delta z-order rewrite). Because hash order has nothing to
        do with lexicographic order, the manifest additionally records
        per-file min/max of ``xxhash64(key)`` (reserved stats entry
        ``__key_hash__``, one column-pruned pass over the just-written
        files) and :meth:`lookup` prunes on the probe key's hash against
        those bounds. All dimension codes are deterministic JVM
        expressions — no Python in the rewrite.

        One shuffle keyed by bucket (same exchange shape as a merge),
        deltas folded in, tombstones kept — replay semantics survive.
        """
        m = self.manifest()
        df = self.read_physical(fold=True)
        snap = str(uuid.uuid4())[:8]
        rel_out = f"data/cluster-{snap}"
        if zorder:
            cols = [by] if isinstance(by, str) else list(by)
            if not 2 <= len(cols) <= 4:
                raise ValueError(
                    f"zorder needs 2-4 columns, got {cols!r}"
                )
            order = [self._morton_code(df, cols).alias("_zorder")]
            by_label = "+".join(cols)
        else:
            if not isinstance(by, str):
                raise ValueError("plain clustering takes a single column")
            order = [F.col(by), F.col(m["key"])]
            by_label = by
        (
            df.withColumn("bucket", self._bucket(m["key"], m["n_buckets"]))
            .repartition(m["n_buckets"], F.col("bucket"))
            .withColumn("_ord0", order[0])
            .sortWithinPartitions("_ord0", *order[1:])
            .drop("_ord0")
            .write.option("maxRecordsPerFile", max_rows_per_file)
            .partitionBy("bucket")
            .mode("overwrite")
            .parquet(os.path.join(self.path, rel_out))
        )
        new_files = self._scan_files(
            rel_out, stat_cols="*", trunc_except=(m["key"],),
            spec=self._current_spec(m), epoch=self._current_epoch(m),
        )
        if zorder:
            self._attach_key_hash_stats(new_files, rel_out, m["key"])
        nm = dict(m)
        nm.update(
            version=m["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=m["version"],
            files=new_files,
            summary={
                "operation": "rewrite_clustered",
                "cluster_by": by_label,
                "zorder": zorder,
                "files_after": len(new_files),
            },
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    _Z_BITS = 16  # per-dimension resolution; 4 dims still fit a long

    def _morton_code(self, df: DataFrame, cols: list[str]) -> F.Column:
        """Morton (bit-interleaved) sort key over ``cols``. Each column
        becomes a ``_Z_BITS``-bit code: strings via the top bits of
        ``xxhash64`` (uniform regardless of skew — urls share long
        prefixes, so Iceberg's first-8-bytes mapping would collapse),
        timestamps/numerics via min-max linear scaling (bounds from one
        tiny agg; nulls sort first). Pure Catalyst expressions —
        constant-folded literals + bit ops inside whole-stage codegen."""
        dtypes = dict(df.dtypes)
        codes: list[F.Column] = []
        numeric: list[str] = []
        for c in cols:
            if c not in dtypes:
                raise ValueError(f"zorder column {c!r} not in table")
            if dtypes[c] == "string":
                codes.append(
                    F.shiftrightunsigned(F.xxhash64(F.col(c)), 64 - self._Z_BITS)
                )
            else:
                numeric.append(c)
                codes.append(None)  # filled after bounds are known
        if numeric:
            aggs = []
            for c in numeric:
                v = (
                    F.unix_micros(F.col(c))
                    if dtypes[c].startswith("timestamp")
                    else F.col(c).cast("long")
                )
                aggs += [F.min(v).alias(f"lo_{c}"), F.max(v).alias(f"hi_{c}")]
            bounds = df.agg(*aggs).first()
            top = (1 << self._Z_BITS) - 1
            for i, c in enumerate(cols):
                if codes[i] is not None:
                    continue
                lo = bounds[f"lo_{c}"] or 0
                span = max((bounds[f"hi_{c}"] or 0) - lo, 1)
                v = (
                    F.unix_micros(F.col(c))
                    if dtypes[c].startswith("timestamp")
                    else F.col(c).cast("long")
                )
                codes[i] = F.coalesce(
                    (
                        (v - F.lit(lo)).cast("double") * F.lit(top) / F.lit(span)
                    ).cast("long"),
                    F.lit(0),
                )
        k = len(codes)
        z: F.Column | None = None
        for bit in range(self._Z_BITS - 1, -1, -1):
            for j, code in enumerate(codes):
                piece = F.shiftleft(
                    F.shiftright(code, bit).bitwiseAND(F.lit(1)),
                    bit * k + (k - 1 - j),
                )
                z = piece if z is None else z.bitwiseOR(piece)
        return z

    def _attach_key_hash_stats(
        self, files: list[dict[str, Any]], rel_dir: str, key: str
    ) -> None:
        """Record per-file min/max of ``xxhash64(key)`` (reserved stats
        name ``__key_hash__``) for just-written z-ordered files. Parquet
        footers can't provide these (the hash is not a physical column),
        so it's one column-pruned scan of files still hot in page cache;
        O(files) rows reach the driver."""
        rows = (
            self.spark.read.parquet(os.path.join(self.path, rel_dir))
            .select(
                F.input_file_name().alias("f"),
                F.xxhash64(F.col(key)).alias("h"),
            )
            .groupBy("f")
            .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
            .collect()
        )
        by_rel = {}
        for r in rows:
            p = r["f"]
            p = p[len("file:"):] if p.startswith("file:") else p
            by_rel[os.path.relpath(p, self.path)] = [r["lo"], r["hi"]]
        for f in files:
            b = by_rel.get(f["path"])
            if b is not None:
                f.setdefault("stats", {})["__key_hash__"] = b

    def stats(self, read_footers: bool = False) -> dict[str, Any]:
        """Table health snapshot from METADATA only (no Spark job): size,
        file counts, per-bucket byte skew (hot-domain detection — the
        north_rule's skew knob needs a signal before it needs a salt),
        delta backlog, applied-batch/watermark summary.

        ``read_footers=True`` additionally sums parquet-footer row counts
        (driver-side, O(files) footer opens, still no data read)."""
        m = self.manifest()
        multi_spec = len(self._specs(m)) > 1
        per_bucket: dict[Any, dict[str, int]] = {}
        for f in m["files"]:
            # post-evolution, bucket ids alias across specs — key by
            # "spec:bucket" then so the skew signal stays per-class
            bk = (
                f"{self._file_spec(f)}:{f['bucket']}" if multi_spec
                else f["bucket"]
            )
            b = per_bucket.setdefault(
                bk, {"files": 0, "bytes": 0, "delta_files": 0}
            )
            b["files"] += 1
            b["bytes"] += f["bytes"]
            if f.get("delta"):
                b["delta_files"] += 1
        sizes = [b["bytes"] for b in per_bucket.values()]
        mean = (sum(sizes) / len(sizes)) if sizes else 0.0
        out: dict[str, Any] = {
            "version": m["version"],
            "write_mode": m.get("write_mode", "cow"),
            "n_buckets": m["n_buckets"],
            **(
                {"bucket_specs": {str(k): v for k, v in self._specs(m).items()},
                 "current_spec": self._current_spec(m)}
                if multi_spec else {}
            ),
            "buckets_with_data": len(per_bucket),
            "total_files": len(m["files"]),
            "total_bytes": sum(sizes),
            "delta_files": sum(b["delta_files"] for b in per_bucket.values()),
            "max_bucket_bytes": max(sizes, default=0),
            "bucket_skew": round(max(sizes, default=0) / mean, 3) if mean else 0.0,
            "applied_batches": len(m["applied_batches"]),
            "lsn_watermark": self._applied_lsn_watermark(m),
            "per_bucket": per_bucket,
        }
        if read_footers:
            import pyarrow.parquet as pq

            out["total_rows"] = sum(
                f["rows"]
                if "rows" in f
                else pq.ParquetFile(
                    os.path.join(self.path, f["path"])
                ).metadata.num_rows
                for f in m["files"]
            )
        return out

    def history(self) -> list[dict[str, Any]]:
        """Snapshot log, oldest→newest (Iceberg ``history`` metadata table
        analogue): one row per retained manifest with its operation
        summary — the audit trail a replay or incident review starts
        from. O(retained versions) JSON reads, no Spark job."""
        if not os.path.isdir(self.meta_dir):
            return []
        versions = sorted(
            int(m.group(1))
            for f in os.listdir(self.meta_dir)
            if (m := re.fullmatch(r"v(\d+)\.json", f))
        )
        out = []
        for v in versions:
            m = self.manifest(v)
            out.append(
                {
                    "version": v,
                    "snapshot_id": m["snapshot_id"],
                    "parent_version": m["parent_version"],
                    "committed_at_unix": m.get("committed_at_unix"),
                    "operation": (m.get("summary") or {}).get("operation"),
                    "summary": m.get("summary") or {},
                    "n_files": len(m["files"]),
                }
            )
        return out

    def metadata_table(
        self, name: str, version: int | str | None = None
    ) -> DataFrame:
        """Iceberg metadata-tables analogue: the table's own metadata as
        queryable DataFrames, so operational introspection composes with
        SQL instead of reading JSON by hand.

        - ``files``: one row per data file of the chosen snapshot (path,
          bucket, spec, epoch, bytes, rows, delta flag, per-column
          min/max stats as a JSON string — stats are heterogenous, the
          JSON keeps the schema stable);
        - ``snapshots``: the retained version log (= :meth:`history`);
        - ``refs``: named tags/branches;
        - ``partitions``: per (spec, bucket) aggregates — file/byte/delta
          counts and row sums, the skew view `stats()` summarizes;
        - ``columns``: the schema with its DDL bookkeeping — field id,
          type, nullability, initial default, structural/internal flags —
          one row per current column (the `DESCRIBE EXTENDED` face of
          the field-id machinery);
        - ``constraints``: declared CHECK constraints (name, expression,
          referenced columns);
        - ``ledger``: alias for :meth:`ledger`.

        All driver-side manifest reads parallelized by Spark only at
        query time — O(files) rows of metadata, never data bytes.

        Also reachable with no ``LakeTable`` handle at all through the
        ``lake`` format: ``spark.read.format("lake").option("path", …)
        .option("metadataTable", "files")`` (lake/batch_source.py) —
        both faces share :meth:`_metadata_rows`."""
        if name == "ledger":
            return self.ledger()
        schema, rows = self._metadata_rows(name, version)
        return self.spark.createDataFrame(rows, schema)

    def _metadata_rows(
        self, name: str, version: int | str | None = None
    ) -> tuple[T.StructType, list[tuple]]:
        """(schema, rows) for the pure-metadata tables — no SparkSession
        needed (the ``lake`` format's planner runs without one)."""
        if name == "files":
            m = self.manifest(version)
            rows = [
                (
                    f["path"], int(f["bucket"]), self._file_spec(f),
                    self._file_epoch(f), int(f["bytes"]),
                    int(f["rows"]) if "rows" in f else None,
                    bool(f.get("delta")),
                    json.dumps(f["stats"]) if f.get("stats") else None,
                    json.dumps(f["nulls"]) if f.get("nulls") else None,
                )
                for f in m["files"]
            ]
            schema = T.StructType([
                T.StructField("path", T.StringType(), False),
                T.StructField("bucket", T.IntegerType(), False),
                T.StructField("spec_id", T.IntegerType(), False),
                T.StructField("schema_epoch", T.IntegerType(), False),
                T.StructField("bytes", T.LongType(), False),
                T.StructField("rows", T.LongType(), True),
                T.StructField("is_delta", T.BooleanType(), False),
                T.StructField("stats_json", T.StringType(), True),
                T.StructField("null_counts_json", T.StringType(), True),
            ])
            return schema, rows
        if name == "snapshots":
            rows = [
                (
                    int(h["version"]), h["snapshot_id"],
                    int(h["parent_version"]) if h["parent_version"] is not None else None,
                    float(h["committed_at_unix"]) if h.get("committed_at_unix") else None,
                    h["operation"], int(h["n_files"]),
                    json.dumps(h["summary"]),
                )
                for h in self.history()
            ]
            schema = T.StructType([
                T.StructField("version", T.LongType(), False),
                T.StructField("snapshot_id", T.StringType(), False),
                T.StructField("parent_version", T.LongType(), True),
                T.StructField("committed_at_unix", T.DoubleType(), True),
                T.StructField("operation", T.StringType(), True),
                T.StructField("n_files", T.LongType(), False),
                T.StructField("summary_json", T.StringType(), False),
            ])
            return schema, rows
        if name == "refs":
            rows = [
                (
                    r["name"], r["type"],
                    int(r["version"]) if r["type"] == "tag" else None,
                    int(r["base_version"]) if r["type"] == "branch" else None,
                    len(r.get("tokens") or []) if r["type"] == "branch" else None,
                )
                for r in self.refs().values()
            ]
            schema = T.StructType([
                T.StructField("name", T.StringType(), False),
                T.StructField("type", T.StringType(), False),
                T.StructField("version", T.LongType(), True),
                T.StructField("base_version", T.LongType(), True),
                T.StructField("staged_tokens", T.LongType(), True),
            ])
            return schema, rows
        if name == "partitions":
            m = self.manifest(version)
            agg: dict[tuple[int, int], list[int]] = {}
            for f in m["files"]:
                k = (self._file_spec(f), int(f["bucket"]))
                a = agg.setdefault(k, [0, 0, 0, 0, 0])
                a[0] += 1
                a[1] += int(f["bytes"])
                a[2] += 1 if f.get("delta") else 0
                if "rows" in f:
                    a[3] += int(f["rows"])
                else:
                    a[4] = 1  # rows unknown for ≥1 file
            rows = [
                (s, b, a[0], a[1], a[2], None if a[4] else a[3])
                for (s, b), a in sorted(agg.items())
            ]
            schema = T.StructType([
                T.StructField("spec_id", T.IntegerType(), False),
                T.StructField("bucket", T.IntegerType(), False),
                T.StructField("n_files", T.LongType(), False),
                T.StructField("bytes", T.LongType(), False),
                T.StructField("n_delta_files", T.LongType(), False),
                T.StructField("rows", T.LongType(), True),
            ])
            return schema, rows
        if name == "columns":
            m = self.manifest(version)
            sch = T.StructType.fromJson(m["schema"])
            fids = m.get("field_ids") or {}
            dfl = m.get("column_defaults") or {}
            structural = self._structural_cols(m)
            rows = [
                (
                    f.name,
                    int(fids[f.name]) if f.name in fids else None,
                    f.dataType.simpleString(),
                    bool(f.nullable),
                    json.dumps(dfl[f.name]) if f.name in dfl else None,
                    f.name in structural,
                    f.name in _INTERNAL_COLS,
                )
                for f in sch.fields
            ]
            schema = T.StructType([
                T.StructField("name", T.StringType(), False),
                T.StructField("field_id", T.LongType(), True),
                T.StructField("type", T.StringType(), False),
                T.StructField("nullable", T.BooleanType(), False),
                T.StructField("initial_default_json", T.StringType(), True),
                T.StructField("is_structural", T.BooleanType(), False),
                T.StructField("is_internal", T.BooleanType(), False),
            ])
            return schema, rows
        if name == "constraints":
            m = self.manifest(version)
            rows = [
                (n, c["expr"], json.dumps(c.get("refs") or []))
                for n, c in sorted((m.get("constraints") or {}).items())
            ]
            schema = T.StructType([
                T.StructField("name", T.StringType(), False),
                T.StructField("expr", T.StringType(), False),
                T.StructField("refs_json", T.StringType(), False),
            ])
            return schema, rows
        raise ValueError(
            f"unknown metadata table {name!r}; one of files, snapshots, "
            "refs, partitions, columns, constraints, ledger"
        )

    def rollback(self, version: int | str) -> dict[str, Any]:
        """Restore the table to an older snapshot as a NEW commit (Iceberg
        ``rollback_to_snapshot`` analogue). Nothing is rewritten: the new
        manifest points back at the target version's file list, schema,
        watermarks and applied-batch set — O(1) metadata, any data volume.

        Because ``applied_batches`` reverts too, batches applied after the
        target version re-apply cleanly on replay (the exactly-once guard
        tracks *table state*, not wall-clock history). History stays
        linear: the rollback commit's parent is the current version, so
        time travel across the rollback still works until
        :meth:`expire_snapshots` prunes it."""
        if isinstance(version, str):  # tag name → pinned version number
            ref = self._load_ref(version, missing_ok=True)
            if ref is not None and ref["type"] == "tag":
                version = ref["version"]
        target = self.manifest(version)  # raises if expired
        cur = self.manifest()
        nm = dict(target)
        # a branch name / WAP token resolves to a STAGED manifest: the
        # committed rollback must not carry its "staged" pointer (a later
        # discard_staged/drop_ref would rmtree the data dir this commit
        # references), nor a delta chain alongside the materialized list
        nm.pop("staged", None)
        nm.pop("files_delta", None)
        nm.update(
            version=cur["version"] + 1,
            snapshot_id=str(uuid.uuid4()),
            parent_version=cur["version"],
            summary={
                "operation": "rollback",
                "to_version": version,
                "from_version": cur["version"],
            },
            committed_at_unix=time.time(),
        )
        self._write_manifest(nm)
        return nm["summary"]

    # ------------------------------------------------------- change feed

    def changes_between(
        self,
        from_version: int,
        to_version: int | None = None,
        row_meta: bool = False,
    ) -> DataFrame:
        """Row-level change feed between two snapshots (Delta/Iceberg CDF
        analogue, computed from snapshots rather than stored): one row per
        changed key per commit in ``(from_version, to_version]``, with

        - ``_change_type`` ∈ ``insert`` | ``update_preimage`` |
          ``update_postimage`` | ``delete`` (updates emit both images),
        - ``_commit_version`` = the commit that produced the change,

        plus the public columns at that commit's schema. This is what a
        downstream incremental consumer reads instead of re-scanning the
        table — the engine's own ledger gives per-batch counts; this gives
        the rows.

        ``row_meta=True`` (additive, off by default — existing consumers
        see the identical schema) appends two lineage columns an SCD2 /
        history consumer needs:

        - ``_row_lsn`` — the emitted image's OWN ``lsn`` (pre-images the
          old version's, post-images/inserts the new one's): a stable
          identity for "the version of this key that this image shows",
          which the public payload cannot provide (``lsn`` is internal).
        - ``_tombstone_ts`` — for ``delete`` rows, the deletion event's
          timestamp (the tombstone row's ``warc_ts`` — the payload is the
          pre-image, whose ``warc_ts`` is the *deleted version's* time,
          not the deletion's). Null otherwise, and for deletes whose
          tombstone was physically dropped in the same commit (row TTL).

        Scale design: for each commit the diff touches ONLY the buckets
        whose file set changed at that commit (a pure manifest diff — no
        data read for untouched buckets), reads the two adjacent versions
        of just those buckets, and classifies via a full-outer join on the
        key. Change detection compares the LWW order rank (``warc_ts``,
        ``lsn``) — never payload bytes — so unchanged keys inside a
        rewritten bucket cost two scalar comparisons. Per-commit cost is
        O(live rows of touched
        buckets), the same bound as the merge that produced the commit.
        """
        cur = self.current_version()
        to_version = cur if to_version is None else to_version
        if not 0 <= from_version <= to_version <= cur:
            raise ValueError(
                f"bad change range ({from_version}, {to_version}] at v{cur}"
            )

        parts: list[DataFrame] = []
        for v in range(from_version + 1, to_version + 1):
            m_new = self.manifest(v)
            m_old = self.manifest(v - 1)
            public = [
                f.name
                for f in T.StructType.fromJson(m_new["schema"]).fields
                if f.name not in _INTERNAL_COLS
            ]
            changed = self._changed_classes(m_old, m_new)
            if not changed:  # metadata-only commit (e.g. rollback no-op)
                continue

            key = m_new["key"]
            phys = self._physical_schema(m_new)
            # old side conformed to the NEW physical schema: added columns
            # read as null, widened types promoted — the diff is expressed
            # in the newer schema, like Iceberg CDF after evolution.
            o = self.read_physical(
                files=self._class_touched(m_old, changed), version=v - 1
            )
            if m_old.get("field_ids") and m_new.get("field_ids"):
                # conform binds by name; across a rename boundary map the
                # old side's names to the new side's BY FIELD ID first so
                # the renamed column diffs against itself, not a null.
                old_by_id = {fid: n for n, fid in m_old["field_ids"].items()}
                ren = {
                    old_by_id[fid]: n
                    for n, fid in m_new["field_ids"].items()
                    if fid in old_by_id and old_by_id[fid] != n
                }
                if ren:
                    o = o.withColumnsRenamed(ren)
            o = conform(o, phys)
            n = self.read_physical(
                files=self._class_touched(m_new, changed), version=v
            )
            o_side = o.select(
                F.col(key).alias("_k"),
                F.col("lsn").alias("_olsn"),
                F.col("is_deleted").alias("_odel"),
                F.struct(*[F.col(c) for c in public]).alias("_op"),
            )
            n_side = n.select(
                F.col(key).alias("_k"),
                F.col("lsn").alias("_nlsn"),
                F.col("is_deleted").alias("_ndel"),
                F.struct(*[F.col(c) for c in public]).alias("_np"),
            )
            j = o_side.join(n_side, on="_k", how="full_outer")
            old_live = F.col("_olsn").isNotNull() & ~F.coalesce(
                F.col("_odel"), F.lit(True)
            )
            new_live = F.col("_nlsn").isNotNull() & ~F.coalesce(
                F.col("_ndel"), F.lit(True)
            )
            # change detection compares the LWW ORDER RANK (warc_ts, lsn)
            # — never payload bytes. lsn alone misses an update that won
            # on warc_ts with an equal lsn (possible from feeds that
            # derive/reuse lsn, e.g. lake_sink with a coarse lsn column)
            updated = (
                old_live
                & new_live
                & (
                    (F.col("_olsn") != F.col("_nlsn"))
                    | (F.col("_op.warc_ts") != F.col("_np.warc_ts"))
                )
            )

            def _entry(cond, ctype: str, payload: str, lsn: str, tts=None):
                return F.when(
                    cond,
                    F.struct(
                        F.lit(ctype).alias("_change_type"),
                        F.col(payload).alias("_payload"),
                        F.col(lsn).alias("_rl"),
                        (
                            tts if tts is not None
                            else F.lit(None).cast("timestamp")
                        ).alias("_tts"),
                    ),
                )

            arr = F.array_compact(
                F.array(
                    _entry(~old_live & new_live, "insert", "_np", "_nlsn"),
                    _entry(updated, "update_preimage", "_op", "_olsn"),
                    _entry(updated, "update_postimage", "_np", "_nlsn"),
                    _entry(
                        old_live & ~new_live, "delete", "_op", "_olsn",
                        tts=F.col("_np.warc_ts"),
                    ),
                )
            )
            meta = (
                [
                    F.col("_e._rl").alias("_row_lsn"),
                    F.col("_e._tts").alias("_tombstone_ts"),
                ]
                if row_meta
                else []
            )
            parts.append(
                j.select(F.explode(arr).alias("_e")).select(
                    *[F.col(f"_e._payload.{c}").alias(c) for c in public],
                    F.col("_e._change_type").alias("_change_type"),
                    F.lit(v).alias("_commit_version"),
                    *meta,
                )
            )
        if not parts:
            m = self.manifest(to_version)
            fields = [
                f
                for f in T.StructType.fromJson(m["schema"]).fields
                if f.name not in _INTERNAL_COLS
            ]
            empty = T.StructType(
                fields
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_version", T.IntegerType(), False),
                ]
                + (
                    [
                        T.StructField("_row_lsn", T.LongType()),
                        T.StructField("_tombstone_ts", T.TimestampType()),
                    ]
                    if row_meta
                    else []
                )
            )
            return self.spark.createDataFrame([], empty)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # ------------------------------------------------------ point lookup

    def lookup(self, value: Any, version: int | str | None = None) -> DataFrame:
        """Point lookup of one key with two-level file skipping: hash the
        key to its bucket (manifest pruning drops (n_buckets-1)/n_buckets
        of all files without touching them), then drop candidate files
        whose parquet-footer key min/max range excludes the value — the
        merge write sorts each bucket by key, so footer ranges are tight
        and a bucket with many files opens ~1 (Iceberg column-stats file
        skipping; reference analogue: LIMIT-1 ledger lookups, operator T4,
        /root/reference/fintick/fscache/fscache.py:60-71).

        A third tier applies when :meth:`build_blooms` has run: candidate
        files with a bloom row are dropped on a definite bloom miss
        (~0.8% false positives at the defaults), which is what keeps
        string-keyed lookups at ~1 file opened when min/max url ranges
        inside a bucket are wide.

        Files that survive the prunes are read with the key predicate
        (pushed to the scan ⇒ row-group skipping on the same stats),
        LWW-folded in case base+delta both hold the key, and tombstones
        hidden — semantically ``read(version).where(key = value)``.
        """
        import pyarrow.parquet as pq

        m = self.manifest(version)
        key = m["key"]
        schema = self._physical_schema(m)
        key_field = next(f for f in schema.fields if f.name == key)
        probe = (
            self.spark.createDataFrame([(value,)], T.StructType([key_field]))
            .select(F.xxhash64(F.col(key)).alias("h"))
            .collect()[0]
        )
        hv = int(probe["h"])
        # per-spec bucket of the probe key (python floored % == pmod for
        # positive modulus): pruning stays EXACT across spec evolution —
        # each file is matched against the key's bucket under ITS OWN spec
        b_for = {sid: hv % nb for sid, nb in self._specs(m).items()}
        public = [
            f.name
            for f in T.StructType.fromJson(m["schema"]).fields
            if f.name not in _INTERNAL_COLS
        ]
        candidates = []
        for f in m["files"]:
            if f["bucket"] != b_for[self._file_spec(f)]:
                continue
            # z-ordered files carry xxhash64(key) bounds — hash order is
            # what they're sorted by, so these are the TIGHT ranges there
            # (the lexicographic key min/max below is ~full-bucket)
            hst = (f.get("stats") or {}).get("__key_hash__")
            if hst is not None and not (hst[0] <= hv <= hst[1]):
                continue
            mst = (f.get("stats") or {}).get(key)
            if mst is not None:
                # manifest column stats (captured at write time): prune
                # with zero file I/O — the footer-open below only runs
                # for files from pre-stats manifests
                if mst[0] <= value <= mst[1]:
                    candidates.append(f)
                continue
            md = pq.ParquetFile(os.path.join(self.path, f["path"])).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            contains = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[key]).statistics
                if st is None or not st.has_min_max:
                    contains = True  # no stats ⇒ cannot prune
                    break
                if st.min <= value <= st.max:
                    contains = True
                    break
            if contains:
                candidates.append(f)
        candidates = self._bloom_prune(m, value, candidates)
        if not candidates:
            return self.spark.createDataFrame(
                [], T.StructType([f for f in schema.fields if f.name in set(public)])
            ).select(*public)
        df = self._read_raw(m, candidates).where(F.col(key) == F.lit(value))
        df = lww_compact(df, key=key, order_cols=ORDER_COLS)
        return df.where(~F.col("is_deleted")).select(*public)
