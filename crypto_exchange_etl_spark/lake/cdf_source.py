"""``lake_cdf`` — a PySpark Python Data Source streaming the change feed.

Exposes :meth:`LakeTable.changes_between` as a FIRST-CLASS Structured
Streaming source (Spark 4 Python Data Source API)::

    spark.dataSource.register(LakeCdfDataSource)
    df = (spark.readStream.format("lake_cdf")
          .option("path", table_path)
          .option("startingVersion", 3)   # optional; default = tail-only
          .load())

Offsets are table VERSIONS — the snapshot log is the write-ahead log of
this source, so the usual Structured Streaming checkpoint gives
exactly-once downstream consumption with no bespoke cursor table (the
:class:`~.consumer.ChangeFeedConsumer` remains the batch-poll variant).

Scale design (mirrors ``changes_between``): the driver plans one input
partition per CONNECTED GROUP of changed bucket classes per commit — a
pure manifest diff, no data I/O — and each task reads only the touched
buckets' files of the two adjacent snapshots with pyarrow, folds LWW and
classifies in pandas (vectorized; no Spark-side shuffle at all: the
change feed of one commit is bounded by that commit's touched buckets,
the same bound as the merge that produced it). Column renames/drops are
resolved by FIELD ID at planning time, so workers just apply a
name map. Reference analogue: downstream consumers re-reading hourly
partitions (/root/reference/fintick/bqloader/base.py:91-112) — here they
read only row-level deltas.

Caveats (documented, tested): the emitted schema is pinned at query
start (columns added later are not surfaced until a new query starts;
columns dropped later null-fill) — the same contract as Delta's CDF
stream. ``latestOffset`` never exceeds the retained version floor
guarded by ``expire_snapshots``; a consumer lagging past retention fails
loudly at planning time (missing manifest) rather than silently gapping.

Bootstrap: ``startingVersion="earliest"`` first emits the earliest
retained snapshot's FULL content as ``insert`` changes (a diff against
an empty manifest), then normal per-commit diffs — the only correct
"from the beginning" read of a cloned or post-expiry table, whose base
snapshot holds rows no retained commit diff covers. A NUMERIC
startingVersion whose diff base is that non-empty earliest snapshot
raises (the feed would silently miss the base rows) unless
``allowNonEmptyBase=true`` asserts the consumer already holds state as
of the base.
"""

from __future__ import annotations

import os
from typing import Any, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_META_FIELDS = [
    T.StructField("_change_type", T.StringType(), False),
    T.StructField("_commit_version", T.IntegerType(), False),
]


def _opt_bool(options: dict, name: str, default: bool) -> bool:
    """Strict boolean option parse: true/false/1/0/yes/no (any case),
    absent -> ``default``, anything else raises. A lenient parse would
    silently ignore a misspelled opt-out (``includePreimages=off`` keeping
    the whole old-side payload decode ON with nothing to point at the
    typo), and the two boolean options would drift into opposite
    conventions."""
    raw = options.get(name, options.get(name.lower()))
    if raw is None:
        return default
    s = str(raw).strip().lower()
    if s in ("1", "true", "yes"):
        return True
    if s in ("0", "false", "no"):
        return False
    raise ValueError(
        f"lake_cdf option {name!r} must be true/false, got {raw!r}"
    )


def _last_checkpointed_version(ck: str, path: str | None = None) -> int:
    """Latest lake_cdf version recorded in a streaming checkpoint's
    offset log (-1 if none). The offset files are Spark's OffsetSeqLog:
    a version header, a metadata JSON line, then one offset per source —
    ours is the dict ``{"version": N, "path": <table>}``. A query can
    hold SEVERAL lake_cdf sources (union/join of two feeds) sharing one
    checkpoint, so only offsets tagged with THIS table's path count;
    untagged ``{"version": N}`` lines (pre-path checkpoints) are a
    fallback used only when no tagged line matches. Local-filesystem
    checkpoints only (the same assumption the table's manifests make)."""
    import json as _json

    d = os.path.join(ck, "offsets")
    tagged: list[int] = []
    legacy: list[int] = []
    if os.path.isdir(d):
        nums = [f for f in os.listdir(d) if f.isdigit()]
        if nums:
            with open(os.path.join(d, max(nums, key=int))) as fh:
                for line in fh.read().splitlines()[1:]:
                    try:
                        o = _json.loads(line)
                    except ValueError:
                        continue
                    if isinstance(o, dict) and "version" in o:
                        if "path" in o:
                            if path is None or os.path.abspath(
                                str(o["path"])
                            ) == os.path.abspath(path):
                                tagged.append(int(o["version"]))
                        else:
                            legacy.append(int(o["version"]))
    if len(set(tagged)) > 1:
        # two+ lake_cdf sources over the SAME table in one query tag the
        # same path with different positions — the Python source API
        # gives a reconstructed reader no identity to pick its own line,
        # and max() would seed the lagging source's floor past its
        # checkpoint, un-capping its whole backlog into one micro-batch
        # (min() is worse: a below-checkpoint latestOffset can regress
        # the offset log and re-emit on a later restart). Fail loudly.
        raise ValueError(
            f"checkpoint {ck} holds {len(tagged)} offsets for table "
            f"{path} at different positions {sorted(set(tagged))}: "
            "admission control (maxVersionsPerBatch) cannot attribute "
            "them to sources. Give each capped lake_cdf source over the "
            "same table its own query/checkpoint."
        )
    pool = tagged if tagged else legacy
    return max(pool) if pool else -1


def _coerce_default(v: Any, dt: T.DataType) -> Any:
    """Coerce a stored initial default (JSON scalar) to the Python type
    the Arrow conversion expects for column type ``dt`` — the worker-side
    twin of ``_read_raw``'s ``lit(v).cast(dtype)``."""
    try:
        if isinstance(dt, T.DecimalType):
            import decimal

            # exactness twin of the manifest's canonical-string storage:
            # Decimal objects survive the Arrow cast to decimal128; a
            # float round-trip would corrupt high-precision defaults
            try:
                return decimal.Decimal(str(v))
            except decimal.InvalidOperation:
                return None
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return float(v)
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return int(v)
        if isinstance(dt, T.StringType):
            return str(v)
        if isinstance(dt, T.BooleanType):
            return v if isinstance(v, bool) else str(v).lower() == "true"
    except (TypeError, ValueError):
        return None  # same outcome as an uncastable lit() in _read_raw
    return v


def _table(path: str):
    # metadata-only use: LakeTable's manifest machinery never touches the
    # SparkSession (drivers of this source plan from JSON alone)
    from .table import LakeTable

    return LakeTable(None, path)


def cdf_schema(table_path: str) -> T.StructType:
    from .table import _INTERNAL_COLS

    t = _table(table_path)
    m = t.manifest()
    public = [
        f
        for f in T.StructType.fromJson(m["schema"]).fields
        if f.name not in _INTERNAL_COLS
    ]
    return T.StructType(public + _META_FIELDS)


class CdfPartition(InputPartition):
    """One commit × one connected group of changed bucket classes.

    Self-contained for the worker: absolute file paths with per-file
    column maps (current query-schema name → physical name or None),
    already resolved by field id on the driver.
    """

    def __init__(
        self,
        version: int,
        key: str,
        order_cols: list[str],
        public_cols: list[str],
        old_files: list[tuple[str, dict[str, str | None]]],
        new_files: list[tuple[str, dict[str, str | None]]],
        defaults: dict[str, Any] | None = None,
        schema: T.StructType | None = None,
        preimages: bool = True,
    ):
        #: emit ``update_preimage`` rows (Delta CDF contract). False =
        #: the old side was planned to load only key/rank/liveness
        #: columns; payload columns on ``delete`` rows read null.
        self.preimages = preimages
        self.version = version
        self.key = key
        self.order_cols = order_cols
        self.public_cols = public_cols
        self.old_files = old_files
        self.new_files = new_files
        #: pinned source schema (public + meta) — the worker emits Arrow
        #: RecordBatches cast to exactly this, same conversion the sink
        #: uses for its own parquet writes
        self.schema = schema
        # pinned initial defaults (add_column DDL): absent-in-epoch
        # columns fill with these instead of null, matching _read_raw
        self.defaults = defaults or {}


class _CdfPlannerBase:
    """Shared driver-side planning + worker-side read for the stream and
    batch faces of the source (same partitions, same diff kernel)."""

    def __init__(self, schema: T.StructType, options: dict):
        self.path = options["path"]
        self.schema = schema
        self.public_cols = [
            f.name for f in schema.fields if not f.name.startswith("_")
        ]
        t = _table(self.path)
        m = t.manifest()
        self._key = m["key"]
        self._defaults = {
            f.name: _coerce_default(v, f.dataType)
            for f in schema.fields
            if (v := (m.get("column_defaults") or {}).get(f.name)) is not None
        }
        # field ids of the pinned query schema (None for pre-DDL tables)
        self._query_fids = m.get("field_ids")
        self._query_eps = m.get("schema_epochs")
        #: ``includePreimages=false`` narrows the OLD side of every diff
        #: to its key/rank/liveness columns at PLANNING time — the
        #: parquet reads skip payload bytes entirely (on web pages ~95%
        #: of the decode) — and drops ``update_preimage`` rows. ``delete``
        #: rows then carry null payload (key + warc_ts stay). For
        #: consumers that never read preimages (replication: the sink
        #: nulls tombstone payloads anyway) this is pure savings.
        self._preimages = _opt_bool(options, "includePreimages", True)
        start = options.get("startingVersion", options.get("startingversion"))
        self._allow_base = _opt_bool(options, "allowNonEmptyBase", False)
        #: when set, ``_plan`` emits this snapshot's FULL content as
        #: ``insert`` changes (diff from empty) before normal diffs —
        #: the bootstrap a cloned / post-expiry table needs, since rows
        #: already present in the earliest retained snapshot belong to
        #: no retained commit diff
        self._bootstrap_v: int | None = None
        #: numeric startingVersion pending retention validation — checked
        #: by :meth:`_validate_start`, which the batch face runs eagerly
        #: but the stream face defers to ``initialOffset()``: a RESTARTED
        #: stream resumes from its checkpoint, not startingVersion, and
        #: must not wedge because expire_snapshots has since passed a
        #: start position it no longer reads
        self._start_num: int | None = None
        if start is not None and str(start).strip().lower() == "earliest":
            e = int(t.earliest_version())
            self._bootstrap_v = e
            self._initial = e - 1
        elif start is not None:
            self._start_num = int(start)
            self._initial = self._start_num - 1
        else:
            self._initial = int(m["version"])

    def _validate_start(self) -> None:
        """Numeric ``startingVersion`` sanity vs the CURRENT retention
        floor. Eager on the batch face (every batch query reads from
        startingVersion, so its diff base must exist NOW); the stream
        face calls this from ``initialOffset()`` ONLY — Spark invokes
        that just for fresh queries, so a checkpointed restart skips the
        check entirely (its offsets fail loudly at planning time if they
        themselves lag retention, which is the only failure that restart
        can actually have)."""
        if self._start_num is None:
            return
        t = _table(self.path)
        base = self._start_num - 1
        earliest = int(t.earliest_version())
        if base < earliest:
            raise ValueError(
                f"startingVersion={self._start_num} needs snapshot "
                f"v{base} as its diff base, but the earliest retained "
                f"snapshot of {self.path} is v{earliest} "
                "(expire_snapshots outpaced this consumer) — resync "
                "with startingVersion='earliest' (full bootstrap "
                "through the feed) or start tail-only"
            )
        if (
            base == earliest
            and t.manifest(base)["files"]
            and not self._allow_base
        ):
            # same guard as ChangeFeedConsumer.position(): rows in a
            # non-empty earliest snapshot (clone v0 / post-expiry)
            # belong to NO retained diff — a feed-only bootstrap
            # would silently miss them
            raise ValueError(
                f"base snapshot v{base} of {self.path} is the "
                "earliest retained version and is non-empty; its "
                "rows are NOT emitted by the change feed. Use "
                "startingVersion='earliest' to bootstrap them as "
                "inserts, or pass allowNonEmptyBase=true if the "
                "consumer already holds state as of that snapshot"
            )

    # -------------------------------------------------------- planning

    def _colmap(self, m: dict[str, Any], f: dict[str, Any]) -> dict[str, str | None]:
        """current query-schema column -> physical name in file ``f`` of
        manifest ``m`` (None = absent: null-fill), resolved by field id.

        This resolves a PINNED query schema against historical manifests
        (cross-manifest), which :meth:`LakeTable._name_at_epoch` (one
        manifest) cannot express — only the epoch lookup itself is
        shared (``LakeTable._file_epoch``)."""
        from .table import LakeTable

        need = [*self.public_cols, "lsn", "is_deleted"]
        out: dict[str, str | None] = {}
        eps = m.get("schema_epochs")
        for col in need:
            fid = (self._query_fids or {}).get(col)
            if fid is None and eps and self._query_fids is None:
                # query pinned a pre-DDL schema but the table gained field
                # ids later (first rename materializes them with epoch 0 =
                # the names as of that moment = the query-start names):
                # recover the id from epoch 0
                rev = {n: int(i) for i, n in eps[0].items()}
                fid = rev.get(col)
            if fid is None:
                out[col] = col  # untracked internal col, or fully pre-DDL
            elif eps is None:
                # manifest PREDATES field-id materialization: every file
                # in it was written under epoch-0 names of the (later)
                # query-time epochs
                out[col] = (
                    self._query_eps[0].get(str(fid)) if self._query_eps else col
                )
            else:
                e = min(LakeTable._file_epoch(f), len(eps) - 1)
                out[col] = eps[e].get(str(fid))
        return out

    def _plan(self, sv: int, ev: int) -> list[CdfPartition]:
        """Partitions covering commits (sv, ev] — one per connected group
        of changed bucket classes per commit (pure manifest diff, shared
        with :meth:`LakeTable.changes_between`). The bootstrap version
        (``startingVersion='earliest'``) diffs against an EMPTY manifest,
        emitting the whole snapshot as inserts."""
        t = _table(self.path)
        parts: list[CdfPartition] = []
        for v in range(int(sv) + 1, int(ev) + 1):
            m_new = t.manifest(v)
            if self._bootstrap_v is not None and v == self._bootstrap_v:
                m_old = {**m_new, "files": []}
            else:
                m_old = t.manifest(v - 1)
            changed = type(t)._changed_classes(m_old, m_new)
            if not changed:
                continue
            # union-find over changed classes: classes that can share keys
            # (spec evolution) must diff together
            classes = sorted(changed)
            parent = list(range(len(classes)))

            def find(i):
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            for i in range(len(classes)):
                for j in range(i + 1, len(classes)):
                    (na, ba), (nb, bb) = classes[i], classes[j]
                    if t._buckets_intersect(na, ba, nb, bb):
                        parent[find(i)] = find(j)
            groups: dict[int, list[tuple[int, int]]] = {}
            for i, c in enumerate(classes):
                groups.setdefault(find(i), []).append(c)

            for grp in groups.values():
                keep_old = {self._key, "warc_ts", "lsn", "is_deleted"}
                of = [
                    (
                        os.path.join(self.path, f["path"]),
                        cm
                        if self._preimages
                        else {c: n for c, n in cm.items() if c in keep_old},
                    )
                    for f in type(t)._class_touched(m_old, grp)
                    for cm in (self._colmap(m_old, f),)
                ]
                nf = [
                    (os.path.join(self.path, f["path"]), self._colmap(m_new, f))
                    for f in type(t)._class_touched(m_new, grp)
                ]
                parts.append(
                    CdfPartition(
                        version=v,
                        key=self._key,
                        order_cols=["warc_ts", "lsn"],
                        public_cols=self.public_cols,
                        old_files=of,
                        new_files=nf,
                        defaults=self._defaults,
                        schema=self.schema,
                        preimages=self._preimages,
                    )
                )
        return parts

    # ---------------------------------------------------------- reading

    def read(self, partition: CdfPartition) -> Iterator[tuple]:
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        p = partition
        if p is None:  # Spark hands read(None) for an EMPTY partition
            return  # list (e.g. a metadata-only commit range)
        cols = [*p.public_cols, "lsn", "is_deleted"]

        def load(files) -> "pd.DataFrame":
            frames = []
            for path, colmap in files:
                phys = [c for c in colmap.values() if c is not None]
                pf = pq.ParquetFile(path)
                avail = set(pf.schema_arrow.names)
                df = pf.read(columns=[c for c in phys if c in avail]).to_pandas()
                out = pd.DataFrame(index=df.index)
                for cur, ph in colmap.items():
                    if ph is not None and ph in df.columns:
                        out[cur] = df[ph]
                    else:
                        out[cur] = p.defaults.get(cur)
                # exact integers across the outer merge below: the merge
                # inserts NaN for one-sided keys, upcasting int64 columns
                # to float64 — which silently rounds packed 64-bit lsns
                # past 2^53 (the hazard the sink documents for its own
                # path). Nullable Int64 keeps exactness AND gives the
                # comparison Spark's null semantics (NA, never True).
                for c in out.columns:
                    if pd.api.types.is_integer_dtype(out[c]):
                        out[c] = out[c].astype("Int64")
                frames.append(out)
            if not frames:
                return pd.DataFrame(columns=cols)
            return pd.concat(frames, ignore_index=True)

        def fold(df: "pd.DataFrame") -> "pd.DataFrame":
            if df.empty:
                return df
            # LWW: best (warc_ts, lsn) per key — same rule as the merge
            return (
                df.sort_values([p.key, *p.order_cols],
                               ascending=[True, False, False])
                .drop_duplicates(subset=[p.key], keep="first")
            )

        old = fold(load(p.old_files))
        new = fold(load(p.new_files))

        # tag sides EXPLICITLY (merge suffixes only rename overlapping
        # columns — with preimages off the old side carries just the
        # key/rank/liveness columns and the payload would come through
        # unsuffixed)
        def tagged(df: "pd.DataFrame", side: str) -> "pd.DataFrame":
            return df.rename(
                columns={c: f"{c}{side}" for c in df.columns if c != p.key}
            )

        j = tagged(old, "_o").merge(
            tagged(new, "_n"), on=p.key, how="outer", sort=True
        )

        def live(side: str):
            lsn = j[f"lsn{side}"]
            # object-dtype fillna→bool downcast is deprecated in pandas;
            # build the mask null-safely instead
            raw = j[f"is_deleted{side}"]
            dele = raw.isna() | (raw == True)  # noqa: E712 (vector compare)
            return lsn.notna() & ~dele

        old_live, new_live = live("_o"), live("_n")
        # full LWW-rank compare (warc_ts, lsn) — lsn alone misses an
        # update that won on warc_ts with an equal lsn. Null semantics
        # mirror the Spark kernel (LakeTable.changes_between) exactly:
        # a compare against null is UNKNOWN (excluded unless the other
        # side is definitively True) — pandas' native NaT != NaT would
        # instead emit a phantom update for every null-warc_ts key in a
        # rewritten bucket. lsn compares on nullable Int64 (exact past
        # 2^53, NA-propagating).
        lsn_neq = pd.Series(j["lsn_o"] != j["lsn_n"], index=j.index).astype(
            "boolean"
        )
        ts_o, ts_n = j["warc_ts_o"], j["warc_ts_n"]
        ts_neq = pd.Series(
            (ts_o != ts_n) & ts_o.notna() & ts_n.notna(), index=j.index
        ).astype("boolean")
        updated = (
            ((old_live & new_live).astype("boolean") & (lsn_neq | ts_neq))
            .fillna(False)
            .astype(bool)
        )

        # Vectorized emit: build the change rows as whole pandas frames
        # and yield Arrow RecordBatches — the Python Data Source API
        # consumes them directly, replacing the per-row tuple path that
        # capped the feed at ~50-100k rows/s/core (a 894k-row bootstrap
        # spent ~10 s here; the frame path is pure numpy/Arrow). The cast
        # to the pinned source schema is the SAME from_pandas(...).cast
        # conversion the sink's byte-identity-tested write path uses.
        ins_m = ~old_live & new_live
        del_m = old_live & ~new_live

        def side_frame(mask, side: str, ctype: str, seq: int):
            sub = j.loc[mask]
            out = pd.DataFrame(index=sub.index)
            for c in p.public_cols:
                if c == p.key:
                    out[c] = sub[p.key]
                else:
                    sc = f"{c}{side}"
                    # absent with preimages off: the old side loads only
                    # key/rank/liveness columns — payload reads null
                    out[c] = sub[sc] if sc in sub.columns else None
            # normalize all-NA OBJECT payload columns (a narrowed old
            # side, or an old snapshot predating the column's DDL) to the
            # NEW side's dtype when it holds NA natively (datetime/
            # float): an all-NA object column next to a typed one is
            # exactly pandas' deprecated concat path — it FutureWarns
            # from every task today and flips the result dtype under
            # pandas 3. int/str sides stay object (exact; the arrow cast
            # to the pinned schema handles both).
            for c in p.public_cols:
                nc = f"{c}_n"
                if (
                    nc in j.columns
                    and j[nc].dtype.kind in ("M", "f")
                    and out[c].dtype == np.dtype(object)
                    and out[c].isna().all()
                ):
                    ndt = j[nc].dtype
                    out[c] = pd.Series(
                        pd.NaT if ndt.kind == "M" else np.nan,
                        index=out.index,
                        dtype=ndt,
                    )
            out["_change_type"] = ctype
            out["_commit_version"] = np.int32(p.version)
            out["__seq__"] = seq
            return out

        frames = [side_frame(ins_m, "_n", "insert", 0)]
        if p.preimages:
            frames.append(side_frame(updated, "_o", "update_preimage", 0))
        frames.extend(
            [
                side_frame(updated, "_n", "update_postimage", 1),
                side_frame(del_m, "_o", "delete", 0),
            ]
        )
        # drop zero-row frames before concat: empty entries are the other
        # half of pandas' concat deprecation (their dtypes stop being
        # excluded under pandas 3), and the survivors fully determine the
        # result dtypes deterministically
        frames = [f for f in frames if len(f)]
        if not frames:
            return
        cat = pd.concat(frames)
        # reproduce the row kernel's emit order exactly: j's key order
        # (its RangeIndex, carried through .loc), preimage before
        # postimage for the same key
        cat["__ix__"] = cat.index
        cat = cat.sort_values(["__ix__", "__seq__"], kind="stable").drop(
            columns=["__ix__", "__seq__"]
        )

        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        aschema = to_arrow_schema(p.schema)
        tbl = pa.Table.from_pandas(cat, preserve_index=False).cast(aschema)
        yield from tbl.to_batches(max_chunksize=65536)


class LakeCdfStreamReader(_CdfPlannerBase, DataSourceStreamReader):
    """Streaming face. Offsets are table versions; optional admission
    control via ``maxVersionsPerBatch`` (Delta ``maxFilesPerTrigger``
    analogue): each planned micro-batch advances at most K versions, so
    a consumer facing a long backlog pages through it in bounded steps.

    Restart safety: Spark calls ``latestOffset`` BEFORE ``initialOffset``
    (measured), and the Python source API never tells the reader where
    the checkpoint stands — so a cap anchored at ``startingVersion``
    would, on restart, log an offset BELOW the checkpoint and re-emit
    rows. Admission control therefore REQUIRES the ``checkpointLocation``
    option (the same path given to ``writeStream``): at construction the
    reader inspects ``<ck>/offsets`` and seeds the cap's floor at the
    LAST CHECKPOINTED version when one exists (matching this table's
    path — a query may hold several lake_cdf sources on one checkpoint),
    else at startingVersion-1 / the query-start tail. The checkpoint
    must win outright, not via max(): a restarted TAIL-DEFAULT query
    re-evaluates "current version" at a point far past its checkpoint,
    and max() would seed the floor there — un-capping the whole backlog
    into one micro-batch. The floor also advances with every
    planned/committed range as a backstop.

    Trigger interplay (measured): ``availableNow`` latches its drain
    target from the FIRST (capped) ``latestOffset``, so one invocation
    advances at most K versions — re-invoke to page further (the cron
    pattern the engine's own ``tail`` uses). Continuous paging through a
    backlog wants ``processingTime``."""

    def __init__(self, schema: T.StructType, options: dict):
        super().__init__(schema, options)
        mv = options.get(
            "maxVersionsPerBatch", options.get("maxversionsperbatch")
        )
        self._max_versions = int(mv) if mv is not None else None
        if self._max_versions is not None and self._max_versions < 1:
            raise ValueError("maxVersionsPerBatch must be >= 1")
        self._floor = self._initial
        if self._max_versions is not None:
            ck = options.get(
                "checkpointLocation", options.get("checkpointlocation")
            )
            if ck is None:
                raise ValueError(
                    "maxVersionsPerBatch requires option 'checkpointLocation' "
                    "(the writeStream checkpoint dir): the Python source API "
                    "does not expose the restart position, and capping "
                    "without it would rewind the offset log on restart"
                )
            ckv = _last_checkpointed_version(ck, self.path)
            if ckv >= 0:
                self._floor = ckv

    # ----------------------------------------------------------- offsets
    # offsets carry the table path so a multi-source query's shared
    # checkpoint can attribute each line to its table on restart

    def initialOffset(self) -> dict:
        # fresh queries only (a restart reads the checkpoint instead) —
        # the right moment for startingVersion retention validation
        self._validate_start()
        return {"version": self._initial, "path": self.path}

    def latestOffset(self) -> dict:
        cur = int(_table(self.path).current_version())
        if self._max_versions is not None:
            cur = max(min(cur, self._floor + self._max_versions), self._floor)
            self._floor = cur
        return {"version": cur, "path": self.path}

    def commit(self, end: dict) -> None:
        # the streaming checkpoint owns progress; we only learn the floor
        self._floor = max(self._floor, int(end["version"]))

    def partitions(self, start: dict, end: dict) -> list[CdfPartition]:
        sv, ev = int(start["version"]), int(end["version"])
        # backstop: never let the cap's floor fall behind a range the
        # engine has actually planned
        self._floor = max(self._floor, sv, ev)
        if ev <= sv:
            return []
        return self._plan(sv, ev)


class LakeCdfBatchReader(_CdfPlannerBase, DataSourceReader):
    """Batch face (Delta batch-CDF analogue)::

        spark.read.format("lake_cdf").option("path", p)
             .option("startingVersion", 3)          # required
             .option("endingVersion", 7)            # optional, inclusive
             .load()

    Same planner and diff kernel as the stream — the result equals
    ``LakeTable.changes_between(startingVersion-1, endingVersion)``."""

    def __init__(self, schema: T.StructType, options: dict):
        start = options.get("startingVersion", options.get("startingversion"))
        if start is None:
            raise ValueError(
                "lake_cdf batch reads require startingVersion (streams "
                "default to tail-only; a batch read has no tail)"
            )
        super().__init__(schema, options)
        self._validate_start()
        end = options.get("endingVersion", options.get("endingversion"))
        self._end = (
            int(end) if end is not None
            else int(_table(self.path).current_version())
        )

    def partitions(self) -> list[CdfPartition]:
        return self._plan(self._initial, self._end)


class LakeCdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self) -> T.StructType:
        return cdf_schema(self.options["path"])

    def streamReader(self, schema: T.StructType) -> LakeCdfStreamReader:
        return LakeCdfStreamReader(schema, dict(self.options))

    def reader(self, schema: T.StructType) -> LakeCdfBatchReader:
        return LakeCdfBatchReader(schema, dict(self.options))
