"""SCD2 (type-2 slowly-changing-dimension) history over a LakeTable CDF.

The classic CDC downstream: turn the change feed into a queryable table
of *validity intervals* — one row per version of each key, carrying
``valid_from``/``valid_to`` on the event-time axis (``warc_ts``), where
``valid_to IS NULL`` marks the currently-live version. The source table
keeps only last-writer-wins state; the history table answers "what did
this url say at time t" (`as_of`) and "show me every version" without
replaying the binlog.

Design (why this scales to a 10^10-event feed):

- **The history is itself a LakeTable**, keyed on the composite
  ``_hist_id = <key>\\x00<warc_ts micros>\\x00<zero-padded lsn>`` (the
  full LWW rank; format generation ``_HIST_ID_FORMAT``) — one history
  row per (key, source-version). Every refresh rides the engine's own
  bucket-pruned, exactly-once ``merge_into`` path, so per-refresh cost is
  O(changed rows), never O(history). A hot url's versions spread across
  buckets by lsn, so per-key skew in the feed does not concentrate on
  one history bucket.
- **Every history row is a pure function of source commits**: an
  *open* row (interval starts at its version's ``warc_ts``) is derived
  from the insert/update_postimage image; a *close* (sets ``valid_to``)
  from the update_preimage paired with its postimage's timestamp, or
  from the delete image paired with the tombstone's timestamp
  (``changes_between(row_meta=True)``). Re-deriving any span yields
  byte-identical rows, so a crash between the history commit and the
  cursor write self-heals: the overlapping re-merge converges (the close
  always carries a later ``_commit_version`` than the open it
  supersedes, and per-span collapse keeps the latest image per
  ``_hist_id``).
- **Exactly-once** via the history table's applied-batch guard
  (batch id = consumed span) + a sidecar cursor written after the
  commit, mirroring :class:`~.matview.MaterializedAggregate`.

Retention interplay: if ``expire_snapshots`` on the source outruns the
cursor, the in-between history is unrecoverable — :meth:`refresh` raises
:class:`~.consumer.ChangeFeedLagError`; :meth:`resync` then repairs the
*endpoints* (closes intervals whose version is gone, opens current
versions) while keeping all previously captured history, closing
unknown-end intervals at the source head's commit time and counting them
in the returned summary.

Reference analogue: the reference never keeps row history — its BigQuery
tables are overwritten per (symbol, partition)
(/root/reference/fintick/bqloader/bqloader.py); SCD2 is what the north
rule's lake users expect a CDC engine to feed.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .consumer import ChangeFeedLagError
from .table import _INTERNAL_COLS, LakeTable

#: separator between key and zero-padded lsn in the composite history key
_SEP = "\x00"

#: on-disk ``_hist_id`` format generation, stamped into the sidecar
#: cursor. 1 (never stamped) = ``key\x00lsn``; 2 = ``key\x00warc_ts\x00
#: lsn`` (the full-LWW-rank identity). A history written under one
#: format must not be refreshed under another: close rows would merge
#: under NEW ids, leaving the legacy open interval current forever while
#: the close lands as a parallel already-closed row. Mixed histories are
#: silent corruption, so a missing/older stamp raises with rebuild
#: guidance instead.
_HIST_ID_FORMAT = 2


def _name_in_manifest(fid, mv: dict, eps: list) -> "str | None":
    """Physical name of field ``fid`` in manifest ``mv`` (None = the
    field did not exist there). Pre-field-id manifests (written before
    the first rename materialized ids) resolve via epoch-0 names — the
    ONE copy of the rule both the incremental span reader
    (``_interval_rows``) and the snapshot bootstrap (``_bootstrap_full``)
    apply, so the two paths cannot drift."""
    fv = mv.get("field_ids")
    if fv:
        return {f: n for n, f in fv.items()}.get(fid)
    return eps[0].get(str(fid)) if eps else None


def _hist_id(key_col: str) -> F.Column:
    # fixed-width (warc_ts micros, lsn) keeps _hist_id order ≡ the FULL
    # LWW rank (key, warc_ts, lsn): an update that wins LWW on warc_ts
    # with an EQUAL lsn (rank-based change detection emits these, e.g. a
    # lake_sink feed with a coarse derived lsn) closes the old interval
    # and opens a DISTINCT history row instead of colliding on one id,
    # where the max_by collapse would arbitrarily keep either image.
    # lsn ≥ 0 by the change-envelope contract (binlog sequence numbers).
    return F.concat(
        F.col(key_col),
        F.lit(_SEP),
        F.lpad(
            F.coalesce(F.unix_micros(F.col("warc_ts")), F.lit(-1))
            .cast("string"),
            20,
            "0",
        ),
        F.lit(_SEP),
        F.lpad(F.col("_src_lsn").cast("string"), 20, "0"),
    )


class Scd2History:
    """Incrementally-maintained type-2 history of a LakeTable.

    ``payload_cols`` — source public columns carried into history rows
    (default: everything except the key and ``warc_ts``; pass e.g.
    ``["lang"]`` to keep the history narrow when the source carries wide
    html/text bytes).

    Plugs into ``CdcPipeline(views=[...])`` via :meth:`refresh`.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        history_path: str,
        payload_cols: list[str] | None = None,
        n_buckets: int = 16,
        write_mode: str = "mor",
    ):
        self.spark = spark
        self.source_path = source_path
        self.history_path = os.path.abspath(history_path)
        self._payload_opt = payload_cols
        self.n_buckets = n_buckets
        self.write_mode = write_mode
        os.makedirs(self.history_path, exist_ok=True)

    # ----------------------------------------------------------- manifest

    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.history_path, "scd2.json")

    def position(self) -> int | None:
        """Source version the history reflects (None = never refreshed)."""
        if not os.path.exists(self._cursor_path):
            return None
        with open(self._cursor_path) as fh:
            return int(json.load(fh)["source_version"])

    def _write_cursor(self, version: int) -> None:
        # atomic overwrite through the source table's commit backend, so
        # the cursor rides the same storage primitive as the lake itself
        LakeTable(self.spark, self.source_path).backend.put(
            self._cursor_path,
            json.dumps(
                {
                    "source_version": int(version),
                    "hist_id_format": _HIST_ID_FORMAT,
                }
            ).encode(),
        )

    def _check_hist_id_format(self) -> None:
        """Refuse to touch a history written under a different
        ``_hist_id`` generation (see ``_HIST_ID_FORMAT``)."""
        if not os.path.exists(self._cursor_path):
            return  # never refreshed — nothing on disk to mismatch
        with open(self._cursor_path) as fh:
            fmt = int(json.load(fh).get("hist_id_format", 1))
        if fmt != _HIST_ID_FORMAT:
            raise ValueError(
                f"history at {self.history_path} was written with "
                f"_hist_id format {fmt}, engine uses "
                f"{_HIST_ID_FORMAT}: refreshing would merge closes under "
                "new ids and strand legacy intervals open. Rebuild the "
                "history from the source (delete the history table + "
                "scd2.json and refresh), or — only if it is KNOWN to be "
                "fully written under the current id layout — stamp "
                f'"hist_id_format": {_HIST_ID_FORMAT} into scd2.json'
            )

    # -------------------------------------------------------------- setup

    def _source(self) -> LakeTable:
        return LakeTable.load(self.spark, self.source_path)

    def _payload(self, src: LakeTable) -> tuple[str, list[str]]:
        m = src.manifest()
        key = m["key"]
        public = [
            f.name
            for f in T.StructType.fromJson(m["schema"]).fields
            if f.name not in _INTERNAL_COLS
        ]
        if self._payload_opt is not None:
            missing = set(self._payload_opt) - set(public)
            if missing:
                raise ValueError(
                    f"payload_cols not in source schema: {sorted(missing)}"
                )
            return key, list(self._payload_opt)
        return key, [c for c in public if c not in (key, "warc_ts")]

    @staticmethod
    def _hist_public(hist: LakeTable) -> list[str]:
        """History table's public columns from its manifest (no Spark
        plan construction — read faces call this on every query)."""
        return [
            f.name
            for f in T.StructType.fromJson(hist.manifest()["schema"]).fields
            if f.name not in _INTERNAL_COLS
        ]

    def _history_table(self, src: LakeTable) -> LakeTable:
        key, payload = self._payload(src)
        src_schema = T.StructType.fromJson(src.manifest()["schema"])
        fields = [
            T.StructField("_hist_id", T.StringType(), False),
            T.StructField(key, src_schema[key].dataType),
            # warc_ts doubles as the interval's valid_from (the LWW order
            # column must exist physically; read faces alias it)
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
            T.StructField("_src_lsn", T.LongType()),
            *[T.StructField(c, src_schema[c].dataType) for c in payload],
        ]
        return LakeTable.create(
            self.spark,
            self.history_path,
            T.StructType(fields),
            key="_hist_id",
            n_buckets=self.n_buckets,
            if_not_exists=True,
            write_mode=self.write_mode,
        )

    # -------------------------------------------------------------- reads

    def history(self) -> DataFrame:
        """Every captured interval: ``valid_from``/``valid_to`` +
        ``is_current`` over the key and payload columns.

        Payload columns come from the HISTORY table's own schema (the
        union of everything ever captured), not the source's current one
        — source schema evolution between refreshes can neither crash
        reads nor hide previously captured columns. After a source
        ``rename_column``, mirror it with ``rename_column`` on the
        history table to keep old and new intervals under one column;
        un-mirrored, the history additively gains the new name and old
        intervals keep the old one (both visible, nothing lost)."""
        src = self._source()
        key, _ = self._payload(src)
        hist = self._history_table(src)
        payload = [
            c
            for c in self._hist_public(hist)
            if c not in ("_hist_id", key, "warc_ts", "valid_to", "_src_lsn")
        ]
        return (
            hist
            .read()
            .select(
                F.col(key),
                F.col("warc_ts").alias("valid_from"),
                F.col("valid_to"),
                F.col("valid_to").isNull().alias("is_current"),
                F.col("_src_lsn").alias("src_lsn"),
                *[F.col(c) for c in payload],
            )
        )

    def as_of(self, ts: _dt.datetime) -> DataFrame:
        """State of the source at event time ``ts``: rows whose interval
        covers ``ts`` (``valid_from <= ts < valid_to``)."""
        h = self.history()
        return h.where(
            (F.col("valid_from") <= F.lit(ts))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
        ).drop("is_current")

    def current(self) -> DataFrame:
        return self.history().where(F.col("is_current"))

    # ------------------------------------------------------------ refresh

    def _interval_rows(
        self, src: LakeTable, key: str, payload: list[str], pos: int, cur: int
    ) -> DataFrame:
        """The span's history rows — opens ∪ closes, collapsed to the
        LATEST image per ``_hist_id`` (a close always out-commits the
        open it supersedes; re-consumed spans re-derive identical rows)."""
        cdf = src.changes_between(pos, cur, row_meta=True)
        # The CDF emits each commit's rows under THAT commit's column
        # names (pinned-schema contract), and the cross-commit union
        # null-fills the others. A rename inside the span therefore
        # splits one field's values across two columns — and a re-added
        # old name makes the old column AMBIGUOUS (different field ids
        # per commit). Resolve exactly: for every payload column, read
        # each row's value from the name its FIELD ID had at that row's
        # commit (null where the field did not exist yet) — the same
        # by-id resolution the engine's readers use, keyed on
        # _commit_version.
        m_cur = src.manifest(cur)
        fids = m_cur.get("field_ids") or {}
        eps = m_cur.get("schema_epochs") or []
        have = set(cdf.columns)

        def _name_at(fid, v: int) -> str | None:
            return _name_in_manifest(fid, src.manifest(v), eps)

        def _pcol(c: str) -> F.Column:
            fid = fids.get(c)
            if fid is None or not eps:
                return F.col(c)  # no DDL ever happened: names are stable
            by_name: dict[str | None, list[int]] = {}
            for v in range(pos + 1, cur + 1):
                by_name.setdefault(_name_at(fid, v), []).append(v)
            if set(by_name) == {c}:
                return F.col(c)
            src_schema = T.StructType.fromJson(m_cur["schema"])
            expr = F.lit(None).cast(src_schema[c].dataType)
            for name, vers in by_name.items():
                src_col = (
                    F.col(name)
                    if name is not None and name in have
                    else F.lit(None)
                )
                expr = F.when(
                    F.col("_commit_version").isin(vers), src_col
                ).otherwise(expr)
            return expr.alias(c)

        # deletes whose tombstone was physically dropped in the same
        # commit (row TTL) carry no tombstone timestamp — close those at
        # the commit's wall time so the interval cannot stay open forever
        commit_ts = F.create_map(
            *[
                x
                for v in range(pos + 1, cur + 1)
                for x in (
                    F.lit(v),
                    F.lit(
                        _dt.datetime.fromtimestamp(
                            src.manifest(v)["committed_at_unix"],
                            tz=_dt.timezone.utc,
                        ).replace(tzinfo=None)
                    ),
                )
            ]
        )
        base = [F.col(key), F.col("warc_ts"), *[_pcol(c) for c in payload]]

        opens = cdf.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(
            *base,
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.col("_row_lsn").alias("_src_lsn"),
            F.col("_commit_version"),
        )
        posts = cdf.where(F.col("_change_type") == "update_postimage").select(
            F.col(key), F.col("_commit_version"),
            F.col("warc_ts").alias("_close_ts"),
        )
        closes_u = (
            cdf.where(F.col("_change_type") == "update_preimage")
            .join(posts, on=[key, "_commit_version"])
            .select(
                *base,
                F.col("_close_ts").alias("valid_to"),
                F.col("_row_lsn").alias("_src_lsn"),
                F.col("_commit_version"),
            )
        )
        closes_d = cdf.where(F.col("_change_type") == "delete").select(
            *base,
            F.coalesce(
                F.col("_tombstone_ts"),
                F.element_at(commit_ts, F.col("_commit_version")),
            ).alias("valid_to"),
            F.col("_row_lsn").alias("_src_lsn"),
            F.col("_commit_version"),
        )
        rows = opens.unionByName(closes_u).unionByName(closes_d)
        rows = rows.withColumn("_hist_id", _hist_id(key))
        # latest image per interval: max_by over the whole row — a plain
        # two-phase HashAggregate (no window sort), O(span rows). The
        # rank is (_commit_version, is_close): _hist_id carries the full
        # LWW rank so a close and an open sharing an id are the SAME
        # version (e.g. delete + later re-insert of an identical rank);
        # on an equal commit the close wins deterministically instead of
        # leaving the tie to hash order.
        val = F.struct(
            *[F.col(c) for c in rows.columns if c != "_hist_id"]
        )
        rank = F.struct(
            F.col("_commit_version"),
            F.col("valid_to").isNotNull().cast("int").alias("_is_close"),
        )
        collapsed = rows.groupBy("_hist_id").agg(
            F.max_by(val, rank).alias("_v")
        )
        return collapsed.select(
            "_hist_id", *[F.col(f"_v.{c}").alias(c)
                          for c in rows.columns
                          if c not in ("_hist_id", "_commit_version")]
        )

    def refresh(self) -> dict[str, Any]:
        """Advance the history to the source's current version.

        First call bootstraps: when the earliest retained source snapshot
        is EMPTY the whole retained feed replays (full history from the
        table's birth); a NON-empty earliest (post-expiry, or a clone's
        v0) opens intervals from a full read at that version — intervals
        before it are unknowable — then consumes the feed from there.
        """
        self._check_hist_id_format()
        src = self._source()
        cur = src.current_version()
        hist = self._history_table(src)
        key, payload = self._payload(src)
        pos = self.position()
        boot = None
        if pos is None:
            pos = src.earliest_version()
            if src.manifest(pos)["files"]:
                self._bootstrap_full(src, hist, key, payload, pos)
                boot = pos
        else:
            try:
                src.manifest(pos)
            except FileNotFoundError:
                raise ChangeFeedLagError(
                    f"scd2 cursor v{pos} predates earliest retained "
                    f"snapshot of {src.path}; call resync()"
                ) from None
        if cur <= pos:
            if boot is not None:
                self._write_cursor(pos)
            return {"refreshed": boot is not None, "source_version": pos}
        try:
            rows = self._interval_rows(src, key, payload, pos, cur)
        except FileNotFoundError:
            raise ChangeFeedLagError(
                f"retained snapshots have a hole in ({pos}, {cur}] at "
                f"{src.path}; call resync()"
            ) from None
        out = hist.merge_into(
            rows,
            when_matched_update=True,
            when_not_matched_insert=True,
            # deterministic span encoding (ledger batch ids are int64):
            # replaying the same span is eaten by the applied-batch guard
            batch_id=(pos << 32) | cur,
        )
        self._write_cursor(cur)
        return {
            "refreshed": True,
            "source_version": cur,
            "from_version": pos,
            "bootstrapped_full": boot,
            "merge": {k: out[k] for k in ("skipped",) if k in out},
        }

    def _bootstrap_full(
        self, src: LakeTable, hist: LakeTable, key: str,
        payload: list[str], version: int,
    ) -> None:
        """Open an interval per live row of snapshot ``version`` (lsn from
        the physical read — the CDF cannot see pre-cut rows). Payload
        columns resolve by FIELD ID against snapshot ``version``'s
        manifest (same by-id resolution as ``_interval_rows``): a column
        renamed after the earliest retained version still bootstraps its
        values from the snapshot's old physical name instead of silently
        opening with the default. Columns whose field did not exist at
        ``version`` open with the column's declared initial default (what
        the engine reads for pre-add rows under the current schema), else
        null."""
        from .cdf_source import _coerce_default

        m = src.manifest()
        src_schema = T.StructType.fromJson(m["schema"])
        col_defaults = m.get("column_defaults") or {}
        fids = m.get("field_ids") or {}
        eps = m.get("schema_epochs") or []
        m_v = src.manifest(version)
        live = src.read_physical(version=version).where(
            ~F.coalesce(F.col("is_deleted"), F.lit(True))
        )
        have = set(live.columns)

        def _phys_name(c: str) -> str | None:
            """Column ``c``'s physical name at snapshot ``version`` (by
            field id — the same ``_name_in_manifest`` rule the span
            reader applies); None when the field did not exist yet."""
            fid = fids.get(c)
            if fid is None or not eps:
                return c  # no DDL ever happened: names are stable
            return _name_in_manifest(fid, m_v, eps)

        def _fill(c: str):
            dt_ = src_schema[c].dataType
            d = col_defaults.get(c)
            v = _coerce_default(d, dt_) if d is not None else None
            return F.lit(v).cast(dt_).alias(c)

        def _sel(c: str):
            phys = _phys_name(c)
            if phys is not None and phys in have:
                return F.col(phys).cast(src_schema[c].dataType).alias(c)
            return _fill(c)

        rows = live.select(
            F.col(key),
            F.col("warc_ts"),
            *[_sel(c) for c in payload],
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.col("lsn").alias("_src_lsn"),
        ).withColumn("_hist_id", _hist_id(key))
        hist.merge_into(
            rows,
            when_matched_update=True,
            when_not_matched_insert=True,
            batch_id=-(version + 2),  # negative: never collides with spans
        )

    # ------------------------------------------------------------- resync

    def resync(self) -> dict[str, Any]:
        """Repair after source retention outran the cursor.

        History captured so far is kept (it cannot be recomputed — the
        snapshots are gone). The endpoints are reconciled against the
        source head: still-open intervals whose version is no longer live
        are closed (at the superseding live version's ``warc_ts``, the
        surviving tombstone's, or — both gone — the head commit's wall
        time, counted as ``closed_unknown_end``), and live versions with
        no open interval get one. The interior of the lag window stays
        unknowable and is reported, not invented.
        """
        self._check_hist_id_format()
        src = self._source()
        cur = src.current_version()
        hist = self._history_table(src)
        key, payload = self._payload(src)

        phys = src.read_physical(version=cur)
        live = phys.where(~F.coalesce(F.col("is_deleted"), F.lit(True)))
        tomb = phys.where(F.coalesce(F.col("is_deleted"), F.lit(False)))
        open_iv = hist.read().where(F.col("valid_to").isNull()).select(
            F.col("_hist_id"),
            F.col(key).alias("_k"),
            F.col("warc_ts").alias("_sts"),
            F.col("_src_lsn"),
        )
        lv = live.select(
            F.col(key).alias("_k"),
            F.col("lsn").alias("_llsn"),
            F.col("warc_ts").alias("_lts"),
            *[F.col(c).alias(f"_p_{c}") for c in payload],
        )
        j = open_iv.join(lv, on="_k", how="full_outer")

        # version identity is the FULL LWW rank (warc_ts, lsn) — an
        # equal-lsn update that won on warc_ts is a different version
        same_version = (F.col("_src_lsn") == F.col("_llsn")) & (
            F.col("_sts") == F.col("_lts")
        )
        # a) live version with no matching open interval → open it
        opens = (
            j.where(
                F.col("_llsn").isNotNull()
                & (F.col("_src_lsn").isNull() | ~same_version)
            )
            .select(
                F.col("_k").alias(key),
                F.col("_lts").alias("warc_ts"),
                *[F.col(f"_p_{c}").alias(c) for c in payload],
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.col("_llsn").alias("_src_lsn"),
            )
            .dropDuplicates([key, "warc_ts", "_src_lsn"])
            .withColumn("_hist_id", _hist_id(key))
        )
        # b) open interval whose version is gone → close it
        head_ts = _dt.datetime.fromtimestamp(
            src.manifest(cur)["committed_at_unix"], tz=_dt.timezone.utc
        ).replace(tzinfo=None)
        tb = tomb.select(
            F.col(key).alias("_k"), F.col("warc_ts").alias("_tts")
        )
        stale = j.where(
            F.col("_src_lsn").isNotNull()
            & (F.col("_llsn").isNull() | ~same_version)
        ).join(tb, on="_k", how="left")
        close_ts = F.coalesce(F.col("_lts"), F.col("_tts"), F.lit(head_ts))
        n_unknown = stale.where(
            F.col("_lts").isNull() & F.col("_tts").isNull()
        ).count()
        # closes re-carry the open row's own values; payload columns the
        # source gained since the interval was captured null-fill (the
        # target row holds no value for them either — no-op overwrite)
        src_schema = T.StructType.fromJson(src.manifest()["schema"])
        hist_public = set(self._hist_public(hist))
        hist_rows = hist.read().select(
            "_hist_id",
            "warc_ts",
            *[
                F.col(c)
                if c in hist_public
                else F.lit(None).cast(src_schema[c].dataType).alias(c)
                for c in [key, "_src_lsn", *payload]
            ],
        )
        closes = (
            stale.select("_hist_id", close_ts.alias("valid_to"))
            .join(hist_rows, on="_hist_id")
        )
        rows = opens.unionByName(closes, allowMissingColumns=False)
        out = hist.merge_into(
            rows,
            when_matched_update=True,
            when_not_matched_insert=True,
            # fresh id each call: resync rows are re-derived from current
            # state, so re-application converges without the guard
            batch_id=-(uuid.uuid4().int >> 66),
        )
        self._write_cursor(cur)
        return {
            "resynced": True,
            "source_version": cur,
            "closed_unknown_end": int(n_unknown),
            "merge_skipped": bool(out.get("skipped", False)),
        }
