"""Incrementally-maintained MinHash-LSH index over a LakeTable change feed.

The bridge between the CDC engine and the corpus-dedup operators: a
band-bucket index of the lake's LIVE pages, kept current from
:meth:`LakeTable.changes_between` so a micro-batch of newly-ingested
pages can be near-dup-checked against the WHOLE corpus without ever
re-scanning or re-hashing it. Per refresh the index pays
O(changed keys + live band rows of their buckets); a probe pays one
broadcast join against the index scan. Compare the batch path
(:func:`~..operators.dedup.lsh_candidate_pairs`): re-shingling 100 TB
per ingest batch is the thing this module exists to avoid.

Index contents: one row per (key, band, band_hash) of every live page —
the exact output of :func:`~..operators.dedup.lsh_band_rows` over
:func:`~..operators.dedup.minhash_signature`, so incremental maintenance
and a from-scratch rebuild are bit-identical (the tests assert it).

Maintenance rule (index form of incremental view maintenance): per
refresh, resolve each changed key to its LAST image in the consumed
version span (``max_by(_commit_version)``, preimages dropped); delete →
remove the key's band rows, insert/update → replace them with rows
derived from the new text. Replacement = anti-join out every changed
key, union in rows for keys whose final image is live.

Physical layout mirrors the source table: band rows live in the SAME
``pmod(xxhash64(key), n_buckets)`` hash buckets as the lake table, so a
refresh rewrites only the buckets its changed keys fall in (manifest
file skipping, CoW per bucket) — never O(index). The probe joins on
(band, band_hash), which hits every bucket by construction; the probe
side (one micro-batch) is broadcast, so the index scan is shuffle-free.

Durability matches :class:`~.matview.MaterializedAggregate`: per-refresh
parquet state dirs plus one JSON manifest mapping bucket → data dir and
holding the consumed source version, committed with a single atomic
``os.replace``. Crash between data write and manifest replace leaves
the old manifest; the re-run re-derives identical deltas (the CDF
between two fixed versions is deterministic), so refresh is idempotent.
Exposes ``refresh()`` with the same contract as MaterializedAggregate,
so ``CdcPipeline(views=[index])`` maintains it inside the streaming
apply loop.

Reference analogue: the reference dedups only on exchange-assigned uids
(/root/reference/fintick/controllers/base.py:88-99). Content-derived
near-dup against the full history is the generalization a web-pages
lake needs, and doing it incrementally is what makes it affordable at
10^10 events.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import lsh_band_rows, minhash_signature
from .consumer import ChangeFeedLagError
from .table import LakeTable

_LIVE_TYPES = ("insert", "update_postimage")


class MaterializedLshIndex:
    """A MinHash-LSH band index maintained from a source table's CDF."""

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        view_path: str,
        text_col: str = "text",
        k: int = 8,
        bands: int = 4,
    ):
        self.spark = spark
        self.source_path = source_path
        self.view_path = os.path.abspath(view_path)
        self.text_col = text_col
        self.k = k
        self.bands = bands
        os.makedirs(self.view_path, exist_ok=True)

    # ----------------------------------------------------------- manifest

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.view_path, "index.json")

    def _manifest(self) -> dict[str, Any] | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def position(self) -> int | None:
        """Source version the index reflects (None = never built)."""
        m = self._manifest()
        return None if m is None else int(m["source_version"])

    def _schema(self, key: str) -> T.StructType:
        return T.StructType(
            [
                T.StructField(key, T.StringType(), True),
                T.StructField("band", T.IntegerType(), False),
                T.StructField("bh", T.LongType(), True),
            ]
        )

    # -------------------------------------------------------------- reads

    def read(self) -> DataFrame:
        """All live band rows: (key, band, bh)."""
        m = self._manifest()
        if m is None:
            raise FileNotFoundError(
                f"lsh index at {self.view_path} was never refreshed"
            )
        src = LakeTable.load(self.spark, self.source_path)
        paths = [os.path.join(self.view_path, rel) for rel in m["buckets"].values()]
        if not paths:
            return self.spark.createDataFrame([], self._schema(src.key))
        return self.spark.read.schema(self._schema(src.key)).parquet(*paths)

    def _read_buckets(self, m: dict[str, Any], key: str, bids: list[int]) -> DataFrame:
        parts = []
        for b in bids:
            rel = m["buckets"].get(str(b))
            if rel is None:
                continue
            parts.append(
                self.spark.read.schema(self._schema(key))
                .parquet(os.path.join(self.view_path, rel))
                .withColumn("_ib", F.lit(b))
            )
        if not parts:
            return self.spark.createDataFrame(
                [], self._schema(key).add("_ib", T.IntegerType(), False)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -------------------------------------------------------------- probe

    def probe(self, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
        """(probe_id, index_id) candidate near-dup pairs for a batch of
        new docs against the indexed corpus.

        The probe side is one micro-batch — broadcast it; the index scan
        then joins in place with no shuffle (the 100 TB shape: the big
        side never moves). Pairs where the probe doc IS the indexed doc
        (same key — an update probing against its own old rows) are
        excluded. Probe-batch-internal pairs are NOT covered here; run
        :func:`~..operators.dedup.lsh_candidate_pairs` on the batch
        itself (it is small) if those matter.
        """
        src = LakeTable.load(self.spark, self.source_path)
        if id_col == src.key:
            raise ValueError(
                f"probe id_col {id_col!r} collides with the index key; alias it"
            )
        sig = minhash_signature(
            docs, id_col=id_col, text_col=self.text_col, k=self.k
        )
        pb = lsh_band_rows(sig, id_col=id_col, k=self.k, bands=self.bands)
        return (
            self.read()
            .join(F.broadcast(pb), on=["band", "bh"])
            .where(F.col(id_col) != F.col(src.key))
            .select(
                F.col(id_col).alias("probe_id"),
                F.col(src.key).alias("index_id"),
            )
            .distinct()
        )

    # ------------------------------------------------------------ refresh

    def _band_rows(self, live: DataFrame, key: str) -> DataFrame:
        sig = minhash_signature(
            live, id_col=key, text_col=self.text_col, k=self.k
        )
        return lsh_band_rows(sig, id_col=key, k=self.k, bands=self.bands)

    def refresh(self, to_version: int | None = None) -> dict[str, Any]:
        """Advance the index to the source's current version (or to a
        pinned ``to_version`` — the NearDupMonitor pins it so its probe
        log and the index can never desync under a concurrent commit).

        First call bootstraps through the CDF from the source's earliest
        retained snapshot when that snapshot is EMPTY (identical math —
        inserts only); a NON-empty earliest (post-``expire_snapshots``,
        or a clone's v0) falls back to :meth:`rebuild`'s full read — the
        CDF alone cannot see rows already live at the cut (review fix).
        Raises :class:`ChangeFeedLagError` when ``expire_snapshots``
        outran the cursor; :meth:`rebuild` resyncs from a full read.
        """
        src = LakeTable.load(self.spark, self.source_path)
        cur = src.current_version() if to_version is None else int(to_version)
        m = self._manifest()
        if m is None:
            pos = src.earliest_version()
            if src.manifest(pos)["files"]:
                out = self.rebuild(to_version=cur)
                return {"refreshed": True,
                        "source_version": out["source_version"],
                        "from_version": None, "bootstrapped_full": True}
        else:
            pos = int(m["source_version"])
        if cur <= pos:
            return {"refreshed": False, "source_version": pos}
        try:
            src.manifest(pos)
        except FileNotFoundError:
            raise ChangeFeedLagError(
                f"index cursor v{pos} predates earliest retained snapshot of "
                f"{src.path}; call rebuild() to resync from a full read"
            ) from None

        key = src.key
        # the index's bucket layout is pinned at its own birth: source
        # rebucket / spec evolution must not re-address stored dirs
        # (review fix — a source-current bucket expr would orphan old
        # keys' band rows and leave stale candidates behind)
        nb = int(m.get("n_buckets") or self._source_n_buckets(src)) if m \
            else self._source_n_buckets(src)
        ib = F.pmod(F.xxhash64(F.col(key)), F.lit(nb)).cast("int")
        try:
            ch = src.changes_between(pos, cur).where(
                F.col("_change_type") != "update_preimage"
            )
        except FileNotFoundError:
            raise ChangeFeedLagError(
                f"retained snapshots have a hole in ({pos}, {cur}] at "
                f"{src.path}; call rebuild() to resync from a full read"
            ) from None
        # last image per key in the span: at most one non-preimage row per
        # key per commit (the MERGE is LWW-compacted), so max_by over the
        # commit version is unambiguous.
        final = ch.groupBy(key).agg(
            F.max_by(
                F.struct(
                    F.col("_change_type").alias("ct"),
                    F.col(self.text_col).alias("txt"),
                ),
                F.col("_commit_version"),
            ).alias("f")
        )
        final = final.select(
            key,
            F.col("f.ct").alias("_ct"),
            F.col("f.txt").alias(self.text_col),
            ib.alias("_ib"),
        ).localCheckpoint(eager=True)  # reused 3×: touched set, anti-join, live rows

        touched = sorted(
            r["_ib"] for r in final.select("_ib").distinct().collect()
        )  # ≤ n_buckets rows — driver-safe by construction
        live = final.where(F.col("_ct").isin(*_LIVE_TYPES)).select(
            key, self.text_col
        )
        new_rows = self._band_rows(live, key).withColumn("_ib", ib)

        kept = self._read_buckets(m or {"buckets": {}}, key, touched).join(
            final.select(key), key, "left_anti"
        )  # changed-key set is one micro-batch — AQE broadcasts it
        merged = kept.unionByName(new_rows.select(*kept.columns))

        rel = f"state-{cur}-{str(uuid.uuid4())[:8]}"
        root = os.path.join(self.view_path, rel)
        merged.write.partitionBy("_ib").parquet(root)

        buckets = dict((m or {}).get("buckets", {}))
        for b in touched:
            sub = os.path.join(rel, f"_ib={b}")
            if os.path.isdir(os.path.join(self.view_path, sub)):
                buckets[str(b)] = sub
            else:  # bucket emptied (all its keys deleted)
                buckets.pop(str(b), None)
        self._commit({"source_version": cur, "buckets": buckets,
                      "n_buckets": nb})
        return {
            "refreshed": True,
            "source_version": cur,
            "from_version": pos,
            "touched_buckets": touched,
        }

    def rebuild(self, to_version: int | None = None) -> dict[str, Any]:
        """Recompute the index from a full source read (resync path after
        retention outran the cursor — also the oracle the tests compare
        incremental maintenance against). ``to_version`` pins the
        snapshot (bootstrap-fallback path); default = current."""
        src = LakeTable.load(self.spark, self.source_path)
        cur = src.current_version() if to_version is None else int(to_version)
        key = src.key
        nb = self._source_n_buckets(src)
        full = src.read(version=cur).select(key, self.text_col)
        rows = self._band_rows(full, key).withColumn(
            "_ib", F.pmod(F.xxhash64(F.col(key)), F.lit(nb)).cast("int")
        )

        rel = f"state-{cur}-{str(uuid.uuid4())[:8]}"
        rows.write.partitionBy("_ib").parquet(os.path.join(self.view_path, rel))
        buckets = {
            d.split("=", 1)[1]: os.path.join(rel, d)
            for d in os.listdir(os.path.join(self.view_path, rel))
            if d.startswith("_ib=")
        }
        self._commit({"source_version": cur, "buckets": buckets,
                      "n_buckets": nb})
        return {"rebuilt": True, "source_version": cur}

    @staticmethod
    def _source_n_buckets(src: "LakeTable") -> int:
        return int(src.n_buckets)

    # ------------------------------------------------------------- commit

    def _commit(self, manifest: dict[str, Any]) -> None:
        # atomic state+cursor commit through the source table's backend
        LakeTable(self.spark, self.source_path).backend.put(
            self._manifest_path, json.dumps(manifest).encode()
        )
        referenced = {rel.split(os.sep, 1)[0] for rel in manifest["buckets"].values()}
        for d in os.listdir(self.view_path):
            if d.startswith("state-") and d not in referenced:
                shutil.rmtree(os.path.join(self.view_path, d), ignore_errors=True)


class NearDupMonitor:
    """Ingest-time near-dup flagging: probe each consumed span of the
    change feed against the corpus AS OF the span's start, log the
    candidate pairs durably, then advance the owned LSH index.

    A CDC engine must not drop near-dups (source fidelity), but a
    training-data lake wants them FLAGGED at ingest so curation never
    re-scans the corpus. Per refresh:

    1. final post-images of the span ``(pos, cur]`` (same last-image rule
       as the index) are probed against the index — still at ``pos``, so
       matches are strictly new-vs-existing-corpus;
    2. the pairs land in a span-named parquet dir (rewritten whole on
       retry — crash-safe);
    3. the owned index refreshes to ``cur``;
    4. one atomic manifest replace commits cursor + live span list.

    Pass the monitor (NOT its inner index) in ``CdcPipeline(views=[...])``;
    the monitor sequences probe-before-index-advance itself, which is the
    ordering the semantics need. Span-internal pairs (two near-dup pages
    first seen in the same span) are not flagged here — same caveat as
    :meth:`MaterializedLshIndex.probe`; run the batch operator on the
    span itself if those matter.

    Crash recovery: a crash after the index advanced but before the
    manifest commit replays the span from the already-written log dir
    (the probe itself can no longer be re-run — the pre-span index state
    is gone); a crash mid-log-write rewrites the dir. Either way the
    manifest only ever lists complete spans.
    """

    _PROBE_ID = "_probe_url"

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        view_path: str,
        text_col: str = "text",
        k: int = 8,
        bands: int = 4,
    ):
        self.spark = spark
        self.source_path = source_path
        self.view_path = os.path.abspath(view_path)
        self.text_col = text_col
        self.index = MaterializedLshIndex(
            spark,
            source_path,
            os.path.join(self.view_path, "index"),
            text_col=text_col,
            k=k,
            bands=bands,
        )
        os.makedirs(self.view_path, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.view_path, "monitor.json")

    def _manifest(self) -> dict[str, Any]:
        if not os.path.exists(self._manifest_path):
            return {"source_version": None, "spans": []}
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def position(self) -> int | None:
        v = self._manifest()["source_version"]
        return None if v is None else int(v)

    def _flags_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("url", T.StringType(), True),
                T.StructField("match_url", T.StringType(), True),
                T.StructField("from_version", T.IntegerType(), False),
                T.StructField("to_version", T.IntegerType(), False),
            ]
        )

    def flags(self) -> DataFrame:
        """All logged near-dup candidate pairs: (url, match_url,
        from_version, to_version) — url is the newly-ingested page,
        match_url the pre-existing corpus page it collided with."""
        spans = self._manifest()["spans"]
        paths = [os.path.join(self.view_path, s) for s in spans]
        if not paths:
            return self.spark.createDataFrame([], self._flags_schema())
        return self.spark.read.schema(self._flags_schema()).parquet(*paths)

    def _cursor(self, src: LakeTable) -> int:
        v = self._manifest()["source_version"]
        return int(v) if v is not None else src.earliest_version()

    def refresh(self) -> dict[str, Any]:
        src = LakeTable.load(self.spark, self.source_path)
        pos = self._cursor(src)

        recovered = False
        ipos = self.index.position()
        if ipos is not None and ipos > pos:
            # Crashed after the index advanced (to the crashed run's
            # ``cur`` = ipos) but before the manifest commit. The
            # pre-span probe state is gone; the span log written before
            # the advance is the only valid record — recover it, then
            # consume anything newer normally.
            span = f"span-{pos}-{ipos}"
            if not os.path.isdir(os.path.join(self.view_path, span)):
                raise RuntimeError(
                    f"near-dup monitor at {self.view_path} lost span "
                    f"({pos}, {ipos}]: index is ahead but no span log "
                    "exists; the pre-span corpus state is unrecoverable — "
                    "accept the gap by removing index/ and monitor.json, "
                    "then refresh (re-bootstraps, future spans are exact)"
                )
            self._commit(ipos, self._manifest()["spans"] + [span])
            pos = ipos
            recovered = True

        cur = src.current_version()
        if cur <= pos:
            return {"refreshed": recovered, "source_version": pos}

        span = f"span-{pos}-{cur}"
        span_path = os.path.join(self.view_path, span)
        if self.index.position() is None:
            # Bootstrap: everything live at the cut IS the pre-existing
            # corpus, so the first span's log is empty by definition
            # (span-internal pairs are the documented gap). Write the
            # empty log BEFORE advancing the index — the reverse order
            # had a crash window that permanently wedged the monitor on
            # the line-below recovery check (review fix).
            self.spark.createDataFrame(
                [], self._flags_schema()
            ).write.mode("overwrite").parquet(span_path)
            self.index.refresh(to_version=cur)
        else:
            key = src.key
            ch = src.changes_between(pos, cur).where(
                F.col("_change_type").isin("insert", "update_postimage", "delete")
            )
            final = ch.groupBy(key).agg(
                F.max_by(
                    F.struct(
                        F.col("_change_type").alias("ct"),
                        F.col(self.text_col).alias("txt"),
                    ),
                    F.col("_commit_version"),
                ).alias("f")
            )
            live = final.where(
                F.col("f.ct") != F.lit("delete")
            ).select(
                F.col(key).alias(self._PROBE_ID),
                F.col("f.txt").alias(self.text_col),
            )
            pairs = self.index.probe(live, id_col=self._PROBE_ID).select(
                F.col("probe_id").alias("url"),
                F.col("index_id").alias("match_url"),
                F.lit(pos).alias("from_version"),
                F.lit(cur).alias("to_version"),
            )
            pairs.write.mode("overwrite").parquet(span_path)
            self.index.refresh(to_version=cur)

        n = self.spark.read.schema(self._flags_schema()).parquet(span_path).count()
        self._commit(cur, self._manifest()["spans"] + [span])
        return {
            "refreshed": True,
            "source_version": cur,
            "from_version": pos,
            "n_flags": n,
        }

    def _commit(self, cur: int, spans: list[str]) -> None:
        LakeTable(self.spark, self.source_path).backend.put(
            self._manifest_path,
            json.dumps({"source_version": cur, "spans": spans}).encode(),
        )
        live = set(spans)
        for d in os.listdir(self.view_path):
            if d.startswith("span-") and d not in live:
                shutil.rmtree(os.path.join(self.view_path, d), ignore_errors=True)
