"""Incremental (cross-batch) data-driven bars — the distributed carry path.

The bar kernels (operators/bars.py) are sequential per symbol and carry a
cache (accumulator + partial bar). The reference persists that cache in
Firestore between daily runs (/root/reference/fintick/aggregators/base.py:
255-271 — ``get_cache``/``set_cache`` around each ``process_data_frame``).
Here the same carry is a **versioned state manifest committed atomically
with the emitted bars** (SURVEY.md §7.3 hard-part #4's carry-table
option):

- Each micro-batch runs one ``applyInPandas`` pass, one kernel per
  symbol. The per-symbol cache enters via closure (read from the current
  manifest) and leaves as a JSON sidecar row of the same Arrow output —
  no second job, no Python state store.
- A commit = write the batch's bar parquet + rename ``state/v{N}.json``
  into place (the LakeTable manifest discipline). Crash between the two
  leaves only an orphan parquet; the manifest still references the old
  state, so replaying the micro-batch regenerates identical bars —
  exactly-once via the recorded ``applied_batches`` ids, same as
  ``LakeTable.merge_apply``.
- Stream-applied bars ≡ single-shot batch bars (the reference's
  split-vs-whole property, /root/reference/test/test_renko_aggregator.py:
  26-54) because the kernels are split-equivalent by construction and the
  batch boundary is just another split point.

Scale: parallelism = number of symbols (each symbol's stream is an
independent total order — the reference's one-function-per-symbol model).
The carry state is O(symbols) small JSON (a partial bar + a float per
symbol); the driver-side manifest write is metadata, like the ledger.
Bars-to-date reads are manifest-pruned parquet scans.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.bars import (
    RENKO_BAR_SCHEMA,
    THRESH_BAR_SCHEMA,
    _bars_df,
    cache_from_json,
    cache_to_json,
    renko_bars_pandas,
    thresh_bars_pandas,
)


def _fmt_version(v: int) -> str:
    return f"v{v:08d}.json"


#: applied-batch ids retained verbatim in the state manifest; older ids
#: collapse into ``applied_floor`` (ids are monotone within a streaming
#: query, so "id ≤ floor" ≡ "id in the dropped prefix") — without the
#: bound a 1-batch/sec stream would rewrite ~86k ids into every manifest
#: version per day, making commit cost linear in stream age
_MAX_APPLIED = 512


class IncrementalBars:
    """Cross-batch threshold/renko bars with atomic carry-state commits.

    kind="thresh": params thresh_attr, thresh_value, top_n, era.
    kind="renko":  params box_size, top_n.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        kind: str = "thresh",
        *,
        thresh_attr: str = "volume",
        thresh_value: float = 0.0,
        box_size: float = 0.0,
        top_n: int = 0,
        era: str | None = None,
    ):
        if kind not in ("thresh", "renko"):
            raise ValueError(f"kind must be thresh|renko, got {kind!r}")
        # fail at construction, not as a hung executor task: the thresh
        # kernel's cut search never advances for a non-positive threshold,
        # and renko_level divides by box_size
        if kind == "thresh" and not float(thresh_value) > 0:
            raise ValueError(
                f"kind='thresh' requires thresh_value > 0, got {thresh_value!r}"
            )
        if kind == "renko" and not float(box_size) > 0:
            raise ValueError(
                f"kind='renko' requires box_size > 0, got {box_size!r}"
            )
        self.spark = spark
        self.path = os.path.abspath(path)
        self.kind = kind
        self.thresh_attr = thresh_attr
        self.thresh_value = float(thresh_value)
        self.box_size = float(box_size)
        self.top_n = int(top_n)
        self.era = era
        self.state_dir = os.path.join(self.path, "state")
        self.bars_dir = os.path.join(self.path, "bars")
        os.makedirs(self.state_dir, exist_ok=True)
        os.makedirs(self.bars_dir, exist_ok=True)
        base = THRESH_BAR_SCHEMA if kind == "thresh" else RENKO_BAR_SCHEMA
        #: applyInPandas output = bar schema + nullable JSON cache sidecar
        self.out_schema = T.StructType(
            list(base.fields) + [T.StructField("_cache", T.StringType(), True)]
        )
        self.bar_schema = base

    # ----------------------------------------------------------- manifest

    def current_version(self) -> int | None:
        versions = [
            int(f[1:-5]) for f in os.listdir(self.state_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def manifest(self) -> dict[str, Any]:
        v = self.current_version()
        if v is None:
            return {"version": -1, "applied_batches": [], "caches": {}, "bar_dirs": []}
        with open(os.path.join(self.state_dir, _fmt_version(v))) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict[str, Any]) -> None:
        tmp = os.path.join(self.state_dir, f".tmp-{uuid.uuid4()}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.state_dir, _fmt_version(manifest["version"])))

    def caches(self) -> dict[str, dict[str, Any] | None]:
        """Current per-symbol kernel caches (deserialized)."""
        return {
            s: cache_from_json(c) for s, c in self.manifest()["caches"].items()
        }

    def partials(self) -> dict[str, dict[str, Any] | None]:
        """Trailing partial bar per symbol (the reference's in-flight
        ``nextDay`` cache — not yet emitted)."""
        return {
            s: (c or {}).get("partial") for s, c in self.caches().items()
        }

    # -------------------------------------------------------------- apply

    def apply_batch(self, ticks: DataFrame, batch_id: int) -> dict[str, Any]:
        m = self.manifest()
        if (
            batch_id <= m.get("applied_floor", -1)
            or batch_id in set(m["applied_batches"])
        ):
            return {"skipped": True, "batch_id": batch_id}

        kind = self.kind
        thresh_attr, thresh_value = self.thresh_attr, self.thresh_value
        box_size, top_n, era = self.box_size, self.top_n, self.era
        caches_json: dict[str, str] = dict(m["caches"])  # closure-shipped
        fields = [f.name for f in self.bar_schema.fields if f.name != "symbol"]
        out_cols = [f.name for f in self.out_schema.fields]

        def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            symbol = key[0] if key else None
            cache = cache_from_json(caches_json.get(symbol))
            if kind == "thresh":
                bars, cache2 = thresh_bars_pandas(
                    pdf, thresh_attr, thresh_value, top_n=top_n,
                    cache=cache, era=era,
                )
            else:
                bars, cache2 = renko_bars_pandas(
                    pdf, box_size, top_n=top_n, cache=cache
                )
            # one materialization path for bar rows (operators.bars._bars_df
            # — shared with the batch wrappers so the two cannot drift),
            # plus the JSON cache sidecar row this streaming face adds
            bdf = _bars_df(bars, symbol, fields)
            bdf["_cache"] = None
            sidecar = {k: None for k in fields}
            sidecar["symbol"] = symbol
            sidecar["_cache"] = cache_to_json(cache2)
            return pd.concat(
                [bdf, pd.DataFrame([sidecar])], ignore_index=True
            )[out_cols]

        out = ticks.groupBy("symbol").applyInPandas(fn, self.out_schema)
        out = out.persist()
        try:
            rel_dir = f"bars/batch-{batch_id}-{uuid.uuid4().hex[:8]}"
            bar_rows = out.where(F.col("_cache").isNull()).drop("_cache")
            bar_rows.write.mode("overwrite").parquet(os.path.join(self.path, rel_dir))
            # sidecar rows: exactly one per symbol present in the batch.
            # This collect is bounded by SYMBOL CARDINALITY, not data
            # volume — market symbol universes are O(10³-10⁴) and each
            # cache row is a few hundred bytes of partial-bar state, so
            # the driver holds ≤ a few MB regardless of tick volume. For
            # an unbounded key space use state_bars.stateful_bars, which
            # keeps the carry in the executor-side state store instead.
            new_caches = {
                r["symbol"]: r["_cache"]
                for r in out.where(F.col("_cache").isNotNull())
                .select("symbol", "_cache")
                .collect()
            }
        finally:
            out.unpersist()

        # symbols absent from this batch keep their previous cache
        caches_json.update(new_caches)
        applied = m["applied_batches"] + [batch_id]
        floor = m.get("applied_floor", -1)
        if len(applied) > _MAX_APPLIED:
            applied.sort()
            drop = len(applied) - _MAX_APPLIED
            floor = max(floor, applied[drop - 1])
            applied = applied[drop:]
        self._commit(
            {
                "version": m["version"] + 1,
                "applied_batches": applied,
                "applied_floor": floor,
                "caches": caches_json,
                "bar_dirs": m["bar_dirs"] + [rel_dir],
                "params": {
                    "kind": kind, "thresh_attr": thresh_attr,
                    "thresh_value": thresh_value, "box_size": box_size,
                    "top_n": top_n, "era": era,
                },
                "committed_at_unix": time.time(),
            }
        )
        return {"batch_id": batch_id, "n_symbols": len(new_caches)}

    # --------------------------------------------------------------- read

    def read(self) -> DataFrame:
        """All bars emitted so far (manifest-referenced files only —
        orphans from a crashed batch are invisible)."""
        dirs = self.manifest()["bar_dirs"]
        paths = [os.path.join(self.path, d) for d in dirs]
        paths = [p for p in paths if os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )]
        if not paths:
            return self.spark.createDataFrame([], self.bar_schema)
        return self.spark.read.schema(self.bar_schema).parquet(*paths)

    # -------------------------------------------------------- maintenance

    def compact_bars(self, max_dirs: int = 16) -> int:
        """Fold the per-batch bar directories into one when they exceed
        ``max_dirs`` (a long-running stream otherwise accumulates one
        small parquet dir per micro-batch — the small-files problem).
        Pure rewrite: bar rows are immutable once emitted. Returns the
        number of directories folded (0 = nothing to do)."""
        m = self.manifest()
        if len(m["bar_dirs"]) <= max_dirs:
            return 0
        df = self.read()
        rel = f"bars/compact-{uuid.uuid4().hex[:8]}"
        df.repartition("symbol").write.mode("overwrite").parquet(
            os.path.join(self.path, rel)
        )
        folded = len(m["bar_dirs"])
        self._commit(
            {
                **m,
                "version": m["version"] + 1,
                "bar_dirs": [rel],
                "committed_at_unix": time.time(),
            }
        )
        return folded

    def expire_state(self, keep_last: int = 2) -> int:
        """Drop old state manifests and bar dirs no longer referenced by
        the kept versions (crash-orphan GC, LakeTable.expire_snapshots
        analogue). Returns removed file count."""
        import shutil

        cur = self.current_version()
        if cur is None:
            return 0
        keep = set(range(max(0, cur - keep_last + 1), cur + 1))
        referenced: set[str] = set()
        for v in sorted(keep):
            p = os.path.join(self.state_dir, _fmt_version(v))
            if os.path.exists(p):
                with open(p) as fh:
                    referenced |= set(json.load(fh)["bar_dirs"])
        removed = 0
        now = time.time()
        for f in list(os.listdir(self.state_dir)):
            p = os.path.join(self.state_dir, f)
            if f.startswith("v") and f.endswith(".json") and int(f[1:-5]) not in keep:
                os.remove(p)
                removed += 1
            elif f.startswith(".tmp-") and f.endswith(".json"):
                # crash-orphaned commit staging file (_commit died between
                # write and rename); age-guarded so a concurrent in-flight
                # commit's staging file survives
                try:
                    if now - os.path.getmtime(p) > 3600:
                        os.remove(p)
                        removed += 1
                except OSError:
                    pass
        for d in list(os.listdir(self.bars_dir)):
            rel = f"bars/{d}"
            if rel not in referenced:
                shutil.rmtree(os.path.join(self.bars_dir, d), ignore_errors=True)
                removed += 1
        return removed

    # ---------------------------------------------------------- streaming

    def run_stream(
        self,
        ticks_dir: str,
        checkpoint_dir: str,
        schema: T.StructType,
        max_files_per_trigger: int = 1,
        available_now: bool = True,
        timeout_secs: float | None = 300,
    ):
        """Tail a parquet tick directory; each micro-batch extends the bars
        and carry state in one atomic commit (checkpoint restart replays
        the last batch id; ``apply_batch`` skips applied ids)."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(ticks_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df, bid) and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName(f"bars_{self.kind}_{os.path.basename(self.path)}")
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
        else:
            q = writer.trigger(processingTime="1 second").start()
        q.awaitTermination(timeout_secs) if timeout_secs else q.awaitTermination()
        return q
