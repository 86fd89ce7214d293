"""Incrementally-maintained aggregate views over a LakeTable change feed.

The CDC engine's derived-table story: a grouped COUNT/SUM view refreshed
from :meth:`LakeTable.changes_between` instead of re-scanning the table.
Each refresh reads only the rows that changed since the view's cursor —
per-refresh cost O(changed rows of touched buckets), never O(table) —
which is the entire point of keeping a change feed at 100 TB.

Maintenance rule (standard incremental view maintenance over a CDF):
``insert``/``update_postimage`` rows contribute +1, ``delete``/
``update_preimage`` rows contribute −1; COUNT and SUM are subtractable,
so the per-group delta aggregate merges into the stored state with one
small full-outer join. A group whose count reaches zero is dropped. An
update that MOVES a row between groups is handled for free: its preimage
decrements the old group, its postimage increments the new one.

Only subtractable aggregates are offered (count; sum of a deterministic
row expression). min/max are NOT — they need the full group to re-derive
after a delete; compose avg = sum/count downstream. Float sums would
accumulate order-dependent rounding drift versus a recompute; use integer
expressions where cross-checking matters (the tests do).

Durability: the view state is a parquet snapshot plus a tiny JSON
manifest holding (data dir, consumed source version), committed with one
atomic ``os.replace`` — cursor and state can never disagree. A crash
between data write and manifest replace leaves the old manifest; the
re-run re-derives the identical deltas (the CDF between two fixed
versions is deterministic), so refresh is idempotent.

Reference analogue: the hourly→daily consolidation jobs
(/root/reference/fintick/aggregators/*/lib.py) recompute daily frames
from hourly reads on a schedule; here the derived table advances
incrementally with exactly-once cursoring instead.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .consumer import ChangeFeedLagError
from .table import LakeTable


class MaterializedAggregate:
    """A grouped count/sum view maintained from a source table's CDF.

    ``sums`` maps output column name → deterministic per-row SQL
    expression over the source's public columns (evaluated identically on
    +1 and −1 images). ``n_rows`` (the group count) is always maintained.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        view_path: str,
        group_col: str,
        sums: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.source_path = source_path
        self.view_path = os.path.abspath(view_path)
        self.group_col = group_col
        self.sums = dict(sums or {})
        bad = set(self.sums) & {group_col, "n_rows", "_s"}
        if bad:
            raise ValueError(f"sum output names collide: {sorted(bad)}")
        os.makedirs(self.view_path, exist_ok=True)

    # ----------------------------------------------------------- manifest

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.view_path, "view.json")

    def _manifest(self) -> dict[str, Any] | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def position(self) -> int | None:
        """Source version the view state reflects (None = never built)."""
        m = self._manifest()
        return None if m is None else int(m["source_version"])

    # -------------------------------------------------------------- reads

    def read(self) -> DataFrame:
        m = self._manifest()
        if m is None:
            raise FileNotFoundError(
                f"view at {self.view_path} was never refreshed"
            )
        return self.spark.read.parquet(os.path.join(self.view_path, m["data"]))

    # ------------------------------------------------------------ refresh

    def _signed(self, changes: DataFrame) -> DataFrame:
        plus = F.col("_change_type").isin("insert", "update_postimage")
        sign = F.when(plus, F.lit(1)).otherwise(F.lit(-1))
        cols = [
            F.col(self.group_col),
            sign.alias("_s"),
            *[
                (sign * F.coalesce(F.expr(e), F.lit(0))).alias(name)
                for name, e in self.sums.items()
            ],
        ]
        return changes.select(*cols)

    def _delta_agg(self, signed: DataFrame) -> DataFrame:
        return signed.groupBy(self.group_col).agg(
            F.sum("_s").alias("n_rows"),
            *[F.sum(name).alias(name) for name in self.sums],
        )

    def refresh(self) -> dict[str, Any]:
        """Advance the view to the source's current version.

        First call bootstraps through the CDF from the source's earliest
        retained snapshot when that snapshot is EMPTY (identical math —
        inserts only); a NON-empty earliest (post-``expire_snapshots``,
        or a clone's v0) holds rows no retained change feed covers, so
        bootstrap falls back to :meth:`rebuild`'s full read (review fix —
        the CDF-only bootstrap silently missed those rows). Raises
        :class:`ChangeFeedLagError` when ``expire_snapshots`` outran the
        cursor; :meth:`rebuild` resyncs from a full read.
        """
        src = LakeTable.load(self.spark, self.source_path)
        cur = src.current_version()
        m = self._manifest()
        if m is None:
            pos = src.earliest_version()
            if src.manifest(pos)["files"]:
                out = self.rebuild()
                return {"refreshed": True, "source_version":
                        out["source_version"], "from_version": None,
                        "bootstrapped_full": True}
        else:
            pos = int(m["source_version"])
        if cur <= pos:
            return {"refreshed": False, "source_version": pos}
        try:
            src.manifest(pos)
        except FileNotFoundError:
            raise ChangeFeedLagError(
                f"view cursor v{pos} predates earliest retained snapshot of "
                f"{src.path}; call rebuild() to resync from a full read"
            ) from None

        try:
            delta = self._delta_agg(
                self._signed(src.changes_between(pos, cur))
            )
        except FileNotFoundError:
            # a retention hole INSIDE (pos, cur] (tag-pinned survivor) —
            # same remedy as an expired cursor
            raise ChangeFeedLagError(
                f"retained snapshots have a hole in ({pos}, {cur}] at "
                f"{src.path}; call rebuild() to resync from a full read"
            ) from None
        state = None if m is None else self.read()
        if state is not None:
            g = self.group_col
            merged = (
                state.alias("s")
                .join(
                    delta.alias("d"),
                    F.col(f"s.{g}").eqNullSafe(F.col(f"d.{g}")),
                    "full_outer",
                )
                .select(
                    F.coalesce(F.col(f"s.{g}"), F.col(f"d.{g}")).alias(g),
                    *[
                        (
                            F.coalesce(F.col(f"s.{c}"), F.lit(0))
                            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
                        ).alias(c)
                        for c in ("n_rows", *self.sums)
                    ],
                )
            )
        else:
            merged = delta
        merged = merged.where(F.col("n_rows") > 0)

        rel = f"state-{cur}-{str(uuid.uuid4())[:8]}"
        merged.coalesce(1).write.parquet(os.path.join(self.view_path, rel))
        old = None if m is None else m["data"]
        # atomic state+cursor commit through the source table's backend
        src.backend.put(
            self._manifest_path,
            json.dumps({"source_version": cur, "data": rel}).encode(),
        )
        self._sweep_unreferenced(keep=rel)
        return {"refreshed": True, "source_version": cur, "from_version": pos}

    def _sweep_unreferenced(self, keep: str) -> None:
        """Delete every ``state-*`` dir the just-committed manifest does
        not reference — a crash between state write and manifest replace
        leaves an orphan that would otherwise accumulate forever (same
        sweep the LSH index commit does)."""
        for d in os.listdir(self.view_path):
            if d.startswith("state-") and d != keep:
                shutil.rmtree(
                    os.path.join(self.view_path, d), ignore_errors=True
                )

    def rebuild(self) -> dict[str, Any]:
        """Recompute the view from a full source read (resync path after
        retention outran the cursor — also the oracle the tests compare
        incremental maintenance against)."""
        src = LakeTable.load(self.spark, self.source_path)
        cur = src.current_version()
        full = src.read(version=cur).groupBy(self.group_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(F.coalesce(F.expr(e), F.lit(0))).alias(name)
                for name, e in self.sums.items()
            ],
        )
        rel = f"state-{cur}-{str(uuid.uuid4())[:8]}"
        full.coalesce(1).write.parquet(os.path.join(self.view_path, rel))
        m = self._manifest()
        src.backend.put(
            self._manifest_path,
            json.dumps({"source_version": cur, "data": rel}).encode(),
        )
        self._sweep_unreferenced(keep=rel)
        return {"rebuilt": True, "source_version": cur}
