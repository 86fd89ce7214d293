"""ChangeFeedConsumer — checkpointed incremental reads of a lake table.

The downstream half of the CDC loop: where :class:`~.table.LakeTable`
*applies* a binlog, a consumer *tails the table itself* — each poll
returns the row-level changes committed since the consumer's cursor
(via :meth:`LakeTable.changes_between`, so per-commit bucket pruning
applies) and the cursor advances only on an explicit ``commit()``.

Delivery semantics mirror a Kafka consumer group of one:

- **at-least-once** by construction — crash between processing and
  ``commit()`` re-delivers the same version range on the next poll;
- **exactly-once** end-to-end when the downstream write is idempotent
  per ``(key, _commit_version)`` — which every LWW-shaped sink is,
  including another LakeTable.

Reference analogue: the Firestore pagination cursor that lets the
reference's chained cloud functions resume mid-symbol
(/root/reference/fintick/controllers/base.py:80-99) — here the cursor is
a table *version*, not a page id, so one consumer survives compaction,
retention and schema evolution in the upstream table.

Snapshot retention is the offset-out-of-range hazard: if
``expire_snapshots`` removed the manifests the cursor needs, ``poll``
raises :class:`ChangeFeedLagError` (resync by re-reading the full table
and restarting the cursor at its version) — size ``keep_last`` to cover
the slowest consumer, exactly like Kafka retention vs consumer lag.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable


class ChangeFeedLagError(RuntimeError):
    """The consumer's cursor points below the earliest retained snapshot
    (``expire_snapshots`` outpaced this consumer)."""


class ChangeFeedConsumer:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        checkpoint_path: str,
        start_version: int | None = None,
    ):
        """``start_version`` seeds a NEW cursor only (an existing
        checkpoint wins): ``None`` starts from the earliest retained
        snapshot (full bootstrap through the feed); ``table.current_
        version()`` starts tail-only."""
        self.spark = spark
        self.table = LakeTable.load(spark, table_path)
        self.checkpoint_path = os.path.abspath(checkpoint_path)
        self._start_version = start_version

    # ------------------------------------------------------------ cursor

    def position(self) -> int:
        """Version up to which changes are committed as consumed."""
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as fh:
                return int(json.load(fh)["version"])
        if self._start_version is not None:
            return self._start_version
        earliest = self.table.earliest_version()
        if self.table.manifest(earliest)["files"]:
            # a non-empty earliest snapshot (post-expiry / clone v0) holds
            # rows NO retained change feed covers: a CDF-only bootstrap
            # would silently miss them (review fix)
            raise ChangeFeedLagError(
                f"earliest retained snapshot v{earliest} of "
                f"{self.table.path} is non-empty; seed the consumer from "
                "a full read and pass start_version, or start tail-only "
                f"with start_version={self.table.current_version()}"
            )
        return earliest

    def commit(self, version: int) -> None:
        """Durably advance the cursor (atomic overwrite through the
        source table's :class:`~.commit_backend.CommitBackend`, so the
        cursor survives the same storage the table does; one consumer
        per checkpoint path, like one streaming query per Spark
        checkpoint)."""
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)
        self.table.backend.put(
            self.checkpoint_path, json.dumps({"version": int(version)}).encode()
        )

    # -------------------------------------------------------------- poll

    def poll(self) -> tuple[DataFrame, int] | None:
        """Return ``(changes, to_version)`` for everything committed since
        the cursor, or ``None`` when caught up. The caller processes the
        DataFrame, then calls ``commit(to_version)``; until it does,
        re-polling re-delivers the same range."""
        pos = self.position()
        cur = self.table.current_version()
        if cur is None or cur <= pos:
            return None
        try:
            self.table.manifest(pos)
        except FileNotFoundError:
            earliest = self.table.earliest_version()
            raise ChangeFeedLagError(
                f"cursor v{pos} predates earliest retained snapshot "
                f"v{earliest} at {self.table.path}; resync from a full read"
            ) from None
        try:
            return self.table.changes_between(pos, cur), cur
        except FileNotFoundError:
            # a retention hole INSIDE (pos, cur] (tag-pinned survivor
            # with expired neighbours) — same remedy as an expired cursor
            raise ChangeFeedLagError(
                f"retained snapshots have a hole in ({pos}, {cur}] at "
                f"{self.table.path}; resync from a full read"
            ) from None

    # --------------------------------------------------------- metrics

    def lag(self) -> dict[str, Any]:
        """Consumer lag in versions (the ledger gives event-level lag).

        A pure metrics probe: never raises for a fresh consumer whose
        table has a non-empty earliest snapshot — that guard belongs to
        the DELIVERY path (:meth:`position` via :meth:`poll`), not to a
        health check. Such a consumer reports lag from the earliest
        retained version plus ``bootstrap_required=True``."""
        cur = self.table.current_version() or 0
        try:
            pos = self.position()
        except ChangeFeedLagError:
            pos = self.table.earliest_version()
            return {
                "position": pos,
                "latest": cur,
                "versions_behind": cur - pos,
                "bootstrap_required": True,
            }
        return {"position": pos, "latest": cur, "versions_behind": cur - pos}
