"""Policy-driven automatic table maintenance.

The lake exposes each maintenance primitive separately (`minor_compact`,
`compact_files`, `build_blooms`, `expire_rows`, `expire_snapshots`,
`remove_orphans`) — this module is the operator that decides WHEN to run
WHICH of them, the way Iceberg deployments wrap `rewrite_data_files` /
`expire_snapshots` in a scheduled policy job and Delta runs auto-OPTIMIZE.
The reference hard-wires one such policy — delete hourly partitions older
than six days on every ingest cycle
(/root/reference/fintick/bqloader/bqloader.py:9-13,
fintick/constants.py:52-53); here the policy is explicit data, the
conditions are measured from table health, and the actions are the lake's
own atomic commits.

Two-phase by design:

- :func:`plan_maintenance` inspects the table and returns the ordered
  action list WITHOUT executing anything — metadata-only (manifest JSON,
  the bloom side table's ``path`` column, a filesystem walk for orphans;
  no Spark job), so a scheduler can run it every few minutes for free.
- :func:`run_maintenance` executes a plan. Every action is one of the
  lake's atomic commits, each rebase-safe against concurrent merges
  (`_commit_file_swap`), so a maintenance daemon can run alongside the
  live CDC stream — exactly the north_rule's "merge-apply stage explicitly
  tuned for partition count, file-size compaction" knob, turned
  continuously instead of by hand.

Scale: at 10^5 files the plan is one manifest read (O(touched files) with
incremental delta manifests) + one small side-table column read; nothing
in planning touches data bytes.
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:  # pragma: no cover - import cycle guard, typing only
    from crypto_exchange_etl_spark.lake.table import LakeTable


@dataclass
class MaintenancePolicy:
    """Thresholds for :func:`plan_maintenance`. ``None`` disables a rule.

    Defaults mirror common Iceberg/Delta operational settings: drain
    merge-on-read backlogs at 8 deltas, bin-pack when a bucket collects 8
    sub-32MB files, rebuild blooms when half the files lack one, keep 7
    days of orphan grace — and leave snapshot expiry and row TTL opt-in,
    because both discard history.
    """

    #: fold a (spec, bucket) group when its delta backlog reaches this
    minor_compact_max_deltas: int | None = 8
    #: a data file below this is "small" for bin-packing purposes
    small_file_bytes: int = 32 * 1024 * 1024
    #: bin-pack the table when any bucket holds at least this many smalls
    small_files_per_bucket: int | None = 8
    #: target size handed to ``compact_files``
    target_file_bytes: int = 128 * 1024 * 1024
    #: rebuild blooms when > this fraction of current files lack a row
    #: (only once a build exists — the first build is an explicit choice)
    bloom_stale_frac: float | None = 0.5
    #: fold per-batch ledger parquets when the list exceeds this
    ledger_max_files: int | None = 64
    #: keep this many snapshots (None = never expire history)
    keep_snapshots: int | None = None
    #: delete unreferenced files older than this (None = never)
    orphan_age_secs: float | None = 7 * 24 * 3600.0
    #: row-level TTL: expire rows with warc_ts older than now - ttl
    #: (None = keep rows forever). Needs ``now`` for determinism.
    row_ttl: _dt.timedelta | None = None
    #: the clock ``row_ttl`` subtracts from; tests pin it
    now: _dt.datetime | None = None


def _bloom_coverage(table: "LakeTable", m: dict[str, Any]) -> float | None:
    """Fraction of current data files covered by the bloom side table,
    or None when no build exists. Reads ONLY the side table's ``path``
    column (one small parquet, driver-side pyarrow)."""
    bl = m.get("blooms")
    if not bl:
        return None
    bloom_dir = os.path.join(table.path, bl["dir"])
    if not os.path.isdir(bloom_dir):
        return 0.0  # pointer exists but dir superseded: fully stale
    import pyarrow.dataset as ds

    have = set(
        ds.dataset(bloom_dir, format="parquet")
        .to_table(columns=["path"])
        .column("path")
        .to_pylist()
    )
    files = [f["path"] for f in m["files"]]
    if not files:
        return 1.0
    return sum(1 for p in files if p in have) / len(files)


def plan_maintenance(
    table: "LakeTable", policy: MaintenancePolicy | None = None
) -> list[dict[str, Any]]:
    """Measure table health against ``policy`` and return the ordered
    list of maintenance actions due, each ``{"action", "reason",
    "params"}``. Metadata-only; execution order is the safe one
    :func:`run_maintenance` uses:

    1. ``expire_rows`` (row TTL) — first, so the rewrites below fold the
       expiry instead of compacting soon-dead rows;
    2. ``compact_files`` OR ``minor_compact`` — ``compact_files`` folds
       every delta as a side effect, so when both conditions fire only
       the bin-pack runs (the backlog drain would be wasted write);
    3. ``build_blooms`` — after the rewrites, so the new files get rows;
    4. ``compact_ledger`` — fold the per-batch lineage parquets;
    5. ``expire_snapshots`` then ``remove_orphans`` — storage release
       last, against the post-rewrite version chain.
    """
    pol = policy or MaintenancePolicy()
    if table.current_version() is None:
        return []
    m = table.manifest()
    plan: list[dict[str, Any]] = []

    if pol.row_ttl is not None:
        now = pol.now or _dt.datetime.now(_dt.timezone.utc)
        cutoff = now - pol.row_ttl
        n_expirable = _expirable_files(table, m, cutoff)
        if n_expirable:
            plan.append({
                "action": "expire_rows",
                "reason": f"{n_expirable} file(s) hold rows older "
                          f"than {cutoff.isoformat()}",
                "params": {"older_than": cutoff.isoformat()},
            })

    smalls_by_bucket: dict[Any, int] = {}
    for f in m["files"]:
        if f["bytes"] < pol.small_file_bytes:
            smalls_by_bucket[f["bucket"]] = smalls_by_bucket.get(f["bucket"], 0) + 1
    worst_smalls = max(smalls_by_bucket.values(), default=0)
    backlog = {
        k: c
        for k, c in table.delta_file_counts().items()
        if pol.minor_compact_max_deltas is not None
        and c >= pol.minor_compact_max_deltas
    }
    if (
        pol.small_files_per_bucket is not None
        and worst_smalls >= pol.small_files_per_bucket
    ):
        plan.append({
            "action": "compact_files",
            "reason": f"a bucket holds {worst_smalls} files under "
                      f"{pol.small_file_bytes} bytes"
                      + (f" (also drains {len(backlog)} delta-backlog "
                         f"group(s))" if backlog else ""),
            "params": {"target_file_bytes": pol.target_file_bytes},
        })
    elif backlog:
        plan.append({
            "action": "minor_compact",
            "reason": f"{len(backlog)} group(s) at >= "
                      f"{pol.minor_compact_max_deltas} deltas: "
                      f"{sorted([list(k), c] for k, c in backlog.items())}",
            "params": {"max_deltas": pol.minor_compact_max_deltas},
        })

    if pol.bloom_stale_frac is not None:
        cov = _bloom_coverage(table, m)
        rewrite_planned = any(
            s["action"] in ("compact_files", "minor_compact") for s in plan
        )
        # a planned rewrite stales every bloom row it supersedes, so when
        # a build exists, schedule the rebuild in the SAME pass (after the
        # rewrite) instead of leaving it for the next cycle
        if cov is not None and (
            (1.0 - cov) > pol.bloom_stale_frac or rewrite_planned
        ):
            bl = m["blooms"]
            plan.append({
                "action": "build_blooms",
                "reason": (f"bloom coverage {cov:.0%} of current files"
                           if (1.0 - cov) > pol.bloom_stale_frac
                           else "rewrite planned this pass supersedes "
                                "existing bloom rows"),
                "params": {"bits_per_key": bl.get("bits_per_key", 10),
                           "n_hashes": bl.get("n_hashes", 7)},
            })

    if (
        pol.ledger_max_files is not None
        and len(m["ledger_files"]) > pol.ledger_max_files
    ):
        plan.append({
            "action": "compact_ledger",
            "reason": f"{len(m['ledger_files'])} per-batch ledger files, "
                      f"policy folds above {pol.ledger_max_files}",
            "params": {"max_files": 1},
        })

    if pol.keep_snapshots is not None:
        retained = len(table.history())
        if retained > pol.keep_snapshots:
            plan.append({
                "action": "expire_snapshots",
                "reason": f"{retained} snapshots retained, policy keeps "
                          f"{pol.keep_snapshots}",
                "params": {"keep_last": pol.keep_snapshots},
            })

    if pol.orphan_age_secs is not None:
        probe = table.remove_orphans(
            older_than_secs=pol.orphan_age_secs, dry_run=True
        )
        if probe["removed"]:
            plan.append({
                "action": "remove_orphans",
                "reason": f"{probe['removed']} unreferenced file(s) older "
                          f"than {pol.orphan_age_secs:.0f}s",
                "params": {"older_than_secs": pol.orphan_age_secs},
            })

    return plan


def _expirable_files(
    table: "LakeTable", m: dict[str, Any], cutoff: _dt.datetime
) -> int:
    """How many files the row-TTL tier would drop or rewrite — counted
    from manifest ``warc_ts`` stats only (files without stats are not
    counted; ``expire_rows`` itself will open their footers)."""
    naive = (
        cutoff
        if cutoff.tzinfo is None
        else cutoff.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    )
    cutoff_us = int((naive - _dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    n = 0
    for f in m["files"]:
        st = (f.get("stats") or {}).get("warc_ts")
        # manifest stats store timestamps as unix micros (_json_stat)
        if st is not None and int(st[0]) < cutoff_us:
            n += 1
    return n


class MaintenanceHook:
    """In-stream auto-maintenance: plugs into ``CdcPipeline(views=[...])``
    (the pipeline calls ``refresh()`` after every APPLIED micro-batch) and
    runs :func:`run_maintenance` every ``every_n_batches`` applied
    batches — compaction, bloom rebuilds and retention ride inside the
    same streaming loop that applies merges, so the table never needs an
    external maintenance scheduler (Delta auto-OPTIMIZE shape).

    Safety: refresh runs AFTER the batch's commit, in the same
    ``foreachBatch`` scope, so maintenance never races its own pipeline's
    merges; against OTHER concurrent writers every action rebases or
    raises like any maintenance commit. The cadence counter is process-
    local (a restart resets it) — cheap and safe, because maintenance is
    need-driven: a missed tick just means the next one sees slightly more
    backlog. ``last_report`` keeps the most recent run for inspection."""

    def __init__(
        self,
        spark,
        table_path: str,
        policy: MaintenancePolicy | None = None,
        every_n_batches: int = 32,
    ):
        self.spark = spark
        self.table_path = table_path
        self.policy = policy or MaintenancePolicy()
        self.every_n_batches = max(1, int(every_n_batches))
        self.last_report: dict[str, Any] | None = None
        self._n = 0

    def refresh(self) -> None:
        self._n += 1
        if self._n % self.every_n_batches:
            return
        from crypto_exchange_etl_spark.lake.table import LakeTable

        self.last_report = run_maintenance(
            LakeTable.load(self.spark, self.table_path), self.policy
        )


def verify_table(
    table: "LakeTable", deep: bool = False
) -> dict[str, Any]:
    """Integrity audit — the lake's ``fsck``. Checks, per retained
    version: the manifest (incl. incremental-delta chains) resolves; every
    referenced data file exists with its recorded byte size; every file's
    spec id is in the bucket-spec registry and its schema epoch is
    registered; the applied-batch guard holds no duplicates; the current
    version's ledger files exist; the bloom pointer (if any) resolves to a
    directory. ``deep=True`` additionally opens every CURRENT data file's
    parquet footer and compares row counts against the manifest — the
    check that catches silent truncation/corruption, at O(files) footer
    opens.

    Returns ``{"ok": bool, "versions_checked": n, "files_checked": n,
    "findings": [{"severity", "kind", "detail"}, ...]}``. Read-only:
    never commits, never repairs — pair with :func:`run_maintenance` /
    ``remove_orphans`` for the fixes. A finding of kind
    ``stale_bloom_dir`` is a warning (lookups degrade to stats-only
    pruning, correctness unaffected); everything else is an error.
    """
    findings: list[dict[str, str]] = []

    def err(kind: str, detail: str) -> None:
        findings.append({"severity": "error", "kind": kind, "detail": detail})

    def warn(kind: str, detail: str) -> None:
        findings.append({"severity": "warning", "kind": kind, "detail": detail})

    cur = table.current_version()
    if cur is None:
        return {"ok": True, "versions_checked": 0, "files_checked": 0,
                "findings": []}

    import re as _re

    versions = sorted(
        int(mt.group(1))
        for f in os.listdir(table.meta_dir)
        if (mt := _re.fullmatch(r"v(\d+)\.json", f))
    )
    files_checked = 0
    for v in versions:
        try:
            m = table.manifest(v)
        except Exception as e:  # dangling delta chain, corrupt JSON, ...
            err("unresolvable_manifest", f"v{v}: {e}")
            continue
        specs = table._specs(m)
        n_epochs = len(m.get("schema_epochs") or [None])
        for f in m["files"]:
            if table._file_spec(f) not in specs:
                err("unknown_spec",
                    f"v{v}: {f['path']} spec {table._file_spec(f)}")
            if int(f.get("epoch", 0)) >= n_epochs:
                err("unknown_epoch",
                    f"v{v}: {f['path']} epoch {f.get('epoch')}")
            full = os.path.join(table.path, f["path"])
            if not os.path.exists(full):
                err("missing_file", f"v{v}: {f['path']}")
            elif os.path.getsize(full) != f["bytes"]:
                err("size_mismatch",
                    f"v{v}: {f['path']} manifest={f['bytes']} "
                    f"disk={os.path.getsize(full)}")
            files_checked += 1
        batches = m["applied_batches"]
        if len(batches) != len(set(batches)):
            err("duplicate_batch_ids", f"v{v}: applied_batches has dups")
        if v == cur:
            for rel in m["ledger_files"]:
                if not os.path.exists(os.path.join(table.path, rel)):
                    err("missing_ledger_file", f"v{v}: {rel}")
            bl = m.get("blooms")
            if bl and not os.path.isdir(os.path.join(table.path, bl["dir"])):
                warn("stale_bloom_dir",
                     f"v{v}: bloom dir {bl['dir']} superseded — lookups "
                     "fall back to stats-only pruning")
            if deep:
                import pyarrow.parquet as pq

                for f in m["files"]:
                    full = os.path.join(table.path, f["path"])
                    if not os.path.exists(full):
                        continue  # already reported
                    try:
                        md = pq.ParquetFile(full).metadata
                    except Exception as e:
                        err("unreadable_footer", f"{f['path']}: {e}")
                        continue
                    if "rows" in f and md.num_rows != f["rows"]:
                        err("row_count_mismatch",
                            f"{f['path']} manifest={f['rows']} "
                            f"footer={md.num_rows}")
    return {
        "ok": not any(f["severity"] == "error" for f in findings),
        "versions_checked": len(versions),
        "files_checked": files_checked,
        "findings": findings,
    }


def run_maintenance(
    table: "LakeTable",
    policy: MaintenancePolicy | None = None,
    plan: list[dict[str, Any]] | None = None,
) -> dict[str, Any]:
    """Plan (unless a ``plan`` is passed) and execute. Returns
    ``{"planned", "executed", "replan"}`` where ``executed`` carries each
    action's commit summary and ``replan`` is the post-run plan — empty
    when one pass satisfied the policy (the normal case; TTL/orphan rules
    whose evidence ages in can legitimately re-arm later)."""
    pol = policy or MaintenancePolicy()
    planned = plan if plan is not None else plan_maintenance(table, pol)
    executed: list[dict[str, Any]] = []
    for step in planned:
        a, p = step["action"], step["params"]
        if a == "expire_rows":
            out = table.expire_rows(_dt.datetime.fromisoformat(p["older_than"]))
        elif a == "compact_files":
            out = table.compact_files(target_file_bytes=p["target_file_bytes"])
        elif a == "minor_compact":
            out = table.minor_compact(max_deltas=p["max_deltas"])
        elif a == "compact_ledger":
            out = table.compact_ledger(max_files=p["max_files"])
        elif a == "build_blooms":
            out = table.build_blooms(
                bits_per_key=p["bits_per_key"], n_hashes=p["n_hashes"]
            )
        elif a == "expire_snapshots":
            out = {"operation": "expire_snapshots",
                   "files_removed": table.expire_snapshots(p["keep_last"])}
        elif a == "remove_orphans":
            out = {"operation": "remove_orphans",
                   **table.remove_orphans(p["older_than_secs"])}
        else:  # pragma: no cover - plan entries come from plan_maintenance
            raise ValueError(f"unknown maintenance action {a!r}")
        executed.append({"action": a, "result": out})
    return {
        "planned": planned,
        "executed": executed,
        "replan": plan_maintenance(table, pol),
    }
