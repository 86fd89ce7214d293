#!/usr/bin/env python3
"""spark-submit entrypoint for the CDC ingest engine.

The north rule requires the engine to run "via spark-submit --py-files on
a multi-executor cluster"; this script is that job. It deliberately never
calls ``.master()`` beyond the ``get_spark`` default — ``get_spark``
honors a launcher-supplied master, so the SAME file runs identically on
``local[N]`` and on a real cluster (the reference's equivalent entry is
the Cloud Function trigger, /root/reference/fintick/main.py:22-85).

Ship the library, then submit:

    python scripts/cdc_job.py package --out dist/
    spark-submit --master <cluster> \\
        --py-files dist/crypto_exchange_etl_spark.zip \\
        scripts/cdc_job.py replay --binlog /lake/binlog --table /lake/pages \\
        --buckets 256

Subcommands
-----------
``package``  zip the library for ``--py-files`` (pure stdlib, no Spark).
``replay``   single-shot backfill: apply an entire binlog directory as one
             batch (the oracle path — stream-applied state must equal it).
``tail``     checkpointed streaming apply (exactly-once): availableNow by
             default (drain-and-exit, cron-able like the reference's
             hourly trigger) or ``--continuous`` to keep tailing.

Sizing guidance (north_rule's merge-stage knobs): set ``--buckets`` to at
least the cluster's total cores — the bucket-aligned MERGE's write stage
has parallelism exactly ``n_buckets`` — and pass shuffle-partition /
AQE-advisory confs through ``spark-submit --conf`` (get_spark only
defaults them when unset).
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def _package(out_dir: str) -> str:
    """Zip the library next to this checkout for --py-files shipping."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "crypto_exchange_etl_spark")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "crypto_exchange_etl_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, repo)
                zf.write(full, rel)
    return out


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--binlog", required=True, help="binlog/WAL directory")
    p.add_argument("--table", required=True, help="lake table path")
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--mode", choices=["cow", "mor"], default="cow")
    p.add_argument(
        "--canonicalize",
        action="store_true",
        help="canonicalize merge-key urls before every merge (table-birth choice)",
    )
    p.add_argument(
        "--metrics-dir",
        default=None,
        help="land one JSON metrics doc per applied micro-batch here "
        "(durable observability feed; query with read_metrics)",
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cdc_job")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pk = sub.add_parser("package")
    pk.add_argument("--out", default="dist")

    rp = sub.add_parser("replay")
    _add_common(rp)
    rp.add_argument("--batch-id", type=int, default=0)

    tl = sub.add_parser("tail")
    _add_common(tl)
    tl.add_argument("--checkpoint", required=True)
    tl.add_argument("--max-files-per-trigger", type=int, default=1)
    tl.add_argument(
        "--continuous",
        action="store_true",
        help="keep tailing (default: availableNow drain-and-exit)",
    )
    tl.add_argument("--timeout-secs", type=float, default=None)
    tl.add_argument(
        "--debezium",
        action="store_true",
        help="binlog dir is a Debezium ndjson feed instead of parquet segments",
    )
    tl.add_argument("--dead-letters", default=None, help="quarantine dir (debezium)")
    tl.add_argument(
        "--view",
        action="append",
        default=[],
        metavar="PATH:GROUP_COL",
        help="maintain a per-group count/char materialized view in-stream "
        "(repeatable; refreshed after every applied batch)",
    )

    mt = sub.add_parser(
        "maintain",
        help="table maintenance: compaction, snapshot/row retention, clustering",
    )
    mt.add_argument("--table", required=True)
    mt.add_argument("--compact-files", action="store_true",
                    help="bin-pack small files per bucket")
    mt.add_argument("--expire-snapshots", type=int, default=None,
                    metavar="KEEP_LAST", help="drop old snapshots + orphans")
    mt.add_argument("--expire-older-than-secs", type=float, default=None,
                    metavar="SECS",
                    help="with --expire-snapshots: only snapshots committed "
                    "more than SECS seconds ago are eligible (Iceberg age "
                    "form; KEEP_LAST becomes a floor)")
    mt.add_argument("--expire-rows-before", default=None, metavar="ISO_TS",
                    help="row-level TTL cutoff (settled rows only)")
    mt.add_argument("--rewrite-clustered", default=None, metavar="COLUMN",
                    help="re-sort buckets by COLUMN and roll files")
    mt.add_argument("--zorder", default=None, metavar="COL1,COL2[,..]",
                    help="Morton-interleaved multi-column clustering "
                    "(prunes on every listed dimension)")
    mt.add_argument("--rebucket", type=int, default=None, metavar="N",
                    help="rewrite into N hash buckets")
    mt.add_argument("--compact-ledger", action="store_true",
                    help="fold per-batch ledger parquets into one file")
    mt.add_argument("--build-blooms", action="store_true",
                    help="(re)build per-file key bloom filters for "
                    "point-lookup file skipping")
    mt.add_argument("--remove-orphans", type=float, default=None,
                    metavar="OLDER_THAN_SECS",
                    help="delete unreferenced data/ledger files older than "
                    "this many seconds (staged WAP snapshots always kept)")
    mt.add_argument("--evolve-buckets", type=int, default=None, metavar="N",
                    help="lazy partition-spec evolution: future writes use "
                    "N buckets, existing files migrate as merges touch them "
                    "(metadata-only commit; contrast --rebucket's full "
                    "rewrite)")
    mt.add_argument("--create-tag", default=None, metavar="NAME[:VERSION]",
                    help="pin a snapshot under an immutable name "
                    "(default: current version); tagged snapshots survive "
                    "--expire-snapshots until the tag is dropped")
    mt.add_argument("--drop-ref", default=None, metavar="NAME",
                    help="drop a tag (releases its snapshot for expiry) or "
                    "a branch (discards its staged chain)")
    mt.add_argument("--fast-forward", default=None, metavar="BRANCH",
                    help="publish a branch's staged snapshot chain onto main")
    mt.add_argument("--rename-column", default=None, metavar="OLD:NEW",
                    help="metadata-only column rename (field-id DDL)")
    mt.add_argument("--drop-column", default=None, metavar="NAME",
                    help="metadata-only column drop (field-id DDL)")
    mt.add_argument("--add-column", default=None,
                    metavar="NAME:DDL_TYPE[:DEFAULT]",
                    help="metadata-only nullable column add (field-id DDL), "
                    "e.g. content_type:string or score:double:0.5 (the "
                    "default is an Iceberg-v3 initial default: pre-add "
                    "rows read it instead of null)")
    mt.add_argument("--add-constraint", default=None,
                    metavar="NAME::SQL_EXPR",
                    help="declare a CHECK constraint (validates live rows)")
    mt.add_argument("--drop-constraint", default=None, metavar="NAME",
                    help="remove a CHECK constraint")
    mt.add_argument("--delete-where", default=None, metavar="SQL_PREDICATE",
                    help="row-level DELETE via the LWW merge path")
    mt.add_argument("--update-where", default=None,
                    metavar="SQL_PREDICATE::COL=EXPR[,COL=EXPR..]",
                    help="row-level UPDATE via the LWW merge path")
    mt.add_argument("--list-refs", action="store_true",
                    help="print all named refs (tags and branches)")
    mt.add_argument("--auto", action="store_true",
                    help="policy-driven maintenance: measure table health "
                    "and run whichever of compaction / bloom rebuild / "
                    "retention is due (lake/maintenance.py)")
    mt.add_argument("--auto-plan", action="store_true",
                    help="like --auto but print the plan without executing "
                    "(metadata-only, safe on a live table)")
    mt.add_argument("--auto-policy", default=None,
                    metavar="KEY=VALUE[,KEY=VALUE..]",
                    help="override MaintenancePolicy fields, e.g. "
                    "keep_snapshots=5,minor_compact_max_deltas=4,"
                    "row_ttl_days=6")

    mg = sub.add_parser(
        "merge",
        help="MERGE INTO the table from a parquet source (upsert / "
        "conditional delete / snapshot sync)",
    )
    mg.add_argument("--table", required=True)
    mg.add_argument("--source", required=True,
                    help="parquet path of source rows keyed on the merge key")
    mg.add_argument("--no-insert", action="store_true",
                    help="disable WHEN NOT MATCHED INSERT")
    mg.add_argument("--no-update", action="store_true",
                    help="disable WHEN MATCHED UPDATE")
    mg.add_argument("--delete-when", default=None, metavar="SQL",
                    help="WHEN MATCHED AND <cond> DELETE (source cols by "
                    "name, target as t_<col>)")
    mg.add_argument("--matched-when", default=None, metavar="SQL",
                    help="extra gate on the matched clauses")
    mg.add_argument("--sync", action="store_true",
                    help="WHEN NOT MATCHED BY SOURCE DELETE: make the "
                    "table's live keys equal the source snapshot "
                    "(O(live table) scan)")
    mg.add_argument("--batch-id", type=int, default=None,
                    help="exactly-once id (re-running the same id is a no-op)")

    rpl = sub.add_parser(
        "replicate",
        help="incremental lake→lake replication (lake_cdf → lake_sink): "
        "creates/loads the replica, syncs additive schema, drains the "
        "source's change feed exactly-once (re-run on a schedule, or "
        "--follow to tail continuously)",
    )
    rpl.add_argument("--source", required=True, help="source table path")
    rpl.add_argument("--target", required=True, help="replica table path")
    rpl.add_argument("--checkpoint", required=True)
    rpl.add_argument("--sink-id", default=None,
                     help="exactly-once guard namespace (default: derived "
                     "from the checkpoint path, so a fresh checkpoint "
                     "gets a fresh guard namespace)")
    rpl.add_argument("--buckets", type=int, default=None,
                     help="replica bucket count (default: source's)")
    rpl.add_argument("--follow", action="store_true",
                     help="continuous tail instead of drain-and-stop")
    rpl.add_argument("--timeout-secs", type=float, default=None)

    s2 = sub.add_parser(
        "scd2",
        help="maintain a type-2 history table from a lake table's change "
        "feed: refresh advances to the source head at O(changed rows) "
        "(re-run on a schedule); --resync repairs after source snapshot "
        "retention outran the cursor",
    )
    s2.add_argument("--source", required=True, help="source table path")
    s2.add_argument("--history", required=True, help="history table path")
    s2.add_argument("--payload-cols", default=None,
                    help="comma-separated source columns to carry "
                    "(default: all public except key/warc_ts)")
    s2.add_argument("--buckets", type=int, default=16)
    s2.add_argument("--resync", action="store_true")
    s2.add_argument("--count", action="store_true",
                    help="also count history intervals (O(history) scan "
                    "— off by default so scheduled refreshes stay "
                    "O(changed rows))")

    ins = sub.add_parser("inspect", help="print table history and health stats")
    ins.add_argument("--table", required=True)
    ins.add_argument("--verify", action="store_true",
                     help="integrity audit (lake fsck): referenced files "
                     "exist with recorded sizes, manifest chains resolve, "
                     "registries consistent; exit 2 on any error finding")
    ins.add_argument("--deep", action="store_true",
                     help="with --verify: also open every current file's "
                     "footer and check row counts")

    args = ap.parse_args(argv)

    if args.cmd == "package":
        out = _package(args.out)
        print(out)
        return 0

    import json as _json

    from crypto_exchange_etl_spark.session import get_spark
    from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

    spark = get_spark(app_name=f"cdc_{args.cmd}")

    views = []
    for spec in getattr(args, "view", []):
        from crypto_exchange_etl_spark.lake.matview import MaterializedAggregate

        vpath, _, gcol = spec.rpartition(":")
        if not vpath:
            raise SystemExit(f"--view expects PATH:GROUP_COL, got {spec!r}")
        views.append(
            MaterializedAggregate(
                spark, args.table, vpath, group_col=gcol,
                sums={"n_chars": "length(text)"},
            )
        )

    if args.cmd == "replicate":
        from crypto_exchange_etl_spark.lake.replicate import (
            create_replica,
            replicate_stream,
        )

        rep = create_replica(
            spark, args.source, args.target, n_buckets=args.buckets
        )
        q = replicate_stream(
            spark,
            args.source,
            args.target,
            args.checkpoint,
            sink_id=args.sink_id,
            available_now=not args.follow,
        )
        q.awaitTermination(args.timeout_secs)
        if args.follow and args.timeout_secs is not None:
            q.stop()
        print(_json.dumps({
            "replica_version": rep.current_version(),
            "replica_rows": rep.read().count(),
        }))
        return 0

    if args.cmd == "scd2":
        from crypto_exchange_etl_spark.lake.scd2 import Scd2History

        h = Scd2History(
            spark,
            args.source,
            args.history,
            payload_cols=(
                [c.strip() for c in args.payload_cols.split(",") if c.strip()]
                if args.payload_cols
                else None
            ),
            n_buckets=args.buckets,
        )
        out = h.resync() if args.resync else h.refresh()
        if args.count:
            out["intervals"] = h.history().count()
        print(_json.dumps(out))
        return 0

    if args.cmd == "merge":
        from crypto_exchange_etl_spark.lake.table import LakeTable

        table = LakeTable.load(spark, args.table)
        summary = table.merge_into(
            spark.read.parquet(args.source),
            when_matched_update=not args.no_update,
            when_matched_delete=args.delete_when,
            matched_condition=args.matched_when,
            when_not_matched_insert=not args.no_insert,
            when_not_matched_by_source_delete=True if args.sync else None,
            batch_id=args.batch_id,
        )
        print(_json.dumps(summary))
        return 0

    if args.cmd in ("maintain", "inspect"):
        import datetime as _dt

        from crypto_exchange_etl_spark.lake.table import LakeTable

        table = LakeTable.load(spark, args.table)
        if args.cmd == "inspect":
            for row in table.history():
                print(_json.dumps(row))
            print(_json.dumps(table.stats()))
            if args.verify:
                from crypto_exchange_etl_spark.lake.maintenance import (
                    verify_table,
                )

                report = verify_table(table, deep=args.deep)
                print(_json.dumps(report))
                return 0 if report["ok"] else 2
            return 0
        did = []
        if args.compact_files:
            did.append(table.compact_files())
        if args.expire_snapshots is not None:
            import time as _time
            older = (
                _time.time() - args.expire_older_than_secs
                if args.expire_older_than_secs is not None else None
            )
            did.append({"operation": "expire_snapshots",
                        "files_removed": table.expire_snapshots(
                            args.expire_snapshots, older_than=older)})
        if args.expire_rows_before:
            did.append(
                table.expire_rows(_dt.datetime.fromisoformat(args.expire_rows_before))
            )
        if args.rewrite_clustered:
            did.append(table.rewrite_clustered(by=args.rewrite_clustered))
        if args.zorder:
            did.append(
                table.rewrite_clustered(by=args.zorder.split(","), zorder=True)
            )
        if args.rebucket is not None:
            did.append(table.rebucket(args.rebucket))
        if args.evolve_buckets is not None:
            did.append(table.evolve_bucket_spec(args.evolve_buckets))
        if args.compact_ledger:
            did.append(table.compact_ledger())
        if args.build_blooms:
            did.append(table.build_blooms())
        if args.remove_orphans is not None:
            did.append({"operation": "remove_orphans",
                        **table.remove_orphans(args.remove_orphans)})
        if args.create_tag:
            name, _, ver = args.create_tag.partition(":")
            did.append(table.create_tag(name, int(ver) if ver else None))
        if args.drop_ref:
            table.drop_ref(args.drop_ref)
            did.append({"operation": "drop_ref", "name": args.drop_ref})
        if args.fast_forward:
            did.append(table.fast_forward(args.fast_forward))
        if args.rename_column:
            old, _, new = args.rename_column.partition(":")
            did.append(table.rename_column(old, new))
        if args.drop_column:
            did.append(table.drop_column(args.drop_column))
        if args.add_column:
            cname, _, rest = args.add_column.partition(":")
            if "<" in rest or ":" not in rest:
                # complex DDL types carry their own colons (struct<a:int>)
                # and take no CLI default (defaults are scalar-only)
                ctyp, cdfl = rest, None
            else:
                ctyp, _, cdfl = rest.rpartition(":")
            import json as _j
            dfl = None
            if cdfl:
                try:
                    dfl = _j.loads(cdfl)  # 0.5 → float, 3 → int, true → bool
                except ValueError:
                    dfl = cdfl  # bare string default
            did.append(table.add_column(cname, ctyp or "string", default=dfl))
        if args.add_constraint:
            cname, sep, cexpr = args.add_constraint.partition("::")
            if not sep:
                raise SystemExit("--add-constraint expects NAME::SQL_EXPR")
            did.append(table.add_constraint(cname.strip(), cexpr.strip()))
        if args.drop_constraint:
            did.append(table.drop_constraint(args.drop_constraint))
        if args.delete_where:
            did.append(table.delete_where(args.delete_where))
        if args.update_where:
            pred, sep, sets = args.update_where.partition("::")
            if not sep:
                raise SystemExit("--update-where expects PREDICATE::COL=EXPR[,..]")
            assignments = {}
            for kv in sets.split(","):
                col, _, expr = kv.partition("=")
                assignments[col.strip()] = expr.strip()
            did.append(table.update_where(pred, assignments))
        if args.list_refs:
            did.append({"operation": "refs", "refs": table.refs()})
        if args.auto or args.auto_plan:
            from crypto_exchange_etl_spark.lake.maintenance import (
                MaintenancePolicy,
                plan_maintenance,
                run_maintenance,
            )

            overrides: dict = {}
            for kv in (args.auto_policy or "").split(","):
                if not kv:
                    continue
                k, _, v = kv.partition("=")
                k = k.strip()
                if k == "row_ttl_days":
                    overrides["row_ttl"] = _dt.timedelta(days=float(v))
                elif k in ("bloom_stale_frac", "orphan_age_secs"):
                    overrides[k] = float(v)
                else:
                    overrides[k] = int(v)
            pol = MaintenancePolicy(**overrides)
            if args.auto_plan:
                did.append({"operation": "maintenance_plan",
                            "plan": plan_maintenance(table, pol)})
            else:
                did.append({"operation": "auto_maintenance",
                            **run_maintenance(table, pol)})
        for d in did:
            print(_json.dumps(d))
        if not did:
            print("nothing to do (pass at least one maintenance flag)")
        return 0
    pipe = CdcPipeline(
        spark,
        args.table,
        n_buckets=args.buckets,
        write_mode=args.mode,
        canonicalize_keys=args.canonicalize,
        views=views,
        metrics_dir=args.metrics_dir,
    )
    if args.cmd == "replay":
        summary = pipe.replay_all(args.binlog, batch_id=args.batch_id)
        print(
            f"replayed {summary.get('n_events', 0)} events into {args.table} "
            f"(ins={summary.get('n_insert')} upd={summary.get('n_update')} "
            f"del={summary.get('n_delete')} dedup={summary.get('n_dedup')})"
        )
        return 0

    if args.debezium:
        pipe.run_debezium_stream(
            args.binlog,
            args.checkpoint,
            dead_letter_dir=args.dead_letters,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=not args.continuous,
            timeout_secs=args.timeout_secs,
        )
    else:
        pipe.run_stream(
            args.binlog,
            args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=not args.continuous,
            timeout_secs=args.timeout_secs,
        )
    print(f"stream drained into {args.table}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
