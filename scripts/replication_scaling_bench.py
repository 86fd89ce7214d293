"""Two-parallelism scaling evidence for the STREAMING replication path.

`scripts/scaling_bench.py` evidences the north rule's N→4N criterion on
the batch replay path; this script applies the identical methodology
(subprocess per level, cpuset pinning, min-of-REPEATS, tmpfs scratch,
host-capacity probe per level) to the round-3/4 streaming hot path:
`lake_cdf` → `replicate_changes` → `lake_sink` replication of a replayed
table. Throughput is change rows applied at the replica per wall-second
— the same `replication_events_per_sec` definition `bench.py` records.

The source table is built ONCE per level inside the pinned child (same
binlog at both levels, so the replicated change set is identical); only
the replication query is timed. Each repeat replicates into a FRESH
replica + checkpoint so no run free-rides another's state.

Usage:
    python scripts/replication_scaling_bench.py [n_events] [out_json]
Env:
    SPARK_SCALE_LEVELS   default "1,4" (see scaling_bench.py for why the
                         1→4 pair reads the engine rather than the box's
                         single-DRAM-domain payload-scan ceiling)
    SPARK_SCALE_REPEATS  default 3
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPEATS = int(os.environ.get("SPARK_SCALE_REPEATS", "3"))
N_BUCKETS = 32
LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_SCALE_LEVELS", "1,4").split(",")
)
if len(LEVELS) != 2:
    raise SystemExit(
        f"SPARK_SCALE_LEVELS must name exactly two core counts (low,high), "
        f"got {LEVELS!r}"
    )
HTML_REPEAT = int(os.environ.get("SPARK_SCALE_HTML_REPEAT", "10"))
#: "stream" = availableNow Structured Streaming drain (the round-3/4
#: number); "once" = replicate_once batch drain — same diff kernel and
#: sink write path, no stream start/stop intercept (~1.3 s/invocation
#: measured warm at 4 cores), which is the fixed cost that capped the
#: 8M-event 1→4 reading at 0.729 in round 4.
MODE = os.environ.get("SPARK_SCALE_REPL_MODE", "stream")
if MODE not in ("stream", "once"):
    raise SystemExit(f"SPARK_SCALE_REPL_MODE must be stream|once, got {MODE!r}")

_CHILD = r"""
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
from crypto_exchange_etl_spark.session import get_spark
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline
from crypto_exchange_etl_spark.lake.replicate import (
    create_replica, replicate_once, replicate_stream)
from crypto_exchange_etl_spark.lake.table import LakeTable
import pyspark.sql.functions as F

cores = int(sys.argv[1]); binlog = sys.argv[2]; repeats = int(sys.argv[3])
mode = sys.argv[4]
spark = get_spark(app_name=f"replscale{{cores}}", cores=cores,
                  shuffle_partitions=2 * cores,
                  extra_conf={{"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"}})
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix=f"replscale_{{cores}}_",
                       dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
try:
    src = f"{{tmp}}/pages"
    pipe = CdcPipeline(spark, src, n_buckets={n_buckets})
    pipe.replay_all(binlog)

    times = []
    applied = None
    for i in range(repeats):
        dst = f"{{tmp}}/replica{{i}}"; ck = f"{{tmp}}/ck{{i}}"
        create_replica(spark, src, dst)
        t0 = time.time()
        if mode == "once":
            replicate_once(spark, src, dst)
        else:
            q = replicate_stream(spark, src, dst, ck, available_now=True)
            q.awaitTermination()
        times.append(time.time() - t0)
        if applied is None:
            led = LakeTable.load(spark, dst).ledger()
            applied = int(led.where(F.col("partition") == -2)
                          .agg(F.sum("n_events")).collect()[0][0] or 0)
        shutil.rmtree(dst, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    best = min(times)
    print(json.dumps({{"cores": cores,
                      "times_sec": [round(t, 2) for t in times],
                      "best_sec": round(best, 2),
                      "change_rows": applied,
                      "rows_per_sec": round(applied / best, 1)}}))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
"""


def _taskset_prefix(cores: int) -> list[str]:
    # same rationale as scaling_bench._taskset_prefix: a fully
    # provisioned cluster of size N cannot borrow an (N+1)th core
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cores - 1}"]
    return []  # pragma: no cover


def run_level(repo: str, cores: int, binlog: str) -> dict:
    sys.path.insert(0, repo)
    from bench import host_calibration

    cal = host_calibration(8)
    out = subprocess.run(
        [*_taskset_prefix(cores),
         sys.executable, "-c", _CHILD.format(repo=repo, n_buckets=N_BUCKETS),
         str(cores), binlog, str(REPEATS), MODE],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        # surface the child's Spark traceback — a bare CalledProcessError
        # would discard it and force a blind multi-minute rerun
        sys.stderr.write(out.stderr)
        raise SystemExit(
            f"level {cores} child failed with rc={out.returncode} "
            "(stderr above)"
        )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["host_calibration_before"] = cal
    res["pinned_cpus"] = cores
    return res


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="replscalebench_", dir=base)
    try:
        gen = subprocess.run(
            [sys.executable, "-c", (
                "import sys; sys.path.insert(0, %r)\n"
                "from crypto_exchange_etl_spark.session import get_spark\n"
                "from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments\n"
                "s = get_spark(cores=32); s.sparkContext.setLogLevel('ERROR')\n"
                "write_binlog_segments(s, %r, n_events=%d, n_segments=8, "
                "files_per_segment=8, n_urls=%d, seed=42, html_repeat=%d)\n"
                % (repo, f"{tmp}/binlog", n_events,
                   max(1000, n_events // 20), HTML_REPEAT)
            )],
            capture_output=True, text=True,
        )
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr)
            raise SystemExit(f"binlog generation failed rc={gen.returncode}")
        lo = run_level(repo, LEVELS[0], f"{tmp}/binlog")
        hi = run_level(repo, LEVELS[1], f"{tmp}/binlog")
        ratio = LEVELS[1] / LEVELS[0]
        eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / ratio
        result = {
            "n_events": n_events,
            "mode": MODE,
            "low": lo,
            "high": hi,
            f"scaling_efficiency_{LEVELS[0]}_to_{LEVELS[1]}": round(eff, 3),
            "method": f"min of {REPEATS} replications per level of the "
                      f"same replayed table (identical binlog, "
                      f"n_buckets={N_BUCKETS}), fresh replica+checkpoint "
                      f"per repeat, tmpfs scratch, each level "
                      f"cpuset-pinned to exactly its core budget",
        }
        line = json.dumps(result)
        print(line)
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
