"""Measured overhead of the CHECK-constraint gate on the CDC replay path.

The ``on_violation='fail'`` design claim is "zero extra scans when the
batch is clean": the gate is a lazy per-row ``raise_error`` folded into
the lsn projection of rows already being written, so a clean replay pays
one vectorized boolean per written row and nothing else (no extra jobs,
no extra shuffles). This script measures it: the SAME binlog replays
min-of-N times into (a) an unconstrained table and (b) a table carrying
two always-true constraints on raw + derived columns, alternating a/b
per repeat so host drift hits both arms equally.

Usage:
    python scripts/constraint_bench.py [n_events] [out_json]
Env: SPARK_CONSTRAINT_BENCH_REPEATS (default 3), SPARK_CONSTRAINT_BENCH_CORES
(default 16).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPEATS = int(os.environ.get("SPARK_CONSTRAINT_BENCH_REPEATS", "3"))
CORES = int(os.environ.get("SPARK_CONSTRAINT_BENCH_CORES", "16"))
N_BUCKETS = 32

#: always-true on the bench corpus: one raw-column check, one on the
#: enrich-derived column (text) — the shape a production feed declares
CONSTRAINTS = {
    "url_nonempty": "length(url) > 0",
    "text_present": "text is not null or html is null",
}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import host_calibration
    from crypto_exchange_etl_spark.session import get_spark
    from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments
    from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    spark = get_spark(
        app_name="constraint_bench", cores=CORES,
        shuffle_partitions=2 * CORES,
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="cbench_", dir=base)
    try:
        write_binlog_segments(
            spark, f"{tmp}/binlog", n_events=n_events, n_segments=8,
            files_per_segment=8, n_urls=max(1000, n_events // 20), seed=42,
            html_repeat=10,
        )
        # warm JVM/codegen/python workers
        write_binlog_segments(spark, f"{tmp}/warm", n_events=50_000,
                              n_segments=1, n_urls=5_000, seed=7)
        CdcPipeline(spark, f"{tmp}/warmpages", n_buckets=N_BUCKETS).replay_all(
            f"{tmp}/warm"
        )

        cal = host_calibration(8)
        times: dict[str, list[float]] = {"plain": [], "constrained": []}
        rows: dict[str, int] = {}
        for i in range(REPEATS):
            for arm in ("plain", "constrained"):
                path = f"{tmp}/pages_{arm}_{i}"
                pipe = CdcPipeline(spark, path, n_buckets=N_BUCKETS)
                if arm == "constrained":
                    t = pipe.ensure_table()
                    for name, expr in CONSTRAINTS.items():
                        t.add_constraint(name, expr)
                t0 = time.time()
                pipe.replay_all(f"{tmp}/binlog")
                times[arm].append(time.time() - t0)
                if arm not in rows:
                    rows[arm] = pipe.table.read().count()
                shutil.rmtree(path, ignore_errors=True)
        assert rows["plain"] == rows["constrained"], rows
        best = {a: min(ts) for a, ts in times.items()}
        result = {
            "n_events": n_events,
            "cores": CORES,
            "constraints": CONSTRAINTS,
            "on_violation": "fail (default)",
            "times_sec": {a: [round(t, 2) for t in ts] for a, ts in times.items()},
            "best_sec": {a: round(t, 2) for a, t in best.items()},
            "events_per_sec": {
                a: round(n_events / t, 1) for a, t in best.items()
            },
            "gate_overhead_pct": round(
                (best["constrained"] / best["plain"] - 1) * 100, 1
            ),
            "rows": rows["plain"],
            "host_calibration": cal,
            "method": f"min of {REPEATS} alternating replays per arm, "
                      f"identical binlog, n_buckets={N_BUCKETS}, tmpfs",
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
