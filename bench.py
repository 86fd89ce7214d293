"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline metric: sustained CDC apply throughput (change-events/sec) for a
full binlog replay through the engine (generate → extract → LWW → bucketed
MERGE → ledger), measured as `cdc_replay_events_per_sec`. Alongside it,
wall-seconds for the headline analytic queries from the registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] cores + shuffle partitions (default 32)
  SPARK_GRAFT_CDC_EVENTS  synthetic binlog size for the CDC replay bench
                          (default 20_000_000 — sized so a replay runs
                          tens of seconds of steady state; at 2M events
                          wall-time was ~flat in event count, i.e. the
                          bench measured fixed scheduling overhead, not
                          throughput: measured 2M = 44.0 s vs 8M = 42.6 s
                          on identical config)

Scaling-efficiency evidence (north_rule's two-cluster-size criterion) is
produced by scripts/scaling_bench.py, which runs THIS file's CDC section
at two parallelism levels in separate processes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_exchange_etl_spark.queries import QUERIES  # noqa: E402
from crypto_exchange_etl_spark.session import get_spark  # noqa: E402
from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments  # noqa: E402
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline  # noqa: E402

#: Queries timed at SF_DIR (a representative slice of the registry:
#: CDC spine, heavy aggregation, window, join, text, similarity).
BENCH_QUERIES = [
    "lww_compact",
    "run_compaction",
    "candles_hourly",
    "pricing_summary",
    "running_total",
    "enrich_join",
    "text_quality",
    "minhash_lsh",
    "simhash",
    "cosine_topk",
    "corpus_curation",
    "asof_join",
    "sessionize",
    "proximity_pairs",
]


def _busy_loop(dt: float) -> int:
    """Count tight-loop iterations for ``dt`` wall-seconds."""
    end = time.perf_counter() + dt
    n = 0
    while time.perf_counter() < end:
        n += 1
    return n


def host_calibration(n_procs: int, dt: float = 0.4) -> dict:
    """Measure how much of this host's nominal parallelism is actually
    available RIGHT NOW: one busy-loop process vs ``n_procs`` concurrent
    ones, pure Python, no Spark. On this VM a quiet host yields ~25×/32
    procs and a stolen host far less (BASELINE.md methodology) — emitting
    the factor alongside the timings lets a reader tell a loaded-host
    driver run from an engine regression without re-running."""
    from multiprocessing import get_context

    solo = _busy_loop(dt)
    with get_context("fork").Pool(n_procs) as pool:
        counts = pool.map(_busy_loop, [dt] * n_procs)
    return {
        "procs": n_procs,
        "solo_mloops_per_sec": round(solo / dt / 1e6, 2),
        "aggregate_mloops_per_sec": round(sum(counts) / dt / 1e6, 2),
        "speedup": round(sum(counts) / solo, 1),
    }


def bench_cdc_replay(spark, n_events: int, n_cpus: int) -> dict:
    """Generate a synthetic binlog and replay it through the full engine.

    Binlog + bench tables live on tmpfs when available (cluster
    equivalent: executor-local NVMe) — this VM's virtio disk turns
    concurrent small writes into fsync storms that invert any
    measurement (see BASELINE.md methodology)."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="cdc_bench_", dir=base)
    try:
        binlog = os.path.join(tmp, "binlog")
        write_binlog_segments(
            spark,
            binlog,
            n_events=n_events,
            n_segments=4,
            n_urls=max(1000, n_events // 20),
            seed=42,
        )
        # min of N replays (default 4): this VM shows intermittent host
        # interference (identical jobs vary several-fold — measured
        # 16.3 s vs 96.8 s for this exact replay on identical config,
        # and the minimum often lands on a LATE rep once the JIT is hot
        # and the host quiets); the minimum is the engine's actual
        # capability (see BASELINE.md methodology)
        n_reps = int(os.environ.get("SPARK_GRAFT_CDC_REPS", "4"))
        times = []
        rows = None
        for i in range(n_reps):
            pipe = CdcPipeline(spark, os.path.join(tmp, f"pages{i}"), n_buckets=n_cpus)
            t0 = time.time()
            pipe.replay_all(binlog)
            times.append(time.time() - t0)
            if rows is None:
                rows = pipe.table.read().count()
        dt = min(times)
        out = {
            "cdc_events": n_events,
            "cdc_replay_sec": round(dt, 3),
            "cdc_replay_reps_sec": [round(t, 2) for t in times],
            "cdc_replay_events_per_sec": round(n_events / dt, 1),
            "cdc_live_rows": rows,
        }
        out.update(
            bench_replication(spark, os.path.join(tmp, f"pages{n_reps - 1}"), tmp)
        )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_replication(spark, src_path: str, tmp: str) -> dict:
    """Streaming hot path: ``lake_cdf`` → ``lake_sink`` replication of the
    replayed table (lake/replicate.py). Throughput is CHANGE ROWS applied
    at the replica per wall-second — the CDF computes the per-commit
    diffs of the source and the sink lands them as exactly-once MOR
    commits, so this times the whole streaming format stack (admission
    control, Arrow writer, manifest commit). Min of 2 fresh-replica runs
    (same host-interference methodology as the replay timing)."""
    from crypto_exchange_etl_spark.lake.replicate import (
        create_replica,
        replicate_once,
        replicate_stream,
    )
    from crypto_exchange_etl_spark.lake.table import LakeTable

    times, applied = [], None
    for i in range(2):
        dst = os.path.join(tmp, f"replica{i}")
        ck = os.path.join(tmp, f"repl_ck{i}")
        create_replica(spark, src_path, dst)
        t0 = time.time()
        q = replicate_stream(spark, src_path, dst, ck, available_now=True)
        q.awaitTermination()
        times.append(time.time() - t0)
        if applied is None:
            import pyspark.sql.functions as F

            led = LakeTable.load(spark, dst).ledger()
            applied = int(
                led.where(F.col("partition") == -2)
                .agg(F.sum("n_events"))
                .collect()[0][0]
                or 0
            )
    dt = min(times)
    # batch-mode drain (replicate_once): same diff kernel and sink write
    # path, no stream start/stop intercept — the cron-tick fast path
    once_times = []
    for i in range(2):
        dst = os.path.join(tmp, f"replica_once{i}")
        t0 = time.time()
        replicate_once(spark, src_path, dst)
        once_times.append(time.time() - t0)
        shutil.rmtree(dst, ignore_errors=True)
    odt = min(once_times)
    return {
        "replication_change_rows": applied,
        "replication_sec": round(dt, 3),
        "replication_reps_sec": [round(t, 2) for t in times],
        "replication_events_per_sec": round(applied / dt, 1) if dt else 0.0,
        "replication_once_sec": round(odt, 3),
        "replication_once_reps_sec": [round(t, 2) for t in once_times],
        "replication_once_events_per_sec": (
            round(applied / odt, 1) if odt else 0.0
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "20000000"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    # calibrate BEFORE the JVM exists so the probe sees the bare host
    cal_start = host_calibration(n_cpus)

    spark = get_spark(app_name="bench", cores=n_cpus, shuffle_partitions=n_cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # multi-pass, min per query: pass 1 absorbs the session's fixed costs
    # (JVM JIT, codegen compile, parquet footers) that otherwise charge
    # entirely to whichever query runs first — measured 7.0 s vs 0.6 s
    # warm for the same aggregate — and the min rejects host interference
    # spikes (same methodology as the CDC min-of-N below). BENCH_r04
    # showed two passes can BOTH land on a loaded host (every query
    # uniformly 1.3–1.8× slower than the quiet-host band, calibration
    # 16.8×/32): so (a) each pass now records its own mini host
    # calibration — the artifact carries per-pass evidence of what the
    # host was doing WHILE queries ran, not just at the ends — and
    # (b) when the per-query spread between the two best reps stays wide
    # (median best/2nd-best gap > 20%), up to two extra passes run.
    base_passes = int(os.environ.get("SPARK_GRAFT_QUERY_PASSES", "3"))
    max_passes = base_passes + 2
    reps: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    pass_cal: list[dict] = []
    n_pass = 0
    while n_pass < max_passes:
        pass_cal.append(host_calibration(n_cpus, dt=0.2))
        for name in BENCH_QUERIES:
            fn = QUERIES[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.time() - t0, 3))
        n_pass += 1
        if n_pass >= base_passes:
            gaps = []
            for ts in reps.values():
                a, b = sorted(ts)[:2]
                gaps.append((b - a) / a if a else 0.0)
            gaps.sort()
            if gaps[len(gaps) // 2] <= 0.20:  # median two-best gap settled
                break
    queries: dict[str, float] = {n: min(ts) for n, ts in reps.items()}
    total = round(sum(queries.values()), 3)

    cdc = bench_cdc_replay(spark, n_events, n_cpus)
    queries["cdc_replay"] = cdc["cdc_replay_sec"]

    # second probe after the timed work: start≈end ⇒ conditions held;
    # a large drop ⇒ the host got busy mid-run and the numbers are a floor
    cal_end = host_calibration(n_cpus)

    out = {
        "metric": "cdc_apply_throughput_and_query_secs",
        "value": cdc["cdc_replay_events_per_sec"],
        "unit": "events/sec",
        "queries": queries,
        "sf": sf,
        "cpus": n_cpus,
        **cdc,
        "total_query_sec": round(total, 3),
        "query_reps_sec": reps,
        "query_passes": n_pass,
        "host_calibration": {
            "start": cal_start,
            "per_query_pass": pass_cal,
            "end": cal_end,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
