"""Payload-decode bandwidth A/B: parquet codec / dictionary variants of
the replay's hot byte path, measured pinned at two parallelism levels.

Motivation (round-3 finding): the pinned 2→8 scaling ratio of the replay
is bounded by ONE full payload pass — ~52 GB of decoded page bytes — on
a single DRAM domain. This experiment asks whether the *encoding* of
those bytes moves that ceiling: the LAKE side (files the merge encodes,
and re-decodes when later batches rewrite buckets) and the BINLOG side
(the source segments every replay decodes once).

Variants (each a separate pinned subprocess, same methodology as
scripts/scaling_bench.py — min of REPEATS replays, tmpfs scratch, cpuset
pin covering JVM + python workers):

  base          binlog snappy,  lake snappy     (the pre-round-4 config;
                                                 shipped default is now
                                                 zstd-1 per the first run)
  lake_zstd1    binlog snappy,  lake zstd level 1
  lake_uncomp   binlog snappy,  lake uncompressed
  lake_nodict   binlog snappy,  lake snappy, parquet dictionary OFF
  binlog_zstd1  binlog zstd-1,  lake snappy

History note: the first recorded run (evidence/codec_bench_40m.json) had
a bug in gen_binlog — the level conf was never interpolated, so its
"binlog_zstd1" row actually wrote the binlog at parquet's DEFAULT zstd
level (3), not 1. The byte/time finding (zstd binlog ~2.4x smaller at
equal replay) stands for level 3; this script now really pins level 1.

Codec choices change only the FILE encoding — extracted text bytes and
all logical rows are identical (byte-identity tests are codec-blind), so
the winner can ship by flipping session.py's conf.

Usage:
    python scripts/codec_bench.py [n_events] [out_json]

Env: SPARK_CODEC_LEVELS (default "2,8"), SPARK_CODEC_REPEATS (default 2),
SPARK_SCALE_HTML_REPEAT (default 10 ≈ 1.3 KB pages).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPEATS = int(os.environ.get("SPARK_CODEC_REPEATS", "2"))
N_BUCKETS = 32
LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_CODEC_LEVELS", "2,8").split(",")
)
HTML_REPEAT = int(os.environ.get("SPARK_SCALE_HTML_REPEAT", "10"))

#: name -> (binlog_codec, lake_conf_overrides). Every variant pins the
#: lake codec EXPLICITLY: session.py's default changed to zstd-1 on the
#: strength of the first run of this A/B, so an empty override would now
#: silently compare zstd against zstd.
_SNAPPY = {"spark.sql.parquet.compression.codec": "snappy"}
VARIANTS: dict[str, tuple[str, dict[str, str]]] = {
    "base": ("snappy", dict(_SNAPPY)),
    "lake_zstd1": (
        "snappy",
        {
            "spark.sql.parquet.compression.codec": "zstd",
            "spark.hadoop.parquet.compression.codec.zstd.level": "1",
        },
    ),
    "lake_uncomp": (
        "snappy",
        {"spark.sql.parquet.compression.codec": "uncompressed"},
    ),
    "lake_nodict": (
        "snappy",
        {**_SNAPPY, "spark.hadoop.parquet.enable.dictionary": "false"},
    ),
    "binlog_zstd1": ("zstd1", dict(_SNAPPY)),
}

_CHILD = r"""
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
from crypto_exchange_etl_spark.session import get_spark
from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments
from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

cores = int(sys.argv[1]); n_events = int(sys.argv[2]); binlog = sys.argv[3]
repeats = int(sys.argv[4]); extra = json.loads(sys.argv[5])
spark = get_spark(app_name=f"codec{{cores}}", cores=cores, shuffle_partitions=2 * cores,
                  extra_conf={{"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m", **extra}})
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix=f"codec_{{cores}}_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
try:
    write_binlog_segments(spark, f"{{tmp}}/warm", n_events=50_000, n_segments=1,
                          n_urls=5_000, seed=7)
    CdcPipeline(spark, f"{{tmp}}/warmpages", n_buckets={n_buckets}).replay_all(f"{{tmp}}/warm")

    times = []
    rows = None
    lake_bytes = None
    for i in range(repeats):
        path = f"{{tmp}}/pages{{i}}"
        pipe = CdcPipeline(spark, path, n_buckets={n_buckets})
        t0 = time.time(); pipe.replay_all(binlog); dt = time.time() - t0
        times.append(dt)
        if rows is None:
            rows = pipe.table.read().count()
            lake_bytes = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _dn, fn in os.walk(path) for f in fn
            )
        shutil.rmtree(path, ignore_errors=True)
    best = min(times)
    print(json.dumps({{"cores": cores, "times_sec": [round(t, 2) for t in times],
                      "best_sec": round(best, 2),
                      "events_per_sec": round(n_events / best, 1),
                      "rows": rows, "lake_bytes": lake_bytes}}))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
"""


def _taskset(cores: int) -> list[str]:
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cores - 1}"]
    return []  # pragma: no cover


def run_level(
    repo: str, cores: int, n_events: int, binlog: str, extra: dict[str, str]
) -> dict:
    sys.path.insert(0, repo)
    from bench import host_calibration

    cal = host_calibration(8)
    out = subprocess.run(
        [*_taskset(cores),
         sys.executable, "-c", _CHILD.format(repo=repo, n_buckets=N_BUCKETS),
         str(cores), str(n_events), binlog, str(REPEATS), json.dumps(extra)],
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


def gen_binlog(repo: str, dst: str, n_events: int, codec: str) -> int:
    confs = {
        "snappy": {"spark.sql.parquet.compression.codec": "snappy"},
        "zstd1": {
            "spark.sql.parquet.compression.codec": "zstd",
            # parquet's writer-side level key; without it zstd writes at
            # the codec default (level 3)
            "spark.hadoop.parquet.compression.codec.zstd.level": "1",
        },
    }[codec]
    gen = subprocess.run(
        [sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r)\n"
            "from crypto_exchange_etl_spark.session import get_spark\n"
            "from crypto_exchange_etl_spark.sources.binlog import write_binlog_segments\n"
            "s = get_spark(cores=32, extra_conf=%r)\n"
            "s.sparkContext.setLogLevel('ERROR')\n"
            "write_binlog_segments(s, %r, n_events=%d, n_segments=8, "
            "files_per_segment=8, n_urls=%d, seed=42, html_repeat=%d)\n"
            % (repo, confs, dst, n_events, max(1000, n_events // 20), HTML_REPEAT)
        )],
        capture_output=True, text=True,
    )
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr)
        raise SystemExit(f"binlog generation failed rc={gen.returncode}")
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fn in os.walk(dst) for f in fn
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    only = os.environ.get("SPARK_CODEC_VARIANTS")
    variants = (
        {k: VARIANTS[k] for k in only.split(",")} if only else dict(VARIANTS)
    )

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="codecbench_", dir=base)
    results: dict[str, dict] = {}
    try:
        binlogs: dict[str, str] = {}
        binlog_bytes: dict[str, int] = {}
        for codec in {v[0] for v in variants.values()}:
            p = os.path.join(tmp, f"binlog_{codec}")
            binlog_bytes[codec] = gen_binlog(repo, p, n_events, codec)
            binlogs[codec] = p

        for name, (bl_codec, extra) in variants.items():
            levels = {}
            for cores in LEVELS:
                levels[f"c{cores}"] = run_level(
                    repo, cores, n_events, binlogs[bl_codec], extra
                )
            lo, hi = levels[f"c{LEVELS[0]}"], levels[f"c{LEVELS[1]}"]
            eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (
                LEVELS[1] / LEVELS[0]
            )
            results[name] = {
                **levels,
                f"eff_{LEVELS[0]}to{LEVELS[1]}": round(eff, 3),
                "binlog_bytes": binlog_bytes[bl_codec],
            }
            print(json.dumps({name: results[name]}), flush=True)

        out = {
            "n_events": n_events,
            "levels": list(LEVELS),
            "repeats": REPEATS,
            "html_repeat": HTML_REPEAT,
            "variants": results,
            "method": "min of REPEATS replays per pinned level per variant; "
                      "binlog regenerated per source codec, identical seed; "
                      "lake codec via session conf in the level subprocess",
        }
        line = json.dumps(out)
        print(line)
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
