"""Large-corpus near-dup evidence: MinHash-LSH + components at 10^7 docs.

The text/similarity operators are oracle-verified at 500-doc driver scale;
this script supplies the CDC-grade measured evidence at corpus scale: a
deterministic synthetic corpus of N documents (default 10^7) with
Zipf-skewed vocabulary (hot boilerplate shingles -> skewed LSH buckets,
the adversarial shape for the band self-join) and planted near-dup
clusters, run through

    minhash_signature -> lsh_candidate_pairs  (banded equi-join, NOT all-pairs)
    -> dedup_components                       (pointer-jumping union)

at two pinned parallelism levels (same corpus, separate processes), with
min-of-REPEATS per level, per-level host calibration, candidate-pair
counts, recall of the planted clusters, and the top-1-bucket share that
quantifies how close the workload gets to the quadratic cliff.

Corpus construction (pure Catalyst, no Python UDFs, fully deterministic):
- docs come in cohorts of COHORT consecutive ids; a DUP_FRAC fraction of
  cohorts are near-dup clusters whose members share the cohort's base
  text with exactly one member-specific token substituted (Jaccard ~=
  (L-2)/(L+2) per member pair for L-token docs - well above the LSH
  threshold), the rest are singleton docs with their own base text;
- token j of base b is  w_{floor(V * u^ALPHA)}  with  u =
  xxhash64(b, j)/2^64  in [0,1): a power-law vocab draw, so a few words
  (and hence shingles) are orders of magnitude hotter than the tail -
  the Common-Crawl boilerplate shape.

Usage:
    python scripts/dedup_corpus_bench.py [n_docs] [out_json]
Env:
    SPARK_SCALE_LEVELS    default "1,4"
    SPARK_SCALE_REPEATS   default 2
    DEDUP_DOC_TOKENS      default 32
    DEDUP_COHORT          default 8
    DEDUP_DUP_FRAC        default 0.10  (fraction of cohorts that are clusters)
    DEDUP_VOCAB           default 1000000
    DEDUP_ALPHA           default 2.0   (bigger = hotter head)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPEATS = int(os.environ.get("SPARK_SCALE_REPEATS", "2"))
LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_SCALE_LEVELS", "1,4").split(",")
)
if len(LEVELS) != 2:
    raise SystemExit(f"SPARK_SCALE_LEVELS must be two core counts, got {LEVELS!r}")

_CHILD = r"""
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
from crypto_exchange_etl_spark.session import get_spark
from crypto_exchange_etl_spark.operators.dedup import (
    minhash_signature, lsh_band_rows, lsh_candidate_pairs, dedup_components)
import pyspark.sql.functions as F

cores = int(sys.argv[1]); corpus = sys.argv[2]; repeats = int(sys.argv[3])
cohort = int(sys.argv[4]); n_total = int(sys.argv[5])
# Split granularity: the tmpfs corpus is a few hundred MB of zstd
# parquet in 64 small files — Spark's default 128MB maxPartitionBytes
# packs that into ~6 input splits, so any level above ~2 cores runs
# partial waves with idle cores (measured: 102s -> 76s for the pair
# join at 4 cores just by splitting finer). 4MB splits + 4*cores
# shuffle partitions keep every level >=3 tasks/core; at real scale
# the default 128MB already yields thousands of splits per TB and no
# override is needed.
spark = get_spark(app_name=f"dedupscale{{cores}}", cores=cores,
                  shuffle_partitions=4 * cores,
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
                      "spark.sql.files.openCostInBytes": "262144",
                  }})
spark.sparkContext.setLogLevel("ERROR")

times = []
stats = None
for rep in range(repeats):
    docs = spark.read.parquet(corpus)
    t0 = time.time()
    sig = minhash_signature(docs)
    # the pipeline hand-off: candidate pairs are the (small) output of
    # the LSH phase — persist them so the components phase consumes
    # them instead of re-deriving the whole minhash DAG (which is what
    # any real pipeline does; the cache is |pairs| rows, O(dups))
    pairs = lsh_candidate_pairs(sig).persist()
    n_pairs = pairs.count()
    t_lsh = time.time() - t0
    t1 = time.time()
    labels = dedup_components(pairs)
    n_clusters = labels.select("component").distinct().count()
    t_comp = time.time() - t1
    times.append((t_lsh, t_comp))
    if rep < repeats - 1:
        pairs.unpersist()
    if stats is None:
        n_docs = docs.count()
        bands = lsh_band_rows(minhash_signature(docs))
        bc = bands.groupBy("band", "bh").count()
        agg = bc.agg(F.max("count").alias("mx"), F.sum("count").alias("tot"),
                     F.count(F.lit(1)).alias("n_buckets")).collect()[0]
        # recall of the planted clusters: count how many planted NEIGHBOR
        # pairs (i, i+1 inside one dup cohort) the candidate set recovered
        # — derivable arithmetically, no self-join needed
        planted = docs.where(
            (F.col("is_dup") == 1)
            & (F.col("doc_id") % cohort != cohort - 1)
            & (F.col("doc_id") + 1 < n_total)
        ).select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1).alias("id_b"),
        )
        n_planted = planted.count()
        hit = planted.join(pairs, on=["id_a", "id_b"], how="left_semi").count()
        stats = {{
            "n_docs": n_docs,
            "candidate_pairs": n_pairs,
            "clusters": n_clusters,
            "lsh_buckets": int(agg["n_buckets"]),
            "top1_bucket_share": round(float(agg["mx"]) / float(agg["tot"]), 6),
            "top1_bucket_rows": int(agg["mx"]),
            "planted_neighbor_pairs": n_planted,
            "planted_recall": round(hit / n_planted, 4) if n_planted else None,
        }}
best_lsh = min(t for t, _ in times)
best_comp = min(c for _, c in times)
print(json.dumps({{"cores": cores,
                  "lsh_times_sec": [round(t, 2) for t, _ in times],
                  "comp_times_sec": [round(c, 2) for _, c in times],
                  "best_lsh_sec": round(best_lsh, 2),
                  "best_comp_sec": round(best_comp, 2),
                  "best_total_sec": round(best_lsh + best_comp, 2),
                  "docs_per_sec": round(stats["n_docs"] / (best_lsh + best_comp), 1),
                  **stats}}))
"""

_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from crypto_exchange_etl_spark.session import get_spark
import pyspark.sql.functions as F

n_docs = {n_docs}; out = {out!r}
L = {doc_tokens}; COHORT = {cohort}; DUP_FRAC = {dup_frac}
V = {vocab}; ALPHA = {alpha}
spark = get_spark(cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

d = spark.range(0, n_docs, 1, 64).withColumnRenamed("id", "doc_id")
d = d.withColumn("cohort", (F.col("doc_id") / COHORT).cast("long"))
# deterministic cohort selection: hash the cohort id into [0,1)
coh_u = (F.abs(F.xxhash64(F.col("cohort"), F.lit(7))) % 1000000) / 1000000.0
d = d.withColumn("is_dup", (coh_u < DUP_FRAC).cast("int"))
base = F.when(F.col("is_dup") == 1, F.col("cohort") + {base_salt}) \
        .otherwise(F.col("doc_id") + {uniq_salt})
member = F.col("doc_id") % COHORT
# one member-specific substitution site per doc (dup cohorts only)
sub_pos = (F.abs(F.xxhash64(F.col("doc_id"), F.lit(13))) % L)

def word(seed_col, j):
    u = (F.abs(F.xxhash64(seed_col, j)) % 1048576) / 1048576.0
    idx = F.floor(F.pow(u, F.lit(ALPHA)) * V).cast("long")
    return F.concat(F.lit("w"), idx.cast("string"))

toks = F.transform(
    F.sequence(F.lit(0), F.lit(L - 1)),
    lambda j: F.when(
        (F.col("is_dup") == 1) & (member > 0) & (j == sub_pos),
        word(F.col("doc_id") + {perturb_salt}, j),
    ).otherwise(word(base, j)),
)
d = d.withColumn("text", F.array_join(toks, " ")).select(
    "doc_id", "cohort", "is_dup", "text")
d.write.mode("overwrite").parquet(out)
print("generated", spark.read.parquet(out).count(), "docs")
"""


def _taskset_prefix(cores: int) -> list[str]:
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cores - 1}"]
    return []  # pragma: no cover


def run_level(repo: str, cores: int, corpus: str, cohort: int, n_docs: int) -> dict:
    sys.path.insert(0, repo)
    from bench import host_calibration

    cal = host_calibration(8)
    out = subprocess.run(
        [*_taskset_prefix(cores),
         sys.executable, "-c", _CHILD.format(repo=repo),
         str(cores), corpus, str(REPEATS), str(cohort), str(n_docs)],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise SystemExit(f"level {cores} child failed rc={out.returncode}")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["host_calibration_before"] = cal
    res["pinned_cpus"] = cores
    return res


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="dedupbench_", dir=base)
    try:
        corpus = f"{tmp}/corpus"
        cohort = int(os.environ.get("DEDUP_COHORT", "8"))
        gen_src = _GEN.format(
            repo=repo, n_docs=n_docs, out=corpus,
            doc_tokens=int(os.environ.get("DEDUP_DOC_TOKENS", "32")),
            cohort=cohort,
            dup_frac=float(os.environ.get("DEDUP_DUP_FRAC", "0.10")),
            vocab=int(os.environ.get("DEDUP_VOCAB", "1000000")),
            alpha=float(os.environ.get("DEDUP_ALPHA", "2.0")),
            base_salt=1_000_000_007, uniq_salt=2_000_000_011,
            perturb_salt=3_000_000_019,
        )
        gen = subprocess.run(
            [sys.executable, "-c", gen_src], capture_output=True, text=True
        )
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr)
            raise SystemExit(f"corpus generation failed rc={gen.returncode}")
        lo = run_level(repo, LEVELS[0], corpus, cohort, n_docs)
        hi = run_level(repo, LEVELS[1], corpus, cohort, n_docs)
        ratio = LEVELS[1] / LEVELS[0]
        eff = (lo["best_total_sec"] / hi["best_total_sec"]) / ratio
        result = {
            "n_docs": n_docs,
            "low": lo,
            "high": hi,
            f"scaling_efficiency_{LEVELS[0]}_to_{LEVELS[1]}": round(eff, 3),
            "method": f"min of {REPEATS} full minhash_lsh+components runs "
                      "per level over the same Zipf-skewed parquet corpus "
                      "(planted near-dup cohorts), each level cpuset-pinned "
                      "to exactly its core budget, tmpfs scratch, 4MB input "
                      "splits + 4*cores shuffle partitions (>=3 tasks/core "
                      "at every level; see in-script note)",
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
