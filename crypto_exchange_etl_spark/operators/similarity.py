"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- **Brute-force cosine top-k** — the correctness baseline. Queries are
  broadcast (small side) against the corpus; per-pair cosine is computed
  with ``zip_with`` + ``aggregate`` array expressions, top-k by
  ``row_number`` per query. Cost O(|Q|·|corpus|·dim) but embarrassingly
  parallel and shuffle-light (only the top-k window shuffles, on qid).
- **Hyperplane LSH (SRP)** — the scale path: sign-bits of dot products
  against fixed random hyperplanes → bucket id; ANN search only compares
  within matching buckets (same candidate-pair shape as MinHash LSH).

Determinism note (this is why the arithmetic looks pedantic): the DuckDB
oracle must reproduce every value bit-for-bit. Float dot products are
order- and SIMD-sensitive, so all inner products run in **exact int64
arithmetic over 10⁶-quantized components** (see ``Q_SCALE``), and only
the final ``dot/sqrt(na·nb)`` returns to double (IEEE sqrt/div on
identical inputs is identical everywhere). The hyperplanes are
small-integer literals, so their dot products are exact too.

At 100 TB the same trick holds (integer ops are Tungsten codegen'd); a
production variant could relax to floats once a tolerance-based checker
replaces hash equality.

Reference analogue: none (SURVEY.md §2 marks similarity search as a
training-data-pipeline extension, not a reference op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Quantization scale: floats are mapped to exact integers via
#: floor(x·10⁶) before any product/sum. All inner-product arithmetic is
#: then int64 — exact, associative, overflow-safe (|x|<6 ⇒ |dot| ≤
#: 64·(6e6)² ≈ 2.3e15 < 2⁵³, so even the final int→double conversion is
#: exact in both engines). This sidesteps both float reassociation AND
#: the engines' differing decimal-precision promotion rules.
Q_SCALE = 1_000_000.0


def _q6(x: Column) -> Column:
    return F.floor(x.cast("double") * F.lit(Q_SCALE)).cast("long")


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized float arrays."""
    prods = F.zip_with(a, b, lambda x, y: _q6(x) * _q6(y))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, p: acc + p)


def _norm2_dec(a: Column) -> Column:
    return _dot_dec(a, a)


def cosine(a: Column, b: Column, scale: int | None = None) -> Column:
    """dot/√(na²·nb²) as double — deterministic cross-engine.

    The dot products are exact quantized integers; the final
    cast/sqrt/divide are IEEE-deterministic on identical inputs, so NO
    rounding is needed for cross-engine equality (``scale`` kept for
    callers that want tidy output)."""
    d = _dot_dec(a, b).cast("double")
    n = F.sqrt(_norm2_dec(a).cast("double") * _norm2_dec(b).cast("double"))
    sim = d / n
    return F.round(sim, scale) if scale is not None else sim


def _sim_hoisted() -> Column:
    """Pair similarity from a per-pair dot and PRE-COMPUTED norms."""
    return (
        _dot_dec(F.col("_qv"), F.col("_cv")).cast("double")
        / F.sqrt(F.col("_qn").cast("double") * F.col("_cn").cast("double"))
    ).alias("sim")


def _with_norm(df: DataFrame, id_col: str, vec_col: str, id_out: str,
               vec_out: str, norm_out: str) -> DataFrame:
    """(id, vec, ‖vec‖²) — norms hoisted OUT of the pair loop: computing
    cosine(a,b) per pair costs 3 inner products, but ‖a‖²/‖b‖² depend
    only on their own row. Hoisting them is a 3× arithmetic cut on every
    O(|Q|·N) or O(bucket²) pair stage (measured 2.4× end-to-end on
    cosine_topk at sf0.1); the per-pair cost drops to one dot product.
    Same integers → bit-identical sims."""
    return df.select(
        F.col(id_col).alias(id_out),
        F.col(vec_col).alias(vec_out),
        _norm2_dec(F.col(vec_col)).alias(norm_out),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k corpus neighbours per query vector (excluding self).

    Output: qid, rank (1-based), nid, sim. Queries are broadcast — the
    corpus is never shuffled; only (|Q|·k)-sized results move. Norms are
    hoisted per vector (see :func:`_with_norm`).
    """
    q = _with_norm(queries, id_col, vec_col, "qid", "_qv", "_qn")
    c = _with_norm(corpus, id_col, vec_col, "nid", "_cv", "_cn")
    sims = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select("qid", "nid", _sim_hoisted())
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "sim")
    )


# ---------------------------------------------------------------------------
# Hyperplane LSH (signed random projections)
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> list[list[int]]:
    """Deterministic pseudo-random ±1 hyperplanes as literal ints.

    A tiny LCG keyed by (seed, plane, coord) — no RNG library, so the
    identical literals can be inlined into the DuckDB oracle SQL.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            x = (1103515245 * (seed * 1_000_003 + p * 10_007 + i) + 12345) % (2**31)
            row.append(1 if (x >> 16) & 1 else -1)
        planes.append(row)
    return planes


def srp_bucket(
    vec_col: Column | str, planes: list[list[int]]
) -> Column:
    """Bucket id = Σ_p 2^p · [dot(v, plane_p) > 0] (exact integer dots)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        prods = F.zip_with(
            v,
            F.array(*[F.lit(x) for x in plane]),
            lambda x, y: _q6(x) * y.cast("long"),
        )
        d = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, pr: acc + pr)
        bucket = bucket + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ann_lsh_buckets(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) assignment for SRP-LSH ANN search."""
    return corpus.select(
        F.col(id_col), srp_bucket(vec_col, hyperplanes(dim, n_planes)).alias("bucket")
    )


def ann_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: exact cosine only within the query's SRP bucket.

    With n_planes=4 → 16 buckets, each query compares against ~1/16 of
    the corpus; recall is traded via n_planes. ``multiprobe=True``
    additionally probes every Hamming-1 neighbour of the query's bucket
    (the n_planes+1 probe list): a true neighbour lost to ONE flipped
    sign bit — the dominant LSH miss mode, since a near-identical vector
    flips each bit with small independent probability — is recovered at
    (n_planes+1)× the candidate cost, still a tiny corpus fraction
    (e.g. 5/16 at n_planes=4 vs 16/16 for brute force). The probe list
    is exploded on the QUERY side, so the corpus is still scanned once
    and never reshuffled; per (query, neighbour) at most one probe
    matches (a corpus vector has exactly one bucket), so no dedup pass
    is needed. Same output shape as :func:`cosine_topk`.
    """
    planes = hyperplanes(dim, n_planes)
    c = _with_norm(corpus, id_col, vec_col, "nid", "_cv", "_cn").withColumn(
        "_cb", srp_bucket(F.col("_cv"), planes)
    )
    q = _with_norm(queries, id_col, vec_col, "qid", "_qv", "_qn").withColumn(
        "_qb", srp_bucket(F.col("_qv"), planes)
    )
    if multiprobe:
        probes = F.array(
            F.col("_qb"),
            *[
                F.col("_qb").bitwiseXOR(F.lit(1 << p).cast("long"))
                for p in range(n_planes)
            ],
        )
        q = q.withColumn("_qb", F.explode(probes))
    sims = (
        c.join(F.broadcast(q), (F.col("_cb") == F.col("_qb")) & (F.col("qid") != F.col("nid")))
        .select("qid", "nid", _sim_hoisted())
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "sim")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, sim ≥ threshold).

    Scale path: **banded** SRP-LSH, the same structure as MinHash LSH
    banding (operators/dedup.lsh_candidate_pairs). The ``n_planes`` sign
    bits split into ``bands`` independent bands of r = n_planes/bands
    planes; two vectors are candidates iff they agree on ALL r sign bits
    of ≥ 1 band. Exact cosine then verifies candidates.

    Geometry is the scale knob: per band, E[bucket] ≈ N/2^r, so candidate
    pairs ≈ bands · N²/2^(r+1) under uniformity. A single 8-plane band at
    N=10⁹ means 256 buckets of ~4M vectors ⇒ ~10¹³ pairs — useless. Size
    r ≈ log₂(N / target_bucket) (e.g. N=10⁹, target 10³ ⇒ r≈20) and add
    bands for recall: P(candidate | sim s) = 1-(1-p(s)^r)^bands with
    p(s) = 1 - arccos(s)/π. Candidate pairs are distinct-ed BEFORE the
    vector fetch, so each pair pays the exact-cosine verify once.
    """
    if n_planes % bands:
        raise ValueError(f"bands={bands} must divide n_planes={n_planes}")
    r = n_planes // bands
    planes = hyperplanes(dim, n_planes)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            srp_bucket(vec_col, planes[b * r : (b + 1) * r]).alias("bh"),
        )
        for b in range(bands)
    ]
    ex = corpus.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, "b.band", "b.bh")
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bh") == F.col("b.bh"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = _with_norm(corpus, id_col, vec_col, "id_a", "_qv", "_qn")
    vb = _with_norm(corpus, id_col, vec_col, "id_b", "_cv", "_cn")
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", _sim_hoisted())
        .where(F.col("sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF-flat (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF codebook: the ``n_cells`` corpus vectors with the
    smallest ``portable_hash64(id)`` (a uniform deterministic sample).

    Production IVF trains the codebook with k-means; a hash-sampled
    codebook keeps the identical *index structure* (cells, assignment,
    probe) while staying bit-reproducible in the DuckDB oracle — and
    sampled codebooks are a known-acceptable IVF degradation (FAISS's own
    docs allow random training subsets). Cell ids are the 0-based rank by
    hash, so the mapping is stable across engines and runs.

    Output: (cell int, centroid array<float>) — ``n_cells`` rows, always
    broadcast by callers.
    """
    from ..functions.hashing import portable_hash64

    h = portable_hash64(F.col(id_col).cast("string"))
    w = Window.orderBy("_h", id_col)
    return (
        corpus.select(F.col(id_col), F.col(vec_col), h.alias("_h"))
        .orderBy("_h", id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).alias("cell"),
            F.col(vec_col).alias("centroid"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic fixed-iteration Lloyd's k-means codebook — the
    recall upgrade over :func:`ivf_centroids` at the SAME index shape
    (FAISS-style IVF training, cf. its random-subset training default).

    Determinism (bit-reproducible across runs, layouts, engines):

    - init = the hash-sampled :func:`ivf_centroids` codebook;
    - assignment = exact quantized-int cosine argmax (ties → smaller
      cell), the same arithmetic the probe path uses;
    - update = component means computed as INTEGER sums of the quantized
      components (associative ⇒ shuffle-order-free) divided once into a
      double — no float accumulation anywhere;
    - empty cells keep their previous centroid.

    Scale shape: each iteration is one broadcast-crossJoin assign
    (O(N·n_cells·dim), the IVF build cost) + one explode/groupBy mean
    (O(N·dim), map-side combinable). The codebook (n_cells×dim) is
    driver-resident between iterations — bounded metadata, exactly like
    the manifest — so each iteration's plan starts fresh instead of
    growing an n_iter-deep lineage."""
    cents = ivf_centroids(corpus, n_cells, id_col, vec_col)
    corp = _with_norm(corpus, id_col, vec_col, "nid", "_cv", "_cn")
    dim_schema = "cell int, centroid array<double>"
    for _ in range(n_iter):
        assigned = _assign_cells(corp, cents)
        comp = (
            assigned.select("cell", F.posexplode(F.col("_cv")).alias("pos", "_x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(_q6(F.col("_x"))).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .withColumn(
                "_c",
                (F.col("_s").cast("double") / F.col("_n").cast("double"))
                / F.lit(Q_SCALE),
            )
        )
        new = (
            comp.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_c"))),
                    lambda s: s["_c"],
                ).alias("centroid")
            )
        )
        rows = {r["cell"]: list(r["centroid"]) for r in new.collect()}
        prev = {r["cell"]: list(r["centroid"]) for r in cents.collect()}
        spark = corpus.sparkSession
        cents = spark.createDataFrame(
            [(c, rows.get(c, prev[c])) for c in sorted(prev)], dim_schema
        )
    return cents


def _assign_cells(corp_normed: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (argmax cosine, ties → smaller cell)
    for a corpus already in (nid, _cv, _cn) form."""
    cents = _with_norm(centroids, "cell", "centroid", "cell", "_ce", "_cen")
    j = corp_normed.crossJoin(F.broadcast(cents))
    sim = _dot_dec(F.col("_cv"), F.col("_ce")).cast("double") / F.sqrt(
        F.col("_cn").cast("double") * F.col("_cen").cast("double")
    )
    w = Window.partitionBy("nid").orderBy(sim.desc(), F.col("cell"))
    return (
        j.withColumn("_ar", F.row_number().over(w))
        .where(F.col("_ar") == 1)
        .select("nid", "_cv", "_cn", "cell")
    )


def ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-file index: every corpus vector assigned to its nearest
    centroid (argmax cosine; ties → smaller cell id).

    One crossJoin against the broadcast codebook (O(N·n_cells·dim), the
    standard IVF build cost) + one shuffle on ``id`` for the per-vector
    argmax. At scale this runs ONCE and persists partitioned by ``cell``
    (`.write.partitionBy("cell")`), so probes prune cells at the source.

    Output: (nid, _cv vector, _cn ‖·‖², cell) — the norm rides along so
    probe-time pair similarity needs only a dot product.
    """
    return _assign_cells(
        _with_norm(corpus, id_col, vec_col, "nid", "_cv", "_cn"), centroids
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: exact cosine only inside the query's
    ``n_probe`` nearest cells. ``centroids`` overrides the default
    hash-sampled codebook (pass :func:`kmeans_centroids` output for the
    trained variant; the index/probe machinery is identical).

    Each query scans ~``n_probe/n_cells`` of the corpus (vs 1/1 for
    brute force, vs an untunable bucket share for single-band SRP).
    ``n_probe = n_cells`` degrades gracefully to EXACT brute force —
    pinned by test — which is the recall/latency knob IVF is used for.
    Probe lists (|Q|·n_probe rows) are broadcast; the corpus index never
    reshuffles after the build. Output shape = :func:`cosine_topk`.
    """
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_cells, id_col, vec_col)
    )
    index = ivf_index(corpus, cents, id_col, vec_col)
    q = _with_norm(queries, id_col, vec_col, "qid", "_qv", "_qn")
    cn = _with_norm(cents, "cell", "centroid", "cell", "_ce", "_cen")
    qc = q.crossJoin(F.broadcast(cn)).select(
        "qid", "_qv", "_qn", "cell",
        (
            _dot_dec(F.col("_qv"), F.col("_ce")).cast("double")
            / F.sqrt(F.col("_qn").cast("double") * F.col("_cen").cast("double"))
        ).alias("_cs"),
    )
    pw = Window.partitionBy("qid").orderBy(F.col("_cs").desc(), F.col("cell"))
    probe = (
        qc.withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= n_probe)
        .select("qid", "_qv", "_qn", "cell")
    )
    sims = (
        index.join(F.broadcast(probe), "cell")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", _sim_hoisted())
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "sim")
    )


def knn_label_vote(
    topk: DataFrame, labels: DataFrame, id_col: str = "vec_id", label_col: str = "label"
) -> DataFrame:
    """Classify each query by majority label of its neighbours (ties →
    smaller label). Input: output of :func:`cosine_topk` + (id, label).

    Broadcast side: ``topk`` is |Q|·k rows of (qid, nid) — tiny by
    construction — while ``labels`` spans the whole corpus (GBs per
    executor at 10⁹ vectors), so the hint goes on ``topk`` and the label
    map streams through the probe side unshuffled (round-2 review fix)."""
    lab = labels.select(F.col(id_col).alias("nid"), F.col(label_col).alias("nlabel"))
    votes = (
        F.broadcast(topk).join(lab, "nid")
        .groupBy("qid", "nlabel")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    return votes.groupBy("qid").agg(
        F.max_by(
            F.col("nlabel"), F.struct(F.col("n_votes"), -F.col("nlabel"))
        ).alias("pred_label")
    )
