"""Deduplication operators for web-scale corpora.

Four tiers, cheapest to richest, all Catalyst built-ins (no Python UDFs):

1. **Exact** — hash-groupBy on content digest. One shuffle on the digest;
   map-side partial agg collapses per-split duplicates before the
   exchange, so shuffle volume is O(distinct digests per split).
2. **MinHash + LSH banding** — k seeded portable hashes over word
   shingles → signature; signatures split into b bands of r rows; docs
   sharing any band hash are candidate pairs. The pair join is on the
   *band hash*, so cost is O(Σ bucket²) not O(n²) — the 100 TB scale
   path. Probability a pair with Jaccard s collides: 1-(1-s^r)^b.
3. **SimHash** — per-token hash bit-votes folded into a compact signature;
   near-dups differ in few bits (Hamming). Computed entirely with array
   ops + integer bit arithmetic, one narrow pass.
4. **n-gram Jaccard verify** — the exact similarity used to confirm LSH
   candidates: |A∩B| / |A∪B| over distinct shingles via an explode +
   self-join restricted to candidate pairs.

Reference analogue: the reference's only dedup is uid set-membership
(/root/reference/fintick/controllers/base.py:88-99, P7 in SURVEY.md §2.2)
— identity is exchange-assigned. Content-derived identity (digests,
signatures) is the generalization a web-pages corpus needs.

Embedding-cosine near-dup lives in ``operators/similarity.py`` (same
candidate-pair machinery over hyperplane-LSH buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.text import tokens, word_shingles

# ---------------------------------------------------------------------------
# 1. Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct content: digest, canonical (min) id, dup count.

    `groupBy(md5)` → partial agg map-side; at 100 TB the shuffle carries
    one row per distinct digest per input split.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one row (the min-id one) per distinct text."""
    keep = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_digest"))
        .agg(F.min_by(keep, F.col(id_col)).alias("_r"))
        .select(*[F.col(f"_r.{c}").alias(c) for c in df.columns])
    )


# ---------------------------------------------------------------------------
# 2. MinHash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """id + ``mh_0..mh_{k-1}`` columns: min over shingles of the i-th
    hash-family member.

    The family is Kirsch-Mitzenmacher **double hashing**: ONE md5 per
    shingle yields two independent 60-bit halves (h1, h2); member i is
    ``(h1 + i·h2) mod 2^60``. md5 is the dominant per-shingle cost, so
    this is ~k× less hashing than k seeded digests for the same LSH
    quality (K-M preserves uniformity/independence enough for Bloom- and
    MinHash-style uses — the classic result).

    Physical shape: explode shingles → one md5 → k flat modular
    combinations (whole-stage codegen'd; Spark's higher-order array
    lambdas are interpreted per row, so k nested ``transform``s would be
    ~10× slower) → one ``groupBy(id).agg(min...)`` with map-side partial
    aggregation. At 100 TB the shuffle carries k longs per (doc ×
    input-split), not the shingle sets."""
    if k > 8:
        raise ValueError(
            f"k={k} > 8 would overflow int64 in the double-hash combine "
            "(max h1 + 7*h2 < 2^63); split into multiple signature passes"
        )
    from ..functions.hashing import portable_hash64_pair

    # Shingles are generated WITHOUT word_shingles here: its
    # transform-lambda is an interpreted HOF (per-element overhead), and
    # its array_distinct is unnecessary under min (min over the shingle
    # multiset == min over the set — verified equal). Instead: explode
    # the start indices, then slice/array_join — plain codegen'd
    # collection expressions — so explode → md5 → partial min all fuse
    # into one whole-stage-codegen pass. Measured 2× over the
    # word_shingles form at sf0.1.
    t = tokens(F.col(text_col) if isinstance(text_col, str) else text_col)
    ex = df.select(F.col(id_col), t.alias("_t")).select(
        id_col,
        "_t",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("_t") - (shingle_k - 1), F.lit(1))
            )
        ).alias("_i"),
    )
    sh = ex.select(
        id_col,
        F.array_join(F.slice(F.col("_t"), F.col("_i"), shingle_k), " ").alias("_sh"),
    )
    h1, h2 = portable_hash64_pair(F.col("_sh"))
    # projection boundary: md5 computed once, halves reused k times
    hashed = sh.select(F.col(id_col), h1.alias("_h1"), h2.alias("_h2"))
    m = F.lit(1 << 60).cast("long")
    aggs = [
        F.min((F.col("_h1") + F.lit(i) * F.col("_h2")) % m).alias(f"mh_{i}")
        for i in range(k)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_band_rows(
    sig: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bh) rows — the banding step of MinHash-LSH.

    Band hash = portable hash of the ``|``-joined band rows; each band is
    an independent bucket space. Shared by :func:`lsh_candidate_pairs`
    (self-join form) and the incrementally-maintained
    :class:`~..lake.lsh_index.MaterializedLshIndex` (probe-join form) —
    one definition so batch and incremental banding are bit-identical.
    """
    r = k // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            portable_hash64(
                F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, "b.band", "b.bh")


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 LSH band.

    The self-join key is (band_index, band_hash) so each band is an
    independent bucket space; AQE skew-split handles pathological buckets
    (boilerplate pages).
    """
    exploded = lsh_band_rows(sig, id_col=id_col, k=k, bands=bands)
    a = exploded.alias("a")
    bb = exploded.alias("b")
    return (
        a.join(
            bb,
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


# ---------------------------------------------------------------------------
# 3. SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """``bits``-wide SimHash over *distinct* word tokens.

    For each bit position i: vote = Σ over tokens of (hash>>i & 1 ? +1 : -1);
    signature bit i is set iff vote > 0 (⇔ 2·ones > n).

    Physical shape: explode distinct tokens → one codegen'd hash per row →
    ``groupBy(id)`` with ``bits`` conditional-sum aggregates (all map-side
    partially aggregated). Flat-column arithmetic, no interpreted array
    lambdas in the hot path.

    Zero-token documents have no signature and are dropped (explode of an
    empty token array emits nothing; the oracle mirrors the skip) — unlike
    ``word_shingles``, raw ``tokens`` emits no synthetic "" element, so
    whitespace-only text cannot silently hash as one empty token.
    """
    ex = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("_tk"),
    ).withColumn("_h", portable_hash64(F.col("_tk"), 99))
    ones = [
        F.sum(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1))).alias(f"_o{i}")
        for i in range(bits)
    ]
    g = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *ones)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            (F.col(f"_o{i}") * 2) > F.col("_n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return g.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame, id_col: str = "doc_id", bits: int = 16, max_hamming: int = 3
) -> DataFrame:
    """Pairs within Hamming ≤ ``max_hamming`` of each other's simhash.

    Pigeonhole bucketing, not a cross join: split the signature into
    ``max_hamming + 1`` bit-chunks — two signatures within d differing
    bits must agree *exactly* on ≥1 of d+1 chunks. Join on
    (chunk_index, chunk_value) buckets, dedup candidate pairs, then
    verify true Hamming distance with ``bit_count``. Cost is
    O(Σ bucket²) per chunk space — the same scale shape as MinHash LSH.
    """
    n_chunks = max_hamming + 1
    width = -(-bits // n_chunks)  # ceil
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("cv"),
            )
            for i in range(n_chunks)
        ]
    )
    ex = sig.select(F.col(id_col), F.col("simhash"), F.explode(chunks).alias("c")).select(
        id_col, "simhash", "c.ci", "c.cv"
    )
    a, b = ex.alias("a"), ex.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            on=[
                F.col("a.ci") == F.col("b.ci"),
                F.col("a.cv") == F.col("b.cv"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .where(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# 4. Exact n-gram Jaccard (verification / small-scale direct use)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for id_a < id_b.

    With ``candidates`` (from :func:`lsh_candidate_pairs`) the exploded
    shingle rows are semi-joined to the candidate doc-id set BEFORE the
    shared-shingle self-join — the pruning must sit upstream of the join
    (Catalyst pushes a LeftSemi through an Aggregate but not through a
    two-sided join), so the O(Σ bucket²) work runs over candidate docs
    only. A second, exact pair-level semi-join then drops same-bucket
    pairs that were never candidates. This is the scale path. Without
    ``candidates``, pairs form via the shared-shingle join (still never a
    cross join: only docs sharing ≥1 shingle pair up).
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_k)).alias("sh")
    )
    if candidates is not None:
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        # per-doc restriction before the explode-join; per-doc shingle
        # counts are unaffected (whole docs in or out). Broadcast is left
        # to AQE's runtime stats: a candidate id set from a 100 TB corpus
        # can itself be GBs, and a forced hint would OOM executors where
        # a shuffle semi-join merely costs time (round-2 review finding).
        sh = sh.join(cand_ids, id_col, "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(
            candidates.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# 5. Duplicate-cluster resolution (connected components)
# ---------------------------------------------------------------------------


def dedup_components(
    pairs: DataFrame,
    max_iter: int = 25,
    id_a: str = "id_a",
    id_b: str = "id_b",
    pointer_jump: bool = True,
    return_rounds: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: the connected
    components of the pair graph, labelled by each component's minimum
    member id (= the canonical document to keep).

    Iterative min-label propagation: every vertex repeatedly adopts the
    smallest label among itself and its neighbours until a fixpoint —
    each round is one join + one hash aggregate, and with plain
    propagation the round count is the graph DIAMETER. Near-dup graphs
    are dense blobs of mutual similarity (diameter 2-4), but adversarial
    chains exist, so ``pointer_jump`` (default on) additionally adopts
    the LABEL'S OWN label each round — Shiloach-Vishkin pointer jumping,
    the same O(log d) round bound the large-star/small-star contraction
    of Kiveris et al. ("Connected Components in MapReduce and Beyond")
    achieves, for one extra narrow self-join of the (vertex, label) map
    per round. Correctness is unchanged: a label is always the id of a
    reachable vertex (jumping composes reachability), labels only
    decrease, and at the fixpoint adjacent labels are mutually ≤, hence
    equal, hence the component minimum. A 1000-vertex path converges in
    ~⌈log₂ d⌉ rounds (pinned by test) vs ~d/2 without jumping.

    Scale notes: labels are (vertex, bigint) — narrow; edges are
    symmetrized once up front; each round ends in ``localCheckpoint``
    to truncate the lineage (an iterative plan otherwise re-derives all
    previous rounds and the DAG grows quadratically). Convergence is
    detected with a count of changed labels — an O(1)-row action per
    round. The fixpoint (min reachable id per vertex) is unique, so the
    result is deterministic regardless of execution order.

    Durability: ``localCheckpoint`` blocks are EXECUTOR-resident — the
    lineage is truncated, so an executor loss mid-iteration aborts the
    whole job (a deterministic rerun is safe, but at 100× restarting a
    multi-hour job is not a plan). Pass ``checkpoint_dir`` to truncate
    with RELIABLE ``df.checkpoint()`` onto that filesystem instead
    (sets the context's checkpoint dir): a lost executor's blocks are
    re-read from storage and the iteration survives. ``checkpoint_every
    = k`` amortizes the write — rounds in between are ``persist()``-ed
    (so each round's convergence count and the pointer-jump self-join —
    which reads the frame twice — execute every join exactly once, not
    re-derived from the last checkpoint) while keeping their lineage
    (≤ k rounds deep) as the recompute path on executor loss; the cache
    is dropped at the next reliable checkpoint.

    Output: (id, component) — one row per vertex of ``pairs``;
    ``component`` = min id in the vertex's component.

    Reference analogue: none (the reference dedups on exchange uids,
    P7); this is the cluster-resolution step every content-level dedup
    pipeline needs between "candidate pairs" and "rows to drop".
    """
    sc = pairs.sparkSession.sparkContext
    if checkpoint_dir is None:
        return _components_impl(
            pairs, max_iter, id_a, id_b, pointer_jump, return_rounds,
            None, checkpoint_every,
        )
    # setCheckpointDir is SESSION-GLOBAL: save and restore it so a job
    # that checkpoints elsewhere does not get silently redirected here
    # for the rest of the session. (Spark has no unset API, so a session
    # with no prior dir is left pointing at checkpoint_dir.)
    opt = sc._jsc.sc().getCheckpointDir()
    prev = opt.get() if opt.isDefined() else None
    sc.setCheckpointDir(checkpoint_dir)
    try:
        return _components_impl(
            pairs, max_iter, id_a, id_b, pointer_jump, return_rounds,
            checkpoint_dir, checkpoint_every,
        )
    finally:
        sc.setCheckpointDir(prev if prev is not None else checkpoint_dir)


def _ck_rdd_dirs(sc, root: str) -> set:
    """Reliable-checkpoint rdd-* dirs currently under ``root``
    (``<root>/<context-uuid>/rdd-N``), via the Hadoop FS API so any
    scheme the checkpoint dir supports works."""
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(root)
    fs = p.getFileSystem(conf)
    out: set = set()
    if not fs.exists(p):
        return out
    for st in fs.listStatus(p):
        if st.isDirectory():
            for st2 in fs.listStatus(st.getPath()):
                out.add(str(st2.getPath().toString()))
    return out


def _ck_delete(sc, paths: set) -> None:
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    for s in paths:
        p = jvm.org.apache.hadoop.fs.Path(s)
        p.getFileSystem(conf).delete(p, True)


def _components_impl(
    pairs: DataFrame,
    max_iter: int,
    id_a: str,
    id_b: str,
    pointer_jump: bool,
    return_rounds: bool,
    checkpoint_dir: str | None,
    checkpoint_every: int,
) -> DataFrame:
    sc = pairs.sparkSession.sparkContext
    # Spark never deletes reliable checkpoints on its own
    # (cleanCheckpoints defaults false): without sweeping, a long run
    # accumulates one full label-set copy per checkpoint. Track the
    # rdd dirs each reliable checkpoint creates and delete the
    # SUPERSEDED label rounds as soon as the next one is materialized —
    # the edge frame's checkpoint (read every round) and the newest
    # label checkpoint (backing the returned frame) are kept; the caller
    # owns checkpoint_dir cleanup after consuming the result, and should
    # dedicate the dir to this call (the sweep diffs its contents).
    _ck_state = {"edges": set(), "labels": set()}

    def _reliable(df: DataFrame, rnd: int) -> DataFrame:
        before = _ck_rdd_dirs(sc, checkpoint_dir)
        out = df.checkpoint(eager=True)
        created = _ck_rdd_dirs(sc, checkpoint_dir) - before
        if rnd == 0:
            _ck_state["edges"] = created
        else:
            _ck_delete(sc, _ck_state["labels"] - _ck_state["edges"])
            _ck_state["labels"] = created
        return out

    _cached: list[DataFrame] = []

    def _truncate(df: DataFrame, rnd: int) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        if rnd % max(1, checkpoint_every) == 0:
            out = _reliable(df, rnd)
            # a reliable copy now exists on disk — the skipped rounds'
            # cached blocks are dead weight; drop them
            for c in _cached:
                c.unpersist()
            _cached.clear()
            return out
        # skipped round: cache it so the convergence count and the next
        # round's joins (the pointer-jump self-join reads this frame
        # TWICE) execute every join exactly once instead of re-deriving
        # all rounds since the last checkpoint (O(k²) joins otherwise);
        # lineage stays intact (≤ checkpoint_every rounds deep) as the
        # recompute path when an executor's cached blocks are lost
        df = df.persist()
        _cached.append(df)
        return df

    e = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    e = _truncate(e, 0)
    labels = e.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("component")
    )
    rounds = 0
    try:
        labels, rounds = _components_loop(
            e, labels, max_iter, pointer_jump, _truncate
        )
        # convergence on a NON-checkpoint round leaves the final labels
        # backed only by the skipped rounds' persisted frames, which the
        # finally below is about to release — re-anchor the result on a
        # reliable checkpoint first so consuming it never re-derives the
        # skipped rounds' joins
        if _cached:
            labels = _reliable(labels, rounds + 1)
    finally:
        # convergence (or the non-convergence raise) on a NON-checkpoint
        # round would otherwise leave the skipped rounds' frames
        # persisted with nothing left to drain them — in a long-lived
        # session each call would pin up to (checkpoint_every - 1) full
        # label sets in executor storage
        for c in _cached:
            c.unpersist()
        _cached.clear()
    out = labels.select(F.col("v").alias("id"), "component")
    return (out, rounds) if return_rounds else out


def _components_loop(e, labels, max_iter, pointer_jump, _truncate):
    """Label-propagation rounds (see ``dedup_components``); returns the
    converged ``(v, component)`` frame and the round count. Split out so
    the caller owns cache hygiene around every exit path."""
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neigh = (
            e.join(labels, e.dst == labels.v)
            .groupBy("src")
            .agg(F.min("component").alias("_nc"))
        )
        l1 = labels.join(neigh, labels.v == neigh.src, "left").select(
            "v",
            F.least(
                F.col("component"), F.coalesce(F.col("_nc"), F.col("component"))
            ).alias("_c1"),
            F.col("component").alias("_old"),
        )
        if pointer_jump:
            # adopt the label's own label: L(v) ← min(L(v), L(L(v))).
            # L(v) is itself a vertex id, so the jump is a narrow
            # (vertex, label) self-join — this is what turns O(d) rounds
            # into O(log d) on chain-shaped components.
            x, y = l1.alias("x"), l1.alias("y")
            new = x.join(y, F.col("x._c1") == F.col("y.v"), "left").select(
                F.col("x.v").alias("v"),
                F.least(
                    F.col("x._c1"), F.coalesce(F.col("y._c1"), F.col("x._c1"))
                ).alias("component"),
                F.col("x._old").alias("_old"),
            )
        else:
            new = l1.select("v", F.col("_c1").alias("component"), "_old")
        new = _truncate(
            new.withColumn("_chg", F.col("component") < F.col("_old")),
            rounds,
        )
        changed = new.where(F.col("_chg")).limit(1).count()
        labels = new.select("v", "component")
        if changed == 0:
            break
    else:
        # loop exhausted max_iter with the last round still changing
        # labels: the result would silently split components — surface it
        # (round-2 review finding).
        if changed != 0:
            raise RuntimeError(
                f"dedup_components did not converge in {max_iter} rounds; "
                "raise max_iter (pointer_jump=True needs only "
                "O(log diameter) of them)"
            )
    return labels, rounds


# ---------------------------------------------------------------------------
# 6. Eval-set decontamination (cross-set n-gram containment)
# ---------------------------------------------------------------------------


def contamination_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    broadcast_eval: bool = False,
) -> DataFrame:
    """Training documents sharing ≥1 word ``shingle_k``-gram with ANY
    eval document — the decontamination test every pretraining pipeline
    runs before training (exact-substring overlap at n-gram granularity,
    the GPT-3-style rule). Emits (id, n_shared_grams) for contaminated
    TRAIN docs; dropping them is a left-anti join on the result.

    Scale shape: both sides explode to distinct grams; the eval side is
    the SMALL side by construction (an eval split is 0.1-10 % of the
    corpus), so the gram join should broadcast eval grams and the train
    corpus never shuffles — O(train grams) probe work, then one groupBy
    on the train doc id. The broadcast decision defaults to AQE's
    runtime size stats rather than a hard hint, so an eval gram set too
    big to broadcast degrades to a shuffle join instead of OOMing every
    executor (round-2 review finding); pass ``broadcast_eval=True`` to
    force the single-shuffle plan when the eval side is known-small but
    above the 10 MB AQE threshold.
    """
    tg = train.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_k)).alias("_g")
    )
    eg = eval_set.select(
        F.explode(word_shingles(text_col, shingle_k)).alias("_g")
    ).distinct()
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "_g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
    )
