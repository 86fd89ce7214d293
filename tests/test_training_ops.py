"""Unit tests for the training-data-pipeline operators.

Semantics-level checks on small hand-built inputs (the cross-engine
value parity is covered separately by tests/test_queries_oracle.py).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crypto_exchange_etl_spark.functions.hashing import portable_hash64
from crypto_exchange_etl_spark.functions.multimodal import (
    decode_image,
    decoded_meta,
    fake_decode_meta,
    with_media_from_text,
)
from crypto_exchange_etl_spark.functions.text import lang_id, quality_metrics
from crypto_exchange_etl_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from crypto_exchange_etl_spark.operators.similarity import (
    ann_lsh_buckets,
    ann_topk_bucketed,
    cosine_topk,
    knn_label_vote,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near-dup
    (3, "completely different content about spark query engines at scale"),
    (4, "der hund und die katze sind gute freunde und das ist schoen"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_portable_hash64_is_md5_prefix(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(portable_hash64("s").alias("h")).collect()[0].h
    assert got == int(hashlib.md5(b"abc").hexdigest()[:15], 16)
    seeded = df.select(portable_hash64("s", 7).alias("h")).collect()[0].h
    assert seeded == int(hashlib.md5(b"7:abc").hexdigest()[:15], 16)
    assert got != seeded


def test_exact_dedup_collapses_identical_text(docs):
    groups = {r.canonical_id: r.n_copies for r in exact_dedup_groups(docs).collect()}
    assert groups[0] == 2  # docs 0 and 1 identical, canonical = min id
    kept = exact_dedup(docs)
    assert kept.count() == 4
    assert {r.doc_id for r in kept.collect()} == {0, 2, 3, 4}


def test_minhash_lsh_finds_duplicates_not_strangers(docs):
    sig = minhash_signature(docs, k=8, shingle_k=3)
    rows = {r.doc_id: [r[f"mh_{i}"] for i in range(8)] for r in sig.collect()}
    assert rows[0] == rows[1]  # identical docs → identical signatures
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig, k=8, bands=4).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_simhash_hamming_neighborhood(spark, docs):
    sig = simhash(docs, bits=16)
    vals = {r.doc_id: r.simhash for r in sig.collect()}
    assert vals[0] == vals[1]
    near = simhash_near_pairs(sig, bits=16, max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in near.collect()}
    assert got[(0, 1)] == 0
    # one-token edit stays within a small Hamming ball
    assert (0, 2) in got and got[(0, 2)] <= 3


def test_ngram_jaccard_exact_value(spark):
    # doc a: tokens t1..t5 → shingles {123,234,345}; doc b shares {234,345}
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5"), (2, "t2 t3 t4 t5 t6")], "doc_id long, text string"
    )
    rows = ngram_jaccard_pairs(df, shingle_k=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.jaccard == pytest.approx(2 / 4)  # |∩|=2, |∪|=4


def test_lsh_candidates_restrict_jaccard_join(docs):
    sig = minhash_signature(docs, k=8, shingle_k=3)
    cand = lsh_candidate_pairs(sig, k=8, bands=4)
    pairs = ngram_jaccard_pairs(docs, shingle_k=3, candidates=cand)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert (0, 1) in got
    cand_set = {(r.id_a, r.id_b) for r in cand.collect()}
    assert set(got) <= cand_set
    # candidate restriction only FILTERS — jaccard values are unchanged
    full = {(r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, shingle_k=3).collect()}
    assert got == {k: v for k, v in full.items() if k in cand_set}
    # the doc-level LeftSemi prunes UPSTREAM of the shingle self-join
    # (plus the pair-level LeftSemi after it — 2 semi joins total)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") >= 2


VECS = [
    (0, [1.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0], 0),
    (2, [0.0, 1.0, 0.0], 1),
    (3, [0.1, 0.9, 0.0], 1),
    (4, [-1.0, 0.0, 0.0], 2),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_ranks_by_angle(vecs):
    topk = cosine_topk(vecs, vecs.where(F.col("vec_id") == 0), k=4)
    ordered = [r.nid for r in topk.orderBy("rank").collect()]
    # cosines to e_x: v1≈0.994, v3≈0.110, v2=0, v4=-1
    assert ordered == [1, 3, 2, 4]
    sims = {r.nid: r.sim for r in topk.collect()}
    assert sims[1] == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5, abs=1e-6)
    assert sims[4] == pytest.approx(-1.0, abs=1e-6)


def test_ann_bucketed_groups_similar_vectors(vecs):
    buckets = {r.vec_id: r.bucket for r in ann_lsh_buckets(vecs, dim=3, n_planes=6).collect()}
    assert buckets[0] == buckets[1]  # near-identical directions share buckets
    assert buckets[2] == buckets[3]
    assert buckets[0] != buckets[4]  # antipodal vectors differ
    approx = ann_topk_bucketed(vecs, vecs.where(F.col("vec_id") == 0), dim=3, k=3, n_planes=2)
    # bucketed candidates are a subset of the brute-force ranking
    exact = cosine_topk(vecs, vecs.where(F.col("vec_id") == 0), k=4)
    assert {r.nid for r in approx.collect()} <= {r.nid for r in exact.collect()}


def test_knn_label_vote_majority(vecs):
    topk = cosine_topk(vecs, vecs.where(F.col("vec_id") <= 1), k=2)
    pred = {r.qid: r.pred_label for r in knn_label_vote(topk, vecs).collect()}
    # q0's 2-NN are {1 (label 0), 2 (label 1)} → tie → smaller label wins
    assert pred[0] == 0
    assert pred[1] == 0


def test_knn_label_vote_broadcasts_topk_side(vecs):
    """The broadcast must build on the |Q|·k topk side, never on the
    corpus-wide label map (round-2 review fix): at 10⁹ vectors the label
    map is GBs per executor."""
    topk = cosine_topk(vecs, vecs.where(F.col("vec_id") <= 1), k=2)
    plan = (
        knn_label_vote(topk, vecs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    (join_i,) = [i for i, l in enumerate(lines) if "BroadcastHashJoin" in l]
    # BuildLeft ⇒ the first (":-") child is the broadcast side; it must be
    # the BroadcastExchange over the topk projection (carries `qid`), and
    # the corpus label map (`nlabel`) must be on the streamed side.
    assert "BuildLeft" in lines[join_i], lines[join_i]
    assert "BroadcastExchange" in lines[join_i + 1], lines[join_i + 1]
    assert "qid" in lines[join_i + 2], lines[join_i + 2]
    probe = [l for l in lines[join_i + 1 :] if l.lstrip(" :+-").startswith("Project")]
    assert any("nlabel" in l and not l.lstrip().startswith(":") for l in probe), plan


def test_multimodal_meta_matches_hashlib(docs):
    media = with_media_from_text(docs)
    meta = {r.doc_id: r for r in decoded_meta(media, id_cols=("doc_id",)).collect()}
    for doc_id, text in DOCS:
        raw = text.encode("utf-8")
        n, digest, w, h = fake_decode_meta(raw)
        row = meta[doc_id]
        assert (row.n_bytes, row.digest, row.width, row.height) == (n, digest, w, h)
        assert digest == hashlib.md5(raw).hexdigest()


def _tiny_png(width: int = 3, height: int = 2) -> bytes:
    """A valid RGB PNG from the stdlib alone (zlib + struct) — no image
    library needed to BUILD the fixture, only to decode it."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_image_png_decodes_without_pil():
    """decode_image always has a REAL PNG path: PIL when installed, else
    the vendored pure-stdlib decoder (CRC-verified, scanlines
    de-filtered) — either way a golden PNG yields exact dimensions, and
    corruption raises rather than yielding plausible metadata."""
    import zlib

    from crypto_exchange_etl_spark.functions import multimodal as mm

    assert decode_image(_tiny_png(5, 4)) == (5, 4, "RGB")
    assert mm._png_decode(_tiny_png(3, 2)) == (3, 2, "RGB")

    # bit-flip inside IDAT → CRC mismatch must raise, not mis-decode
    png = bytearray(_tiny_png(5, 4))
    idat_at = bytes(png).index(b"IDAT")
    png[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError):
        mm._png_decode(bytes(png))

    # truncated pixel stream (valid chunk CRCs, short raster) must raise
    import struct

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0)
    short = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01\x02\x03" * 5))  # 1 of 4 rows
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        mm._png_decode(short)

    # non-PNG without PIL stays a declared NotImplementedError
    if mm._PIL_Image is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def test_real_image_meta_decodes_png(spark):
    from crypto_exchange_etl_spark.functions.multimodal import real_image_meta

    png = _tiny_png(7, 3)
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, media binary")
    row = real_image_meta(df).collect()[0]
    assert (row.width, row.height) == (7, 3)
    assert row.n_bytes == len(png)
    assert row.digest == hashlib.md5(png).hexdigest()


def test_lang_id_marker_words(docs):
    pred = {r.doc_id: r.pred for r in docs.select("doc_id", lang_id("text").alias("pred")).collect()}
    assert pred[0] == "en"
    assert pred[4] == "de"


def test_text_model_interface_plugs_into_operators(docs):
    """lang_id / quality_score / regex_token_count accept a pluggable
    vectorized model (the fastText/tokenizer seam): a toy TextModel
    changes predictions at that call site only, the loader= form
    initializes once per worker task, and the heuristic default is
    untouched (oracle rows keep matching)."""
    import pandas as pd
    from pyspark.sql import types as T

    from crypto_exchange_etl_spark.functions.model_api import TextModel
    from crypto_exchange_etl_spark.functions.text import (
        quality_score,
        regex_token_count,
    )

    toy_lang = TextModel(
        returns=T.StringType(),
        fn=lambda s: s.str.contains("und").map({True: "de", False: "xx"}),
        name="toy_lang",
    )
    pred = {
        r.doc_id: r.pred
        for r in docs.select(
            "doc_id", lang_id("text", model=toy_lang).alias("pred")
        ).collect()
    }
    assert pred[4] == "de" and pred[0] == "xx"

    # loader= form: weights "load" lazily on the executor, not in the driver
    toy_counter = TextModel(
        returns=T.IntegerType(),
        loader=lambda: (lambda s: s.str.split().str.len().astype("int32")),
        name="toy_tokenizer",
    )
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", regex_token_count("text", model=toy_counter).alias("n")
        ).collect()
    }
    want = {
        r.doc_id: len(r.text.split())
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want

    toy_quality = TextModel(
        returns=T.DoubleType(),
        fn=lambda s: pd.Series([0.5] * len(s), index=s.index),
        name="toy_quality",
    )
    q = docs.select(
        quality_score(None, None, None, model=toy_quality, text="text")
    ).collect()
    assert all(abs(r.quality - 0.5) < 1e-12 for r in q)

    # misconfiguration fails fast
    with pytest.raises(ValueError):
        TextModel(returns=T.StringType())
    with pytest.raises(ValueError):
        quality_score(None, None, None, model=toy_quality)


def test_quality_metrics_ranges(docs):
    m = docs.select("doc_id", *quality_metrics("text")).collect()
    for r in m:
        assert r.n_tokens > 0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0


def test_hash_sampling_reproducible_and_layout_independent(spark):
    from crypto_exchange_etl_spark.operators.sampling import (
        hash_sample,
        stratified_hash_sample,
        train_eval_split,
    )

    df = spark.range(0, 5000, 1, 8).selectExpr(
        "id as doc_id", "case when id % 3 = 0 then 'en' else 'de' end as lang"
    )
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.2, seed=1).collect()}
    # different partition layout, same sample (df.sample can't do this)
    b = {r.doc_id for r in hash_sample(df.repartition(3), "doc_id", 0.2, seed=1).collect()}
    assert a == b and 0.15 < len(a) / 5000 < 0.25
    # stratified: per-stratum rates honor the per-lang fractions
    s = stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5}, 0.05, seed=1)
    by = {r.lang: r.n for r in s.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert 0.4 < by["en"] / (5000 / 3) < 0.6
    assert by.get("de", 0) / (5000 * 2 / 3) < 0.1
    # split is a partition of the keyspace and agrees with hash_sample's hash
    sp = train_eval_split(df, "doc_id", 0.1, seed=1)
    ev = {r.doc_id for r in sp.where("split = 'eval'").collect()}
    assert ev == {r.doc_id for r in hash_sample(df, "doc_id", 0.1, seed=1).collect()}


def test_ivf_full_probe_equals_brute_force(vecs):
    from crypto_exchange_etl_spark.operators.similarity import ivf_topk

    queries = vecs.where(F.col("vec_id") < 2)
    exact = cosine_topk(vecs, queries, k=3)
    # n_probe = n_cells ⇒ every cell is searched ⇒ IVF degrades to exact
    ivf = ivf_topk(vecs, queries, n_cells=4, n_probe=4, k=3)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, exact.collect()))


def test_ivf_partial_probe_shape(vecs):
    from crypto_exchange_etl_spark.operators.similarity import ivf_topk

    got = ivf_topk(
        vecs, vecs.where(F.col("vec_id") < 2), n_cells=4, n_probe=2, k=3
    ).collect()
    assert got, "partial probe returned nothing"
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_dedup_components_chain_and_clique(spark):
    from crypto_exchange_etl_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        # 4-chain (diameter 3 ⇒ needs >1 propagation round), a triangle,
        # and an isolated edge
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.id: r.component for r in dedup_components(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_dedup_components_path_graph_log_rounds(spark):
    """Adversarial 1000-vertex path (diameter 999): pointer jumping must
    converge in ≲ ⌈log₂ d⌉ + c rounds with labels identical to plain
    propagation's fixpoint (all 1000 vertices → component 0)."""
    import math

    from crypto_exchange_etl_spark.operators.dedup import dedup_components

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels_df, rounds = dedup_components(
        pairs, max_iter=30, return_rounds=True
    )
    labels = {r.id: r.component for r in labels_df.collect()}
    assert labels == {i: 0 for i in range(n)}
    assert rounds <= math.ceil(math.log2(n - 1)) + 3, rounds


def test_dedup_components_durable_checkpoint(spark, tmpdir_path):
    """checkpoint_dir: per-round truncation uses RELIABLE df.checkpoint()
    on that filesystem (executor loss survivable — the blocks live on
    storage, not in executor memory), with labels identical to the
    localCheckpoint path and real checkpoint files on disk."""
    import os

    from crypto_exchange_etl_spark.operators.dedup import dedup_components

    # chain (multi-round) + clique + isolated edge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)]
        + [(100, 101), (101, 102), (100, 102), (200, 201)],
        "id_a long, id_b long",
    )
    base = {r.id: r.component for r in dedup_components(pairs).collect()}
    ck = os.path.join(tmpdir_path, "cc_ck")
    durable = {
        r.id: r.component
        for r in dedup_components(pairs, checkpoint_dir=ck).collect()
    }
    assert durable == base
    # reliable RDD checkpoints actually landed on the checkpoint FS
    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(ck)
        for f in fn
        if f.startswith("part-")
    ]
    assert files, "no reliable checkpoint files written"
    # amortized variant (every 3rd round) converges identically too
    every3 = {
        r.id: r.component
        for r in dedup_components(
            pairs, checkpoint_dir=ck, checkpoint_every=3
        ).collect()
    }
    assert every3 == base


def test_dedup_components_releases_caches_on_mid_cycle_convergence(
    spark, tmpdir_path
):
    """With checkpoint_every larger than the convergence round, the
    skipped rounds' persisted label frames must be released when the
    loop breaks (and the result re-anchored on a reliable checkpoint
    first): before the fix every call in a long-lived session pinned up
    to (checkpoint_every - 1) full label sets in executor storage
    forever."""
    import os

    from crypto_exchange_etl_spark.operators.dedup import dedup_components

    sc = spark.sparkContext
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(15)] + [(100, 101)],
        "id_a long, id_b long",
    )
    base = {r.id: r.component for r in dedup_components(pairs).collect()}
    # ids, not counts: the session (and the localCheckpoint baseline
    # above) holds persisted RDDs that the ContextCleaner collects
    # asynchronously — the precise contract is that no RDD persisted BY
    # THE CALL survives it, i.e. the after-set introduces no new ids
    before = set(sc._jsc.getPersistentRDDs().keys())
    ck = os.path.join(tmpdir_path, "cc_rel_ck")
    # checkpoint_every=50 >> rounds-to-converge: NO reliable label
    # checkpoint fires inside the loop, so every round lands in the
    # skip-round cache and convergence exits mid-cycle
    got = {
        r.id: r.component
        for r in dedup_components(
            pairs, checkpoint_dir=ck, checkpoint_every=50
        ).collect()
    }
    assert got == base
    after = set(sc._jsc.getPersistentRDDs().keys())
    assert after <= before, f"leaked persisted RDDs: {sorted(after - before)}"


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)
def test_ann_recall_floors(spark):
    """ANN quality, quantified: recall@5 vs brute force on the sf0.001
    embeddings. IVF probing 4/16 cells must beat its random-scan
    baseline (0.25 of the corpus ⇒ ~0.25 expected recall) — measured
    0.50; single-band SRP with 16 buckets (~0.06 baseline) — measured
    0.15. Floors sit below measurement but above baseline, so a recall
    regression (bad codebook, broken bucket join) fails before a
    correctness oracle would notice."""
    from crypto_exchange_etl_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 20)
    exact = {(r.qid, r.nid) for r in cosine_topk(emb, qs, k=5).collect()}
    ivf4 = {
        (r.qid, r.nid)
        for r in ivf_topk(emb, qs, n_cells=16, n_probe=4, k=5).collect()
    }
    srp = {
        (r.qid, r.nid)
        for r in ann_topk_bucketed(emb, qs, dim=64, k=5, n_planes=4).collect()
    }
    assert len(ivf4 & exact) / len(exact) >= 0.35
    assert len(srp & exact) / len(exact) >= 0.08
    # widening the probe must not lose recall
    ivf8 = {
        (r.qid, r.nid)
        for r in ivf_topk(emb, qs, n_cells=16, n_probe=8, k=5).collect()
    }
    assert len(ivf8 & exact) >= len(ivf4 & exact)
    # Hamming-1 multi-probe at EQUAL n_planes: every single-probe result
    # survives (the probe list contains the exact bucket) and recall
    # strictly improves on this corpus (neighbours lost to one flipped
    # sign bit are recovered)
    srp_mp = {
        (r.qid, r.nid)
        for r in ann_topk_bucketed(
            emb, qs, dim=64, k=5, n_planes=4, multiprobe=True
        ).collect()
    }
    assert len(srp_mp & exact) > len(srp & exact)


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)
def test_kmeans_codebook_lifts_recall(spark):
    """Lloyd's-trained codebook must not lose recall vs the hash-sampled
    one at the SAME (n_cells, n_probe) budget — the whole point of
    training — and must be bit-deterministic run-to-run (integer-sum
    means, fixed init, fixed iteration count)."""
    from crypto_exchange_etl_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 20)
    exact = {(r.qid, r.nid) for r in cosine_topk(emb, qs, k=5).collect()}
    sampled = {
        (r.qid, r.nid)
        for r in ivf_topk(emb, qs, n_cells=16, n_probe=4, k=5).collect()
    }
    km = kmeans_centroids(emb, n_cells=16, n_iter=4)
    trained = {
        (r.qid, r.nid)
        for r in ivf_topk(
            emb, qs, n_cells=16, n_probe=4, k=5, centroids=km
        ).collect()
    }
    assert len(trained & exact) >= len(sampled & exact)

    km2 = kmeans_centroids(emb, n_cells=16, n_iter=4)
    a = sorted((r.cell, tuple(r.centroid)) for r in km.collect())
    b = sorted((r.cell, tuple(r.centroid)) for r in km2.collect())
    assert a == b


def test_doc_fingerprint_oracle_parity(spark):
    """doc_fingerprint left the driver registry in round 3 (it is 1-perm
    MinHash — consolidated to stay inside the driver's entry budget); the
    cross-engine value parity stays pinned here."""
    import os
    from crypto_exchange_etl_spark.queries import SQL_FINGERPRINT, q_doc_fingerprint
    from oracle_harness import compare, duck_connection

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    con = duck_connection(sf)
    try:
        errs = compare(q_doc_fingerprint(spark, sf), con, SQL_FINGERPRINT, "doc_fingerprint")
        assert not errs, "\n".join(errs)
    finally:
        con.close()


def test_dedup_components_checkpoint_hygiene(spark, tmpdir_path):
    """The durable path must not leak session state or disk: the
    session-global checkpoint dir is restored afterwards (a job that
    checkpoints elsewhere is not silently redirected), and superseded
    label-round checkpoints are swept as soon as the next one lands —
    only the edge frame's checkpoint + the newest labels checkpoint
    remain (Spark itself never deletes reliable checkpoints)."""
    import os

    from crypto_exchange_etl_spark.operators.dedup import dedup_components

    sc = spark.sparkContext
    other = os.path.join(tmpdir_path, "other_ck")
    sc.setCheckpointDir(other)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    ck = os.path.join(tmpdir_path, "cc_ck")
    out = dedup_components(pairs, checkpoint_dir=ck)
    assert out.count() == 64  # still readable after the sweep
    got = sc._jsc.sc().getCheckpointDir()
    assert got.isDefined() and "other_ck" in got.get()
    # a 63-chain runs multiple pointer-jump rounds; unswept there would
    # be one rdd-* dir per round + edges. Swept: exactly 2 remain.
    rdd_dirs = [
        d for dp, dn, _fn in os.walk(ck) for d in dn if d.startswith("rdd-")
    ]
    assert len(rdd_dirs) == 2, rdd_dirs
