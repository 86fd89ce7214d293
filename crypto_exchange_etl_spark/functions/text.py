"""Text-analysis functions for a training-data pipeline, as Column builders.

Everything here is a composition of Catalyst built-ins (split/filter/
aggregate/regexp) — JVM-side, whole-stage-codegen'd, no Python in the hot
path. Each builder has a one-line SQL mirror used by the DuckDB oracle in
``queries.py``, so semantics are pinned by cross-engine tests, not prose.

These generalize the reference's scalar field extractors
(/root/reference/fintick/downloader/lib.py:5-39 — row-at-a-time ``.apply``
lambdas) to content analysis over documents: language ID, quality scoring,
token counting, rolling fingerprints (SURVEY.md §2.7 + the training-data
extension ops).

Scale note: all of these are narrow (per-row) transformations — no
shuffle, no state. At 100 TB they run map-side inside the scan stage and
are bounded by parquet decode + codegen throughput.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

#: BPE-ish token pattern: word = letter-run or digit-run, else one symbol
#: char. Simple char classes only → identical RE2/Java regex semantics.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, lowercased. ``split`` on single space matches the
    corpus format; empty strings filtered for robustness on ragged input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), " "), lambda t: t != "")


def n_tokens(col: Column | str) -> Column:
    return F.size(tokens(col))


def regex_token_count(col: Column | str, model=None) -> Column:
    """BPE-ish token count via ``regexp_extract_all`` (operator analogue of
    a tokenizer's pre-segmentation pass). Pass ``model=`` (a
    :class:`~.model_api.TextModel` returning ints — e.g. a real BPE
    tokenizer's encoded length) to swap the regex heuristic for
    vectorized model inference; the default stays pure-Catalyst and
    oracle-exact."""
    if model is not None:
        from .model_api import apply_text_model

        return apply_text_model(model, col)
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0)))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

#: Small function-word list used for both quality scoring and language ID.
#: Deterministic, engine-neutral; per-language marker sets below.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # Order matters for tie-breaks: first listed wins via greatest(struct).
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de", "shi", "zai", "le", "he"),
}


def _in_list(vals: tuple[str, ...]):
    lits = [F.lit(v) for v in vals]
    return lambda t: F.array_contains(F.array(*lits), t)


def stopword_count(col: Column | str, words: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(col), _in_list(words)))


def quality_metrics(col: Column | str) -> list[Column]:
    """The quality-scoring expression set: token count, mean token length,
    stopword ratio, non-alnum ratio, uppercase ratio. Ratios are exact
    int/int divisions cast to double → bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    n_char = F.length(c)
    # length minus stripped-class length == count of chars in the class
    n_alnum_sp = F.length(F.regexp_replace(c, "[^A-Za-z0-9 ]", ""))
    n_upper = n_char - F.length(F.regexp_replace(c, "[A-Z]", ""))
    n_stop = F.size(F.filter(toks, _in_list(STOPWORDS)))
    return [
        n_tok.cast("long").alias("n_tokens"),
        (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / n_tok
        ).alias("mean_token_len"),
        (n_stop / n_tok).alias("stopword_ratio"),
        ((n_char - n_alnum_sp) / n_char).alias("punct_ratio"),
        (n_upper / n_char).alias("upper_ratio"),
    ]


def quality_score(
    n_tok: Column, stop_ratio: Column, punct_ratio: Column, model=None, text=None
) -> Column:
    """Composite heuristic score in [0,1]: enough tokens, natural stopword
    density, low symbol noise. Weights are fixed constants (documented
    here, mirrored in the oracle SQL). Pass ``model=`` (a
    :class:`~.model_api.TextModel` returning doubles, e.g. a learned
    quality classifier) together with ``text=`` (the raw text column the
    model scores) to replace the heuristic with vectorized inference."""
    if model is not None:
        if text is None:
            raise ValueError("quality_score(model=...) needs text= (raw column)")
        from .model_api import apply_text_model

        return apply_text_model(model, text).alias("quality")
    len_ok = F.when(n_tok >= 20, F.lit(1.0)).otherwise(n_tok / F.lit(20.0))
    stop_ok = F.least(stop_ratio * 4, F.lit(1.0))
    punct_ok = F.greatest(F.lit(1.0) - punct_ratio * 4, F.lit(0.0))
    return (len_ok * 0.4 + stop_ok * 0.4 + punct_ok * 0.2).alias("quality")


# ---------------------------------------------------------------------------
# Language identification (n-gram/marker heuristic)
# ---------------------------------------------------------------------------


def lang_id(col: Column | str, model=None) -> Column:
    """Predicted language = argmax over per-language marker-word hit
    counts; ties break toward the earlier entry in ``LANG_MARKERS``.

    Expressed as a first-match CASE chain ("first language whose hit count
    is ≥ every later language's count") — trivially mirrorable in the
    DuckDB oracle, no struct-ordering semantics involved.

    Pass ``model=`` (a :class:`~.model_api.TextModel` returning strings —
    e.g. fastText lid.176 behind a per-worker ``loader``) to swap the
    marker heuristic for vectorized model inference; the default stays
    pure-Catalyst and oracle-exact.
    """
    if model is not None:
        from .model_api import apply_text_model

        return apply_text_model(model, col)
    toks = tokens(col)
    langs = list(LANG_MARKERS)
    hits = {
        lang: F.size(F.filter(toks, _in_list(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    expr = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        cond = None
        for other in langs[i + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# Shingles & fingerprints
# ---------------------------------------------------------------------------


def word_ngrams(col: Column | str, k: int = 2) -> Column:
    """NON-distinct, order-preserving word k-grams — the repetition
    counterpart of :func:`word_shingles` (which dedups for
    set-similarity). Docs shorter than k words produce a single
    whole-doc gram (so every doc has ≥1 gram).

    Built from ``sequence`` + ``transform`` + ``slice`` — pure Catalyst
    array ops.
    """
    toks = tokens(col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, k), " "))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles as ``' '``-joined strings
    (:func:`word_ngrams` + dedup — the set-similarity form)."""
    return F.array_distinct(word_ngrams(col, k))


def doc_fingerprint(col: Column | str, k: int = 3, seed: int = 0) -> Column:
    """Rolling-hash document fingerprint = min portable hash over word
    k-gram shingles (a 1-permutation MinHash; content-defined identity
    that survives small edits at the doc tail)."""
    from .hashing import portable_hash64

    return F.array_min(
        F.transform(word_shingles(col, k), lambda s: portable_hash64(s, seed))
    )


# ---------------------------------------------------------------------------
# Repetition metrics (the one DataFrame-level op here: needs a per-doc
# group, not just a per-row expression)
# ---------------------------------------------------------------------------


def repetition_metrics(
    df: "DataFrame",  # noqa: F821 - imported lazily to keep module Column-only
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
):
    """Gopher-style repetition signals per document: word-``k``-gram
    multiplicities.

    - ``n_kgrams`` / ``distinct_kgrams`` — total vs distinct gram count;
    - ``dup_kgram_frac`` — fraction of gram occurrences that repeat an
      earlier one (1 − distinct/total): boilerplate / template pages
      score high;
    - ``top_kgram_frac`` — share of the single most frequent gram:
      keyword-stuffing / degenerate-generation detector.

    Deliberately NOT an in-row higher-order-function fold (Spark
    interprets array lambdas per element — measured 10-30× slower than
    codegen): explode → two hash aggregates, both map-side combinable,
    so shuffle volume is O(distinct (doc, gram)) then O(docs). At 100 TB
    this is the same shape as the MinHash signature pass and scales the
    same way.
    """
    g = df.select(F.col(id_col), F.explode(word_ngrams(text_col, k)).alias("_g"))
    per = g.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    return per.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_kgrams"),
        F.count(F.lit(1)).cast("long").alias("distinct_kgrams"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("_c")).alias("dup_kgram_frac"),
        (F.max("_c") / F.sum("_c")).alias("top_kgram_frac"),
    )
