"""Portable 60-bit hashing — the foundation for dedup/fingerprint operators.

Every hash-based operator in this engine (exact dedup, MinHash, SimHash,
LSH banding, document fingerprints) needs a hash function that is

1. **deterministic across engines** — the DuckDB correctness oracle must be
   able to reproduce it in plain SQL, and
2. **JVM-side** — computed by Catalyst built-ins inside whole-stage
   codegen, never by a Python UDF (the input_hint's "no per-row Python").

``portable_hash64`` takes the first 15 hex digits of ``md5`` (60 bits,
always < 2^60 so it fits a signed BIGINT with no sign ambiguity) and
parses them as an integer:

- Spark:  ``conv(substr(md5(x), 1, 15), 16, 10)  :: bigint``
- DuckDB: ``cast('0x' || substr(md5(x), 1, 15) as bigint)``

Seeding is by prefixing ``"<seed>:"`` to the input — one md5 kernel, any
number of independent hash families (the k MinHash permutations).

Why not ``xxhash64``/``hash`` built-ins: Spark's Murmur3/xxHash seeds and
DuckDB's ``hash()`` are different algorithms — they could never agree.
md5 is the one hash both engines (and essentially every engine) share.

Reference analogue: the reference dedups on exchange-assigned ``uid``
strings (/root/reference/fintick/controllers/base.py:88-99) and never
hashes; content-addressed identity is what replaces it when keys must be
derived from the payload itself (web pages, documents).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Number of leading md5 hex digits used (60 bits, sign-safe in int64).
HEX_DIGITS = 15


def portable_hash64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit non-negative integer hash of a string column (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-SQL mirror of :func:`portable_hash64` (for oracles)."""
    if seed is not None:
        expr = f"concat('{seed}:', {expr})"
    return f"cast(concat('0x', substr(md5({expr}), 1, {HEX_DIGITS})) as bigint)"


def portable_hash64_pair(col: Column | str) -> tuple[Column, Column]:
    """TWO independent 60-bit hashes from ONE md5: hex digits 1-15 and
    17-31 of the same digest. Kirsch-Mitzenmacher double hashing then
    derives any number of hash-family members as ``(h1 + i·h2) mod 2^60``
    — one md5 kernel per input instead of k (the md5 IS the cost in
    MinHash at corpus scale). Safe in int64 for i ≤ 8:
    max(h1 + 7·h2) = 8·(2^60−1) < 2^63−1."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.md5(c)
    h1 = F.conv(F.substring(m, 1, HEX_DIGITS), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(m, 17, HEX_DIGITS), 16, 10).cast("bigint")
    return h1, h2


def portable_hash64_pair_sql(expr: str) -> tuple[str, str]:
    """DuckDB mirror of :func:`portable_hash64_pair`."""
    return (
        f"cast(concat('0x', substr(md5({expr}), 1, {HEX_DIGITS})) as bigint)",
        f"cast(concat('0x', substr(md5({expr}), 17, {HEX_DIGITS})) as bigint)",
    )
