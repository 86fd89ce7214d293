"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Why this exists: the Python Data Source API plans partitions in a plain
Python process with NO SparkSession (see ``cdf_source``), and the sink's
executor tasks receive Arrow batches outside any Spark expression
context. Both need the table's bucket function — ``pmod(xxhash64(key),
n_buckets)`` (``LakeTable._bucket``) — and the bloom probe hashes
(``LakeTable._bloom_hashes``) to agree BIT-FOR-BIT with what the JVM
merge path wrote, or pruning would silently drop live files.

Spark's ``xxhash64`` is the public XXH64 algorithm (seed 42) over the
value's byte representation: UTF-8 bytes for strings, raw bytes for
binary, and a dedicated 8-byte path for integral types (int/long both
hash as a single 64-bit word — Spark widens). Multi-argument
``xxhash64(a, b)`` chains: the hash of ``a`` becomes the seed for ``b``.
Parity with the JVM implementation is pinned by tests
(tests/test_lake_source_sink.py) over random unicode/binary/integer
inputs, so any drift fails loudly rather than mispruning.

This is a metadata/planning-path helper (O(filters) values per query, or
O(rows) only in the convenience sink) — the hot merge path keeps using
the JVM expression.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` → unsigned 64-bit int.

    NOTE (Spark parity): Spark's ``XXH64.hashUnsafeBytes`` consumes the
    8-byte stripes, then any remaining 4-byte word, then trailing bytes
    ONE AT A TIME via the 1-byte round — which is exactly the reference
    XXH64 layout, so this is the standard algorithm verbatim.
    """
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        lim = n - 32
        while i <= lim:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _hash_long(value: int, seed: int) -> int:
    """Spark's ``XXH64.hashLong``: the dedicated 8-byte path (NOT the
    byte-stream path — same result as hashing the 8 LE bytes)."""
    seed &= _M
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, value & _M)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def spark_xxhash64(value, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(lit(value))`` as a SIGNED 64-bit int (Spark returns
    LongType). str → UTF-8 bytes; bytes → raw; bool/int → 64-bit word
    (Spark widens every integral type to long before hashing).
    Chain multi-arg hashes by passing the previous result as ``seed``."""
    if isinstance(value, str):
        u = xxh64(value.encode("utf-8"), seed)
    elif isinstance(value, (bytes, bytearray)):
        u = xxh64(bytes(value), seed)
    elif isinstance(value, bool):
        u = _hash_long(int(value), seed)
    elif isinstance(value, int):
        u = _hash_long(value, seed)
    else:
        raise TypeError(f"unsupported type for spark_xxhash64: {type(value)!r}")
    return u - (1 << 64) if u >= (1 << 63) else u


def bucket_of(value, n_buckets: int) -> int:
    """``pmod(xxhash64(value), n_buckets)`` — LakeTable._bucket's twin
    (Python's ``%`` on a signed int IS pmod for positive modulus)."""
    return spark_xxhash64(value) % n_buckets
