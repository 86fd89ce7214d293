"""Multimodal (image/audio/video) column plumbing.

Media are **opaque ``binary`` columns + typed metadata structs**, exactly
like the engine's ``html binary`` pages column (model.py PAGES_SCHEMA).
The Spark-side plumbing — schemas, Arrow batch shapes, ``mapInPandas``
iterator signatures, partition sizing — is real and tested; the actual
codec calls are stubbed because no image/audio library ships in this
container:

- ``decode_image`` raises ``NotImplementedError`` (clearly marked stub);
- ``fake_decode_meta`` is the deterministic stand-in used by tests and
  the driver oracle: byte length, md5 digest, and a synthetic
  width/height derived from the digest — pure functions of the bytes, so
  results are replay-stable like every other operator here.

Scale design: ``mapInPandas`` (not a scalar UDF) because media decode is
batch-oriented — one Arrow batch in, one out, amortizing codec setup.
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for
fat binary rows; at 100 TB you'd also set
``spark.sql.files.maxPartitionBytes`` down so a task holds few hundred MB
of media. Frame-sampling/resize would be extra columns out of the same
iterator — shape identical to :func:`decoded_meta`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata for a decoded media object.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


try:  # optional codec — this container ships no image library
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover - absent in the build container
    _PIL_Image = None

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type → PIL-compatible mode string (for 8-bit depth).
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_decode(data: bytes) -> tuple[int, int, str]:
    """Pure-stdlib PNG decode → ``(width, height, mode)``.

    A real decode, not a header sniff: chunk CRCs are verified, the IDAT
    stream is inflated (zlib) and every scanline de-filtered (filter
    types 0-4, per the PNG spec §9), so a truncated or corrupt payload
    raises instead of yielding plausible dimensions. Non-interlaced
    PNGs at bit depth 8/16 only — the shapes web crawls overwhelmingly
    carry; everything else defers to PIL."""
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat = 8, []
    width = height = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if interlace != 0 or depth not in (8, 16) or ctype not in _PNG_MODES:
        raise NotImplementedError(
            f"PNG variant (depth={depth} color={ctype} interlace={interlace}) "
            "needs a full codec (install pillow)"
        )
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, _PNG_CHANNELS[ctype] * depth // 8)
    stride = (width * _PNG_CHANNELS[ctype] * depth + 7) // 8
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data truncated")
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype, line = raw[off], bytearray(raw[off + 1 : off + 1 + stride])
        if ftype > 4:
            raise ValueError(f"PNG scanline filter {ftype} invalid")
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b, c = prev[i], prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        prev = line
    mode = _PNG_MODES[ctype]
    return width, height, (f"{mode};16" if depth == 16 else mode)


def decode_image(data: bytes) -> tuple[int, int, str]:
    """Real image decode → ``(width, height, mode)``. PIL when installed
    (every format); otherwise the vendored pure-stdlib PNG decoder
    (:func:`_png_decode` — CRC-verified, fully de-filtered), so the
    operator has a REAL exercised decode path even in codec-less
    containers. Non-PNG formats without PIL raise
    ``NotImplementedError`` (declared gap; installing pillow widens the
    column with no code change)."""
    if _PIL_Image is not None:
        import io

        with _PIL_Image.open(io.BytesIO(data)) as im:
            return im.width, im.height, im.mode
    if data[:8] == _PNG_MAGIC:
        return _png_decode(data)
    raise NotImplementedError(
        "no codec for this format in this environment "
        "(install pillow to decode non-PNG images)"
    )


def real_image_meta(
    df: DataFrame, binary_col: str = "media", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """:func:`decoded_meta`'s shape with the REAL codec: id_cols +
    (n_bytes, digest, width, height) where width/height come from
    :func:`decode_image` (PIL). Same mapInPandas batch contract; raises
    at task time when no codec is installed."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + list(MEDIA_META_SCHEMA.fields)
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[list(id_cols)].copy()
            out["n_bytes"] = pdf[binary_col].map(len).astype("int64")
            out["digest"] = pdf[binary_col].map(
                lambda b: hashlib.md5(b).hexdigest()
            )
            dims = pdf[binary_col].map(decode_image)
            out["width"] = dims.map(lambda d: d[0]).astype("int32")
            out["height"] = dims.map(lambda d: d[1]).astype("int32")
            yield out

    return df.select(*id_cols, binary_col).mapInPandas(_decode, out_schema)


def fake_decode_meta(data: bytes) -> tuple[int, str, int, int]:
    """Deterministic decode stand-in: (n_bytes, md5_hex, width, height).

    width/height are carved from the digest so they exercise the typed-
    metadata path with stable values.
    """
    digest = hashlib.md5(data).hexdigest()
    return len(data), digest, int(digest[:4], 16) % 4096, int(digest[4:8], 16) % 4096


def decoded_meta(
    df: DataFrame, binary_col: str = "media", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Attach decoded metadata columns via ``mapInPandas``.

    Output: id_cols + n_bytes, digest, width, height. One Arrow batch per
    iteration; the binary column is dropped on output so only slim
    metadata shuffles downstream.
    """
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + list(MEDIA_META_SCHEMA.fields)
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[binary_col].map(fake_decode_meta)
            out = pdf[list(id_cols)].copy()
            out["n_bytes"] = metas.map(lambda m: m[0]).astype("int64")
            out["digest"] = metas.map(lambda m: m[1])
            out["width"] = metas.map(lambda m: m[2]).astype("int32")
            out["height"] = metas.map(lambda m: m[3]).astype("int32")
            yield out

    return df.select(*id_cols, binary_col).mapInPandas(_decode, out_schema)


def with_media_from_text(df: DataFrame, text_col: str = "text", out_col: str = "media") -> DataFrame:
    """Test/bench helper: synthesize the opaque binary column from text
    (utf-8 encode) — gives every row a realistic ``binary`` payload
    without external data."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))
