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


def decode_image(data: bytes) -> tuple[int, int, str]:
    """Real image decode → ``(width, height, mode)`` when PIL is
    installed; otherwise raises ``NotImplementedError`` (declared stub —
    no image codec ships in this container). The Spark plumbing around
    it (:func:`decoded_meta`, :func:`real_image_meta`) is real either
    way; installing pillow productionizes the column with no code
    change."""
    if _PIL_Image is None:
        raise NotImplementedError(
            "image codecs not available in this environment "
            "(install pillow to enable decode_image)"
        )
    import io

    with _PIL_Image.open(io.BytesIO(data)) as im:
        return im.width, im.height, im.mode


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
