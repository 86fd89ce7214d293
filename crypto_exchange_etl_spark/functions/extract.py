"""Vectorized HTML→text extraction (Arrow/pandas UDF).

The reference's scalar transforms are row-at-a-time ``.apply(axis=1)``
lambdas (/root/reference/fintick/downloader/lib.py:5-39). Here the hot-path
transform — extracting text from page bytes — is a scalar ``pandas_udf``:
Arrow batches in, vectorized pandas string ops, Arrow batches out. It is a
pure function of the ``html`` bytes alone (no row context, no state), which
is what makes the output byte-identical per url across replay orders, batch
boundaries, and cluster sizes (hard-part #1, SURVEY.md §7.3).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Order matters and is fixed: the extraction must be deterministic.
_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_bytes(html: bytes | None) -> str | None:
    """Pure-Python reference implementation (oracle for the UDF tests)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized extraction: decode → strip script/style → strip tags →
    collapse whitespace. Identical semantics to :func:`extract_text_bytes`.
    """
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Attach the extracted ``text`` column; deletes (null html) yield null."""
    return df.withColumn(out_col, extract_text(F.col(html_col)))
