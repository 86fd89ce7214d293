"""Pluggable vectorized model interface for text operators.

The heuristics in :mod:`.text` (marker-word language ID, ratio-based
quality, regex token counts) are honest, deterministic stand-ins — a
production corpus pipeline swaps in real models (fastText language ID, a
learned quality classifier, a BPE tokenizer). This module is the seam:
a :class:`TextModel` wraps any batch ``pandas.Series → pandas.Series``
function (or a lazy per-worker loader for heavy weights) and
:func:`apply_text_model` turns it into an Arrow-batched iterator-style
pandas UDF — the documented Spark pattern for model inference: weights
load ONCE per worker task, then stream over Arrow record batches, never
per row.

The operators in :mod:`.text` accept ``model=None`` and keep their
heuristic Column form by default, so the DuckDB oracle rows stay exact;
passing a model switches only that call site to the UDF path.

Scale: inference is a narrow per-row map — no shuffle. At 100 TB the
cost is model FLOPs; the Arrow boundary adds one serialization per batch
(~10-100× cheaper than row-at-a-time pickling). GPU models would hang
off the same interface via ``loader`` (per-worker device init).

Reference analogue: the reference's scalar field extractors are
row-at-a-time ``.apply`` lambdas
(/root/reference/fintick/downloader/lib.py:5-39); this is the vectorized,
executor-resident generalization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class TextModel:
    """A batch text model.

    Exactly one of ``fn`` / ``loader`` must be set:

    - ``fn``: the predict function itself, ``pd.Series[str] →
      pd.Series``; pickled to executors — right for small/pure models.
    - ``loader``: a zero-arg callable returning the predict function;
      called ONCE per worker task (lazy weight load — right for real
      models whose weights should not ride the closure, e.g.
      ``lambda: fasttext.load_model(path).predict_series``).

    ``returns`` is the Spark type of the prediction (a ``DataType``
    object, not a DDL string — string parsing needs an active session).
    """

    returns: T.DataType
    fn: Callable[[pd.Series], pd.Series] | None = None
    loader: Callable[[], Callable[[pd.Series], pd.Series]] | None = None
    name: str = "text_model"

    def __post_init__(self):
        if (self.fn is None) == (self.loader is None):
            raise ValueError("set exactly one of fn= / loader=")


def apply_text_model(model: TextModel, col: "Column | str") -> Column:
    """Column = ``model`` applied to ``col`` as an iterator-style pandas
    UDF: the loader (if any) runs once per worker task, then every Arrow
    batch streams through the resolved predict function."""
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf(model.returns)
    def _infer(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        predict = model.fn if model.fn is not None else model.loader()
        for s in batches:
            out = predict(s)
            if not isinstance(out, pd.Series):
                out = pd.Series(out, index=s.index)
            if len(out) != len(s):
                raise ValueError(
                    f"model {model.name!r} returned {len(out)} rows for a "
                    f"{len(s)}-row batch — predictions must be 1:1"
                )
            yield out

    return _infer(c)
