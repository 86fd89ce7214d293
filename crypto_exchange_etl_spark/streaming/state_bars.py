"""Data-driven bars as a NATIVE Structured Streaming stateful operator.

``streaming/incremental_bars.py`` carries the bar kernels' cache through
an external versioned manifest (the reference's Firestore-cache shape,
/root/reference/fintick/aggregators/base.py:255-271). This module is the
fully Spark-native alternative: the same sequential kernels run inside
the engine's arbitrary-stateful-streaming API, with the per-symbol carry
cache held in the streaming state store. That buys, for free from the
engine:

- exactly-once state: the state store commits atomically with the batch
  inside the streaming checkpoint — no sidecar rows, no manifest
  discipline; a fresh query on the same checkpoint resumes mid-stream;
- horizontal scale: state is sharded with the groupBy partitioning
  across executors (symbols × partitions), nothing driver-side.

Two implementations, same kernels, same JSON cache serialization (so
semantics are pinned by the same split-vs-whole tests):

- :func:`stateful_bars` — ``applyInPandasWithState`` + ``GroupState``
  (Arrow-native state transport; works on the default HDFS-backed state
  store). The production path in this container.
- :func:`stateful_bars_tws` — ``transformWithStateInPandas`` (Spark
  4.x ``StatefulProcessor`` + RocksDB ``ValueState``), the successor
  API with timers/TTL/multiple state variables and offline state
  introspection via ``spark.read.format("statestore")``. Its Python
  state server requires ``google.protobuf``, which this container lacks
  — the builder raises a clear error at call time if protobuf is
  missing, and its test import-skips. The code path is real and the
  state layout identical, so enabling it is an environment change, not
  a code change.

Trade-off vs the manifest path: bars become *sink* rows (append mode) —
there is no single manifest that atomically pairs "bars written" with
"state carried" OUTSIDE the checkpoint. For a lake-table sink that needs
its own idempotence (the IncrementalBars commit scope), the manifest
path remains right; for a pure streaming topology this one is simpler.

The kernels sort within each micro-batch (`_prep`); ACROSS batches the
source must deliver per-symbol time order (file source with
``maxFilesPerTrigger`` over time-ordered files, or a partitioned log
keyed by symbol) — same contract as IncrementalBars and the reference's
daily cron order.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..operators.bars import (
    RENKO_BAR_SCHEMA,
    THRESH_BAR_SCHEMA,
    cache_from_json,
    cache_to_json,
    renko_bars_pandas,
    thresh_bars_pandas,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState
    from pyspark.sql.streaming.stateful_processor import TimerValues

#: RocksDB provider required by transformWithState; the default
#: HDFS-backed store supports only applyInPandasWithState.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

#: GroupState layout: the kernel carry cache as one JSON string — the
#: exact serialization the manifest path persists.
STATE_SCHEMA = T.StructType([T.StructField("cache_json", T.StringType(), True)])


def _run_kernel(
    pdf: pd.DataFrame,
    cache: dict[str, Any] | None,
    kind: str,
    thresh_attr: str,
    thresh_value: float,
    box_size: float,
    top_n: int,
    era: str | None,
) -> tuple[list[dict[str, Any]], dict[str, Any]]:
    if kind == "thresh":
        return thresh_bars_pandas(
            pdf, thresh_attr, thresh_value, top_n=top_n, cache=cache, era=era
        )
    return renko_bars_pandas(pdf, box_size, top_n=top_n, cache=cache)


def _bars_pdf(
    bars: list[dict[str, Any]], symbol: Any, fields: list[str], out_cols: list[str]
) -> pd.DataFrame:
    rows = [{**{k: b.get(k) for k in fields}, "symbol": symbol} for b in bars]
    return pd.DataFrame(rows, columns=out_cols)


# ---------------------------------------------------------------------------
# applyInPandasWithState (GroupState) — the default path
# ---------------------------------------------------------------------------



def _validate_params(kind: str, thresh_value: float, box_size: float) -> None:
    """Fail at plan/construction time, not inside a streaming task: the
    thresh kernel raises on a non-positive threshold (formerly a hang)
    and renko divides by box_size."""
    if kind not in ("thresh", "renko"):
        raise ValueError(f"kind must be thresh|renko, got {kind!r}")
    if kind == "thresh" and not float(thresh_value) > 0:
        raise ValueError(
            f"kind='thresh' requires thresh_value > 0, got {thresh_value!r}"
        )
    if kind == "renko" and not float(box_size) > 0:
        raise ValueError(f"kind='renko' requires box_size > 0, got {box_size!r}")


def stateful_bars(
    ticks: DataFrame,
    kind: str = "thresh",
    *,
    thresh_attr: str = "volume",
    thresh_value: float = 0.0,
    box_size: float = 0.0,
    top_n: int = 0,
    era: str | None = None,
) -> DataFrame:
    """Streaming ``ticks`` → appended completed bars; carry cache in
    ``GroupState`` (one JSON string per symbol)."""
    _validate_params(kind, thresh_value, box_size)
    schema = THRESH_BAR_SCHEMA if kind == "thresh" else RENKO_BAR_SCHEMA
    fields = [f.name for f in schema.fields if f.name != "symbol"]
    out_cols = [f.name for f in schema.fields]

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: "GroupState"
    ) -> Iterable[pd.DataFrame]:
        parts = list(pdfs)
        pdf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
        cache = cache_from_json(state.get[0]) if state.exists else None
        bars, cache2 = _run_kernel(
            pdf, cache, kind, thresh_attr, thresh_value, box_size, top_n, era
        )
        state.update((cache_to_json(cache2),))
        if bars:
            yield _bars_pdf(bars, key[0], fields, out_cols)

    return ticks.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (StatefulProcessor) — the Spark 4.x successor
# ---------------------------------------------------------------------------

try:  # the tws Python state server speaks protobuf to the JVM
    import google.protobuf  # noqa: F401

    HAVE_TWS_RUNTIME = True
except ImportError:  # pragma: no cover - container lacks protobuf
    HAVE_TWS_RUNTIME = False

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


class BarStateProcessor(StatefulProcessor):
    """Per-symbol bar builder on the ``StatefulProcessor`` protocol:
    ``ValueState`` holds the same JSON carry cache."""

    def __init__(
        self,
        kind: str = "thresh",
        *,
        thresh_attr: str = "volume",
        thresh_value: float = 0.0,
        box_size: float = 0.0,
        top_n: int = 0,
        era: str | None = None,
    ):
        _validate_params(kind, thresh_value, box_size)
        self.kind = kind
        self.thresh_attr = thresh_attr
        self.thresh_value = float(thresh_value)
        self.box_size = float(box_size)
        self.top_n = int(top_n)
        self.era = era
        base = THRESH_BAR_SCHEMA if kind == "thresh" else RENKO_BAR_SCHEMA
        self._fields = [f.name for f in base.fields if f.name != "symbol"]
        self._out_cols = [f.name for f in base.fields]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cache = handle.getValueState("barcache", "cache_json string")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        symbol = key[0] if isinstance(key, tuple) else key
        parts = [p for p in rows]
        pdf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
        prev = self._cache.get()
        cache = cache_from_json(prev[0]) if prev is not None else None
        bars, cache2 = _run_kernel(
            pdf, cache, self.kind, self.thresh_attr, self.thresh_value,
            self.box_size, self.top_n, self.era,
        )
        self._cache.update((cache_to_json(cache2),))
        if bars:
            yield _bars_pdf(bars, symbol, self._fields, self._out_cols)

    def close(self) -> None:
        pass


def stateful_bars_tws(
    ticks: DataFrame,
    kind: str = "thresh",
    *,
    thresh_attr: str = "volume",
    thresh_value: float = 0.0,
    box_size: float = 0.0,
    top_n: int = 0,
    era: str | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` form. Requires ``google.protobuf``
    in the Python environment and the RocksDB state store provider
    (:data:`ROCKSDB_PROVIDER`) on the session."""
    if not HAVE_TWS_RUNTIME:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf (the Python "
            "state server's wire protocol), which this environment lacks; "
            "use stateful_bars (applyInPandasWithState) instead"
        )
    proc = BarStateProcessor(
        kind,
        thresh_attr=thresh_attr,
        thresh_value=thresh_value,
        box_size=box_size,
        top_n=top_n,
        era=era,
    )
    schema = THRESH_BAR_SCHEMA if kind == "thresh" else RENKO_BAR_SCHEMA
    return ticks.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=schema,
        outputMode="Append",
        timeMode="None",
    )
