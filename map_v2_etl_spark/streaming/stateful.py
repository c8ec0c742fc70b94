"""Custom stateful streaming operator (SURVEY.md §2.10 extension surface).

``running_user_totals`` keeps per-user running (event count, value sum)
state across micro-batches with ``applyInPandasWithState`` — the pattern
for any custom accumulator Structured Streaming's built-in aggregations
can't express (per-key model state, decaying counters, dedup windows).

State is one tiny tuple per user — bounded, partitioned by the grouping
key, checkpointed by the engine. Arrow batches move the data; Python sees
per-key pandas frames, never rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def _canonical_fold(pdfs, n: int, total: float) -> tuple[int, float]:
    """CANONICAL in-batch accumulation, the ONE copy shared by the
    applyInPandasWithState operator and its transformWithStateInPandas
    twin (a drifting second copy would break their tested equivalence):
    concatenate ALL Arrow chunks of the group first (a large group
    arrives as several pdfs split at arbitrary maxRecordsPerBatch
    boundaries), then fold in value-sorted order — not pandas'
    arbitrary-arrival pairwise sum. Shuffle arrival order and chunk
    boundaries inside a group are both nondeterministic, so a float
    result must not depend on either: the single whole-batch sorted
    fold makes each batch's total a pure function of the batch's value
    multiset (ties of equal values are interchangeable under a
    sequential fold), which is what lets a single-batch replay
    value-hash against a SQL oracle. Across MULTIPLE batches totals
    still depend on batch composition — inherent to running state."""
    chunks = list(pdfs)
    if chunks:
        batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        n += len(batch)
        for v in batch["value"].sort_values(kind="mergesort"):
            total += float(v)
    return n, total


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    n, total = _canonical_fold(pdfs, n, total)
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) emitted each micro-batch. Works on a
    streaming DataFrame; the latest row per user is the current state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas twin: same running totals on the
# successor API (typed state handles, timers, multiple state variables) —
# the forward path for custom stateful operators; applyInPandasWithState
# above remains the stable-API twin.
# --------------------------------------------------------------------------

try:  # Spark >= 4.0, and the state-server protocol needs protobuf on
    # the Python workers — gate on both so environments without the
    # optional dependency fall back to applyInPandasWithState above
    import google.protobuf.descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark / no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


class _RunningTotals(StatefulProcessor):
    """ValueState(n, total) per user; emits the running pair per batch.

    The handle owns typed, checkpointed state variables — at scale each
    key's state is one fixed-size tuple co-partitioned with its shuffle
    partition, exactly like the applyInPandasWithState version, but the
    API also offers ListState/MapState and event/processing-time timers
    for eviction (the 100 TB state-hygiene story)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._state.get() if self._state.exists() else (0, 0.0)
        n, total = _canonical_fold(rows, n, total)
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of running_user_totals."""
    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError("requires Spark >= 4.0")
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RunningTotals(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
