"""Streaming deduplication — ``dropDuplicatesWithinWatermark``.

The streaming twin of batch ``dropDuplicates``: the first row seen per
key is emitted, later duplicates are dropped for as long as their key's
state lives, and the watermark bounds that state — the engine can
discard a key once event time has advanced past (first-seen ts +
watermark), which is what makes infinite-stream dedup feasible: state
is O(keys in the watermark horizon), not O(keys ever).

This fills the one streaming-surface gap alongside windows.py
(tumbling/session), stateful.py (applyInPandasWithState /
transformWithStateInPandas), joins.py (stream-stream interval) and
sinks.py (foreachBatch upsert): exactly-once-per-key emission.

Scale: state is per-key in the state store, partitioned by key hash —
the same shuffle a batch dropDuplicates pays, amortized over the
stream. With a watermark comfortably wider than the event-time span of
any replayed batch, the emitted KEY SET equals batch ``SELECT
DISTINCT`` (which row represents each key depends on arrival order, so
the query projects the key columns only — making the streaming result
oracle-checkable, see plans/queries_wave7.events_dedup_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "30 days",
) -> DataFrame:
    """Keep the first event per key within the watermark horizon,
    projected to the key columns (arrival order decides the surviving
    row; the key set is what's deterministic)."""
    keys = keys or ["user_id", "event_type"]
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
