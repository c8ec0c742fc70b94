"""Time-series operators over the events table shape (engine extension).

``resample_gapfill`` — the canonical dashboard/training-feature transform:
bucket events into fixed windows, then LEFT-join a dense window×key grid
so silent periods appear as explicit zero rows. The grid is generated
with sequence()+explode — no driver loop, no collect; bounds come from
one tiny aggregate. At scale the grid is |windows| x |keys| rows (small),
broadcast onto the aggregated (already reduced) counts, never onto raw
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_gapfill(
    events: DataFrame,
    window_sec: int = 300,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """(window_start, key, n_events) over a DENSE window grid — windows
    with no events emit n_events = 0 for every key."""
    w_start = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / window_sec).cast("long")
        * window_sec
    )
    counts = (
        events.select(w_start.alias("ws"), F.col(key_col).alias("k"))
        .groupBy("ws", "k")
        .agg(F.count("*").alias("n_events"))
    )
    bounds = events.agg(
        F.min(w_start).alias("lo"), F.max(w_start).alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo"), F.col("hi"), F.expr(f"interval {window_sec} seconds")
            )
        ).alias("ws")
    )
    keys = events.select(F.col(key_col).alias("k")).distinct()
    dense = grid.crossJoin(keys)
    return (
        dense.join(counts, ["ws", "k"], "left")
        .select(
            F.col("ws").alias("window_start"),
            F.col("k").alias(key_col),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        )
    )
