"""Shared event-time normalization for streaming readers.

Parquet event time arrives in whichever physical type the writer chose:
nanos-as-LONG (this driver's generator) or TIMESTAMP_NTZ
(isAdjustedToUTC=false). ``withWatermark`` requires TIMESTAMP (LTZ), so
every stream stager normalizes through this ONE helper:

* LongType nanos → ``timestamp_micros(ts DIV 1000)`` — integer division;
  a double `/` drifts by 1 microsecond at nanosecond epoch magnitudes
  (see sources/registry.load_table).
* TIMESTAMP_NTZ → instant via epoch arithmetic: the naive wall-clock is
  interpreted AS UTC (timestampdiff from the NTZ epoch → micros →
  timestamp_micros), NOT ``cast("timestamp")``. The cast interprets the
  wall-clock in the SESSION timezone, which moves window BOUNDARIES
  whenever the zone offset does not divide the window size (a 6-hour
  window under a -05:00 session buckets 07:03 into [07:00, 13:00) local
  = [12:00Z, 18:00Z) instead of [06:00, 12:00)) — found by the r6
  TZ=America/New_York oracle sweep. The arithmetic form names no
  timezone at all, so every streaming bucket/watermark decision is a
  pure function of the stored values on any session.

``as_naive_utc`` is the inverse for OUTPUT projections: an instant
(e.g. window.start) rendered as the TIMESTAMP_NTZ holding its UTC wall
clock, so collected/cast-to-string results are session-independent too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def normalize_event_time(
    df: DataFrame, schema: T.StructType, col: str = "ts"
) -> DataFrame:
    for f in schema.fields:
        if f.name != col:
            continue
        if isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} DIV 1000"))
            )
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(
                col,
                F.expr(
                    f"timestamp_micros(timestampdiff("
                    f"MICROSECOND, {_NTZ_EPOCH}, {col}))"
                ),
            )
    return df


def as_naive_utc(col: str) -> Column:
    """Instant (TIMESTAMP) -> TIMESTAMP_NTZ holding its UTC wall clock,
    by pure epoch arithmetic — session-timezone-independent rendering
    for streaming outputs whose event times were normalized above."""
    return F.expr(
        f"timestampadd(MICROSECOND, unix_micros({col}), {_NTZ_EPOCH})"
    )
