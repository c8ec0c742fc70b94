"""Shared event-time normalization for streaming readers.

Parquet event time arrives in whichever physical type the writer chose:
nanos-as-LONG (this driver's generator) or TIMESTAMP_NTZ
(isAdjustedToUTC=false). ``withWatermark`` requires TIMESTAMP (LTZ), so
every stream stager normalizes through this ONE helper:

* LongType nanos → ``timestamp_micros(ts DIV 1000)`` — integer division;
  a double `/` drifts by 1 microsecond at nanosecond epoch magnitudes
  (see sources/registry.load_table).
* TIMESTAMP_NTZ → ``cast("timestamp")`` — interprets the wall-clock in
  the session timezone; identical instants under the engine session
  (UTC), and watermark/window arithmetic is timezone-shift-invariant, so
  results are stable even under a bare session in a non-UTC zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


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
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df
