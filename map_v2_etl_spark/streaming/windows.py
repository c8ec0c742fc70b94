"""Structured Streaming extension (SURVEY.md §2.10, §7.6).

The reference has no event-time processing; this module adds the streaming
surface a large-scale event pipeline needs, over the same `events` table
shape (event_id, ts, user_id, event_type, value, props):

  * tumbling_window_counts — watermarked 5-min windows, count + sum
  * session_windows        — gap-based session aggregation
  * run_stream_on_parquet  — drives any of the above as a REAL streaming
    query (readStream -> memory sink -> processAllAvailable), used by tests
    and as the template for a production kafka/file source.

Batch/stream parity: the batch twin of tumbling_window_counts is the
registry query `events_tumbling_window` (oracle-checked against DuckDB);
the streaming test asserts the streaming result equals the batch result —
Spark's unified Dataset semantics make that an exact equality.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation: late rows beyond the
    watermark are dropped, state is bounded — the scale-safe default."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization per user via session_window — state merges
    adjacent events closer than `gap`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_stream_on_parquet(
    spark: SparkSession,
    parquet_path: str,
    transform,
    query_name: str = "stream_out",
    output_mode: str = "append",
) -> DataFrame:
    """Drive `transform(stream_df)` as a real streaming query over a
    parquet directory and return the materialized result.

    Uses the memory sink + processAllAvailable for a synchronous, bounded
    run — the local-test analogue of a kafka-source production deployment.
    """
    batch_df = spark.read.parquet(parquet_path)
    schema = batch_df.schema
    # the file stream source requires a directory; stage single files via a
    # symlink dir (testdata ships one parquet file per table)
    if os.path.isfile(parquet_path):
        staged = tempfile.mkdtemp(prefix="m2e_stream_")
        os.symlink(
            os.path.abspath(parquet_path),
            os.path.join(staged, os.path.basename(parquet_path)),
        )
        parquet_path = staged
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_path)
    )
    from .ts import normalize_event_time

    stream = normalize_event_time(stream, schema)
    q = (
        transform(stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_to_parquet(
    spark: SparkSession,
    parquet_in: str,
    transform,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Production-shaped file sink: stream -> transform -> parquet with a
    checkpoint. ``availableNow`` drains everything currently in the
    source then stops — the batch-backfill trigger; a live deployment
    drops the trigger and keeps the same checkpointed query running.
    Exactly-once into the sink comes from the checkpoint + file-sink
    manifest, surviving restarts."""
    batch_df = spark.read.parquet(parquet_in)
    schema = batch_df.schema
    if os.path.isfile(parquet_in):
        staged = tempfile.mkdtemp(prefix="m2e_stream_")
        os.symlink(
            os.path.abspath(parquet_in),
            os.path.join(staged, os.path.basename(parquet_in)),
        )
        parquet_in = staged
    from .ts import normalize_event_time

    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(parquet_in), schema
    )
    q = (
        transform(stream)
        .writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
