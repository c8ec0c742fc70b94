"""Streaming upsert sink via foreachBatch (SURVEY.md §2.10 extension).

`foreachBatch` is Structured Streaming's escape hatch for sinks Spark has
no native writer for: each micro-batch arrives as a normal DataFrame plus
a monotonically increasing batch_id, and the callback applies it
transactionally-per-batch. Here it maintains an SCD-1 "latest row per
key" table on plain parquet — the streaming twin of the batch
`merge_upsert` registry query.

Snapshot layout instead of in-place overwrite: each batch commits a new
versioned directory ``target/v{batch_id}`` and flips a ``_LATEST``
pointer file afterward. Overwriting a parquet path that the same job is
reading is both illegal in Spark and non-atomic on object stores; the
snapshot-plus-pointer pattern is the minimal honest version of what
Delta/Iceberg do with their commit logs (which are the production-grade
target of this sink at 100 TB — swap `_write_snapshot` for a MERGE INTO
and everything else stands). Replayed batches (restart without a
completed pointer flip) are idempotent: re-writing v{batch_id} and
re-flipping the pointer converges to the same state.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """One row per key: the max of ``order_cols`` (lexicographic struct
    max — deterministic when the last order col is unique, e.g. an event
    id). max_by keeps this a single hash aggregation (map-side partial
    combine), not a window sort."""
    payload = [c for c in df.columns if c not in key_cols]
    packed = df.select(
        *key_cols,
        F.struct(*[F.col(c) for c in order_cols]).alias("__ord"),
        F.struct(*[F.col(c) for c in payload]).alias("__row"),
    )
    agg = packed.groupBy(*key_cols).agg(
        F.max_by("__row", "__ord").alias("__row")
    )
    return agg.select(*key_cols, *[F.col(f"__row.{c}").alias(c) for c in payload])


class IncrementalParquetUpsert:
    """foreachBatch callback object maintaining latest-per-key state."""

    def __init__(
        self,
        spark: SparkSession,
        target: str,
        key_cols: list[str],
        order_cols: list[str],
    ):
        self.spark = spark
        self.target = target
        self.key_cols = key_cols
        self.order_cols = order_cols
        os.makedirs(target, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.target, "_LATEST")

    def _current_version(self) -> str | None:
        if not os.path.exists(self._pointer()):
            return None
        with open(self._pointer()) as fh:
            return fh.read().strip()

    def current(self) -> DataFrame | None:
        version = self._current_version()
        if version is None:
            return None
        return self.spark.read.parquet(os.path.join(self.target, version))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        prev = self._current_version()
        new = latest_per_key(batch_df, self.key_cols, self.order_cols)
        base = self.current()
        if base is not None:
            # re-resolve latest over old state + new rows; state rows
            # carry their original order columns so ordering is global,
            # not arrival-order
            new = latest_per_key(
                base.unionByName(new), self.key_cols, self.order_cols
            )
        vdir = f"v{batch_id}"
        new.write.mode("overwrite").parquet(
            os.path.join(self.target, vdir)
        )
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(vdir)
        os.replace(tmp, self._pointer())  # atomic pointer flip
        # vacuum: every version except the new current and its
        # immediate predecessor (kept for in-flight readers) is dead —
        # without this the sink accumulates a FULL state snapshot per
        # micro-batch forever
        keep = {vdir, prev}
        for d in os.listdir(self.target):
            full = os.path.join(self.target, d)
            if (
                d.startswith("v")
                and d not in keep
                and os.path.isdir(full)
            ):
                shutil.rmtree(full, ignore_errors=True)


def run_stream_upsert_on_parquet(
    spark: SparkSession,
    parquet_dir: str,
    target: str,
    key_cols: list[str],
    order_cols: list[str],
    query_name: str = "stream_upsert",
) -> DataFrame:
    """Stream a parquet directory one file per micro-batch through the
    upsert sink; returns the final state. With N input files this
    exercises N incremental merges — the restartable-ingest shape of a
    production CDC pipeline."""
    batch_df = spark.read.parquet(parquet_dir)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
    )
    # same event-time normalization as every stream stager, so a
    # watermarked transform layered on this sink never sees NTZ/long ts
    from .ts import normalize_event_time

    stream = normalize_event_time(stream, batch_df.schema)
    sink = IncrementalParquetUpsert(spark, target, key_cols, order_cols)
    q = (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    out = sink.current()
    assert out is not None
    return out
