"""Wave-24 surface: the foreachBatch streaming-upsert sink pattern.

The reference (/root/reference) has no streaming at all; this wave
extends the engine's streaming story with the one production sink
pattern it still lacked:

* stream_foreach_batch_upsert — `writeStream.foreachBatch`: the
  standard way to run a MERGE/upsert (or any batch-only operation —
  multi-table writes, JDBC, dedup-against-state) per microbatch when
  the sink has no native streaming support. Events replay through the
  custom streaming Python Data Source (`sources/pystream.py`, wave 23)
  and each microbatch LWW-merges into a versioned parquet snapshot:
  batch k's snapshot = compact(snapshot_{k-1} ∪ compact(batch_k)),
  exactly the cdc_time_travel incremental merge (queries_wave21) now
  driven by the streaming engine instead of a hand-rolled loop. The
  final snapshot must equal the full-log LWW state — certified against
  the batch oracle. The merge's associativity across arbitrary batch
  boundaries (pinned by wave-21's stepwise==at-once test) is exactly
  the property that makes the result independent of how the stream
  happened to microbatch, i.e. what makes foreachBatch upsert safe
  under retrigger/backfill at 100 TB.

  Scale shape: each microbatch shuffles only (snapshot ∪ compacted
  batch) keyed state — never the raw history; snapshots are plain
  parquet so the sink is idempotent per batch id (the checkpoint +
  version-per-batch layout is the exactly-once recipe the Spark docs
  prescribe for foreachBatch, which is at-least-once by itself).

  Tombstone semantics carried from wave 21: 'error' rows RIDE THROUGH
  the merge with their metadata (dropping them would resurrect deleted
  keys on a later merge) and filter only at the final read.

* python_datasource_write_roundtrip — the WRITE half of the Python
  Data Source API (`sources/pydatasource.py` ArrowParquetWriter):
  documents flow OUT through the custom Arrow writer — each task
  writes a uniquely-named temp file and returns a commit message;
  the driver promotes exactly the files named in successful messages
  (two-phase job commit, the protocol that makes task retries and
  speculative duplicates invisible) — then back IN through the custom
  reader, and the aggregate must equal the source-of-truth oracle.
  With wave 22's reader, wave 23's stream reader and the stream
  writer (tests/test_wave24.py), the pluggable-source surface is now
  certified in all four quadrants: batch/stream × read/write.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

DEC = "decimal(20,4)"


def _eager(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


_DUCK_FOREACH_UPSERT = """
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type AS last_type, value AS last_value
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


@query(
    "stream_foreach_batch_upsert",
    _DUCK_FOREACH_UPSERT,
    tags=["streaming", "foreachBatch", "upsert", "cdc"],
)
def q_stream_foreach_batch_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """events → streaming replay → foreachBatch LWW-merge into a
    versioned parquet snapshot → final state. See module docstring."""
    from ..sources import pystream
    from .queries_wave21 import _compact

    pystream.register(spark)
    root = tempfile.mkdtemp(prefix="m2e_febu_")
    # driver-side cell tracking the latest snapshot version; foreachBatch
    # callbacks run on the driver, so plain closure state is correct
    state = {"v": -1}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        compacted = _compact(batch_df)
        # snapshot keyed BY BATCH ID (not a per-invocation counter): a
        # retried/replayed batch k re-derives from v={k-1} and rewrites
        # ITS OWN v={k} directory — that directory-level idempotence is
        # the sink half of the exactly-once foreachBatch recipe. (This
        # bounded cert run starts fresh each time so ids are 0..n; with
        # a checkpointLocation the restarted query replays the same
        # uncommitted id and lands on the same directory. The LWW
        # merge's own idempotence is a second, independent safety net.)
        prev_v = batch_id - 1
        if prev_v >= 0:
            prev = spark.read.parquet(os.path.join(root, f"v={prev_v}"))
            compacted = _compact(prev.unionByName(compacted))
        compacted.write.mode("overwrite").parquet(
            os.path.join(root, f"v={batch_id}")
        )
        state["v"] = max(state["v"], batch_id)

    try:
        stream = (
            spark.readStream.format("m2e_parquet_replay")
            .option("path", os.path.join(sf_dir, "events.parquet"))
            .option("columns", "event_id,ts,user_id,event_type,value")
            .option("batch_rows", "4096")
            .load()
        )
        q = stream.writeStream.foreachBatch(upsert).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = spark.read.parquet(os.path.join(root, f"v={state['v']}"))
        return _eager(
            final.filter(F.col("event_type") != "error").select(
                "user_id",
                F.col("event_type").alias("last_type"),
                F.col("value").alias("last_value"),
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# python_datasource_write_roundtrip
# --------------------------------------------------------------------------

_DUCK_PYDS_WRITE = (
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(max(n_chars) AS BIGINT) AS max_chars "
    "FROM documents GROUP BY lang"
)


@query(
    "python_datasource_write_roundtrip",
    _DUCK_PYDS_WRITE,
    tags=["sink", "datasource-api", "arrow", "roundtrip"],
)
def q_python_datasource_write_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """documents → custom Arrow writer (two-phase commit) → custom
    Arrow reader → per-lang aggregate. See module docstring."""
    from ..sources import pydatasource
    from ..sources.registry import load_table

    pydatasource.register(spark)
    out = tempfile.mkdtemp(prefix="m2e_pydsw_")
    try:
        docs = load_table(spark, "documents", sf_dir).select(
            "doc_id", "lang", "n_chars"
        )
        (
            docs.repartition(4)
            .write.format("m2e_arrow_parquet")
            .option("path", out)
            .mode("append")
            .save()
        )
        back = (
            spark.read.format("m2e_arrow_parquet")
            .option("path", out)
            .load()
        )
        return _eager(
            back.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.max("n_chars").alias("max_chars"),
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
