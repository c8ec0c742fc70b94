"""Streaming ANN index maintenance — the micro-batch form of Faiss
add(): new vectors arrive as files, each micro-batch is encoded with
the FROZEN build artifacts (coarse centroids + PQ codebooks held
driver-side) and appended to the persisted coded inverted lists. The
quantizers never retrain in the hot path — the streaming analogue of
operators/similarity.ann_index_add, closing the §2.10 × §2.11
intersection (stream-maintained vector index).

Reference parity: the reference engine (build.sh:75-233) has no ANN or
streaming surface; §2.11 training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def ann_index_stream_add(
    spark: SparkSession,
    index_path: str,
    arrivals_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_path: str | None = None,
) -> dict:
    """Run a REAL Structured Streaming query over ``arrivals_path``
    (a parquet directory; one file per micro-batch via
    maxFilesPerTrigger=1) that encodes each batch against the
    persisted index at ``index_path`` and appends the coded rows to
    its inverted-lists table, then returns the RELOADED index handle.

    Per-row encode with frozen artifacts makes the final coded set
    independent of micro-batch boundaries — bit-identical to a single
    ann_index_add of the whole arrivals set (test-pinned), which is
    why the registered query certifies against the same full
    value-hash oracle (rare for a streaming pipeline).

    Scale/semantics notes:
      * driver state is the same bounded (centroids, codebooks) pair
        every broadcast already assumes — collected ONCE, reused by
        every batch;
      * each batch is one fused Arrow pass (zero joins/shuffles) plus
        one append write — the arrival path never touches the existing
        lists;
      * the bounded availableNow run here is exactly-once; a
        long-running deployment restarting MID-batch replays it, and
        a plain parquet append makes that at-least-once — production
        would key output files by batchId (the write-audit-publish
        pattern, queries_wave37) or use a transactional table format.
        Documented rather than hidden.
    """
    from ..operators.similarity import (
        _collect_cent_rows,
        _fused_residual_pass,
        ann_index_read,
    )

    index = ann_index_read(spark, index_path)
    cent_rows = _collect_cent_rows(index["cents"])
    books = index["books"]
    cid_type = index["coded"].schema["cent_id"].dataType
    schema = spark.read.parquet(arrivals_path).schema
    if checkpoint_path is None:
        checkpoint_path = index_path + "/_stream_add_ckpt"

    n_batches = {"n": 0}

    def on_batch(batch_df, batch_id):
        coded_new = _fused_residual_pass(
            batch_df, cent_rows, books, id_col, vec_col,
            cent_id_type=cid_type,
        )
        coded_new.write.mode("append").parquet(index_path + "/coded")
        n_batches["n"] += 1

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_path)
    )
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = ann_index_read(spark, index_path)
    out["n_stream_batches"] = n_batches["n"]
    return out
