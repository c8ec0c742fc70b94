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

import os

from pyspark.sql import SparkSession

#: every file this module publishes into coded/ carries this prefix +
#: the micro-batch id — the idempotence key a replayed batch reconciles
#: against (see _publish_batch)
_BATCH_FILE_PREFIX = "stream-batch-"


def _publish_batch(staging: str, coded_dir: str, batch_id: int) -> int:
    """Atomically publish one micro-batch's staged coded files into the
    live ``coded`` directory under batchId-keyed names — the
    write-audit-publish idempotence discipline (queries_wave37) at file
    granularity, which is what makes the stream add EXACTLY-once:

      1. delete every file already in ``coded`` carrying THIS batch's
         prefix (a replayed batch — restart mid-publish or between
         publish and checkpoint commit — overwrites its own output
         instead of appending a duplicate copy);
      2. move the staged part files in, renamed to
         ``stream-batch-<id>-<seq>.parquet`` (per-file os.replace:
         atomic within a filesystem), preserving any hive partition
         subdirectories (``cent_id=*/``) the staged write produced;
      3. drop the staging directory.

    A crash anywhere in 1–2 leaves a prefix-complete subset that the
    replay's step 1 clears — duplicates are impossible for committed
    OR replayed batches (pinned by the crash/restart test in
    tests/test_wave45.py). The move loop is the shared
    sources/manifest_log.move_staged_parquet (r16 — one
    walk/filter/replace implementation for both layouts)."""
    from ..sources.manifest_log import move_staged_parquet

    prefix = f"{_BATCH_FILE_PREFIX}{batch_id}-"
    for root, _dirs, files in os.walk(coded_dir):
        for fn in files:
            if fn.startswith(prefix):
                os.remove(os.path.join(root, fn))
    return len(
        move_staged_parquet(
            staging, coded_dir, lambda i: f"{prefix}{i:05d}.parquet"
        )
    )


def ann_index_stream_add(
    spark: SparkSession,
    index_path: str,
    arrivals_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_path: str | None = None,
    _test_crash_after_publish: set[int] | None = None,
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
        one staged write — the arrival path never touches the existing
        lists;
      * EXACTLY-once under restart (r15; the r14 docstring documented
        the at-least-once caveat of a plain append): each batch's
        output files are keyed by batchId and published via
        _publish_batch, so a batch replayed after a mid-batch kill
        overwrites its own files instead of duplicating rows —
        the write-audit-publish pattern (queries_wave37) applied to
        the streaming sink; crash/restart pinned in
        tests/test_wave45.py;
      * the coded files are written in the INDEX's recorded layout
        (``partitioned_by_cell`` from the params table — ADVICE r14
        #1): a flat append into a hive-partitioned coded/ dir (or vice
        versa) would corrupt partition discovery on the next read;
      * an index written with ``layout="manifest"`` (r16) publishes
        each batch as ONE batchId-tagged CAS commit on the coded
        table's manifest log instead of batchId-keyed file names —
        the strictly stronger exactly-once (replay stays a no-op even
        after a compaction absorbs the batch's files, and a compaction
        may run CONCURRENTLY with the stream: the CAS loser rebases).

    ``_test_crash_after_publish``: test-only fault injection — batch
    ids whose on_batch raises AFTER publishing but BEFORE the
    checkpoint commits, simulating the kill window that makes a plain
    append duplicate rows. Never set in production paths.
    """
    from ..operators.similarity import (
        _collect_cent_rows,
        _fused_residual_pass,
        _resolve_index_root,
        ann_index_read,
    )

    # a VERSIONED index (pointer manifest at the root, r17) resolves
    # to its live generation ONCE, up front: the stream's quantizers,
    # coded table, and checkpoint all pin to that generation — a
    # rebuild flipping the pointer mid-stream does not retarget a
    # running stream (its arrivals replay against the NEW generation's
    # fresh checkpoint after a restart, the rebuild contract)
    index_path = _resolve_index_root(index_path)
    index = ann_index_read(spark, index_path)
    cent_rows = _collect_cent_rows(index["cents"])
    books = index["books"]
    cid_type = index["coded"].schema["cent_id"].dataType
    partitioned = bool(index["params"]["partitioned_by_cell"])
    manifest = index["params"].get("layout", "plain") == "manifest"
    schema = spark.read.parquet(arrivals_path).schema
    if checkpoint_path is None:
        checkpoint_path = index_path + "/_stream_add_ckpt"

    n_batches = {"n": 0}
    coded_dir = os.path.join(index_path, "coded")

    def on_batch(batch_df, batch_id):
        coded_new = _fused_residual_pass(
            batch_df, cent_rows, books, id_col, vec_col,
            cent_id_type=cid_type,
        )
        if manifest:
            from ..sources.manifest_log import log_commit, log_write_data

            files = log_write_data(
                coded_new,
                coded_dir,
                partition_by=["cent_id"] if partitioned else None,
            )
            log_commit(coded_dir, files, batch_id=batch_id)
        else:
            staging = os.path.join(
                index_path, f"_stream_add_staging_{batch_id}"
            )
            writer = coded_new.write.mode("overwrite")
            if partitioned:
                writer = writer.partitionBy("cent_id")
            writer.parquet(staging)
            _publish_batch(staging, coded_dir, batch_id)
        n_batches["n"] += 1
        if (
            _test_crash_after_publish
            and batch_id in _test_crash_after_publish
        ):
            raise RuntimeError(
                f"_test_crash_after_publish: batch {batch_id}"
            )

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


def ann_index_stream_add_log(
    spark: SparkSession,
    index: dict,
    log_path: str,
    arrivals_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_path: str | None = None,
    _test_crash_after_commit: set[int] | None = None,
) -> dict:
    """Stream arrivals into a MANIFEST-COMMITTED inverted-lists table
    (sources/manifest_log) — the transactional upgrade of
    ann_index_stream_add: each micro-batch's coded rows are written as
    immutable data files and published with ONE CAS commit tagged by
    batchId, which makes the add exactly-once in a strictly stronger
    sense than the batchId-keyed file names of the plain layout:

      * a replayed batch is a manifest-level NO-OP (its id is in the
        manifest's stream_batches set), and the set survives
        COMPACTION — the plain layout's replay guard dies the moment
        compaction absorbs the batch's file (documented at
        ann_index_compact); here a compaction can run BETWEEN a crash
        and the replay and the guarantee holds (test-pinned);
      * a compaction racing the stream can never lose a batch: the
        loser of the CAS rebases onto the winner's file list
        (manifest_log.log_commit), so append-vs-compact interleaves
        converge to the same table in either commit order.

    On first use the log is seeded with the handle's current lists
    (one commit); the returned handle reads the CURRENT snapshot.
    ``index`` carries the frozen quantizers (Faiss posture: artifacts
    persist via ann_index_write; the lists table is the thing that
    churns, so it is the thing that gets the commit log).

    ``_test_crash_after_commit``: test-only fault injection — raise
    after the manifest commit but before the checkpoint commits,
    simulating the replay window.
    """
    from ..operators.similarity import (
        _collect_cent_rows,
        _fused_residual_pass,
    )
    from ..sources.manifest_log import (
        log_commit,
        log_current,
        log_init,
        log_read,
        log_write_data,
    )

    log_init(log_path)
    if not log_current(log_path)["files"]:
        # the seed commit carries the RESERVED batch id -1 (Spark batch
        # ids are >= 0) so it is idempotent under the same CAS loop as
        # every stream commit: two drivers racing an empty log both
        # pass the files-empty check above, but the second seed commit
        # no-ops on the id instead of duplicating every seeded row
        # (r15 ADVICE #5); its freshly written files become orphans
        # for vacuum, exactly like a replayed batch's
        log_commit(
            log_path,
            log_write_data(index["coded"], log_path),
            batch_id=-1,
            note="seed: handle lists",
            schema=index["coded"].schema.json(),
        )
    cent_rows = _collect_cent_rows(index["cents"])
    books = index["books"]
    cid_type = index["coded"].schema["cent_id"].dataType
    schema = spark.read.parquet(arrivals_path).schema
    if checkpoint_path is None:
        checkpoint_path = log_path + "/_stream_add_ckpt"

    def on_batch(batch_df, batch_id):
        coded_new = _fused_residual_pass(
            batch_df, cent_rows, books, id_col, vec_col,
            cent_id_type=cid_type,
        )
        files = log_write_data(coded_new, log_path)
        log_commit(log_path, files, batch_id=batch_id)
        if (
            _test_crash_after_commit
            and batch_id in _test_crash_after_commit
        ):
            raise RuntimeError(
                f"_test_crash_after_commit: batch {batch_id}"
            )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_path)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {**index, "coded": log_read(spark, log_path)}
