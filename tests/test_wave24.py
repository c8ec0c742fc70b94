"""Wave-24 tests: the foreachBatch streaming-upsert sink.

Claims pinned here: the upsert runs as MULTIPLE merge steps (the
stream really microbatched), the final snapshot equals a from-scratch
full-log LWW recompute, and tombstoned users (latest event = 'error')
are absent from the final state but present INSIDE the snapshot (the
wave-21 retention rule, now under a streaming driver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_foreach_batch_upsert_equals_full_recompute(spark):
    out = {
        r["user_id"]: (r["last_type"], r["last_value"])
        for r in REGISTRY["stream_foreach_batch_upsert"].fn(spark, SF)
        .collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    full = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_type", "value"), F.struct("ts", "event_id")
        ).alias("s")
    )
    expect = {
        r["user_id"]: (r["s"]["event_type"], r["s"]["value"])
        for r in full.collect()
        if r["s"]["event_type"] != "error"
    }
    assert out == expect
    # tombstoned users really exist in this fixture (the filter bit)
    tombstoned = {
        r["user_id"]
        for r in full.collect()
        if r["s"]["event_type"] == "error"
    }
    assert tombstoned, "fixture should have at least one tombstoned user"
    assert not (tombstoned & set(out))


def test_foreach_batch_runs_multiple_merges(spark, monkeypatch):
    """The stream must drive >1 foreachBatch invocation (otherwise the
    'incremental' merge never merged anything) — counted by wrapping
    the batch callback via the replay source's batch sizing."""
    from map_v2_etl_spark.sources import pystream

    pystream.register(spark)
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    calls = []
    stream = (
        spark.readStream.format("m2e_parquet_replay")
        .option("path", f"{SF}/events.parquet")
        .option("columns", "event_id,user_id")
        .option("batch_rows", str(max(1, n // 3)))
        .load()
    )
    q = stream.writeStream.foreachBatch(
        lambda df, bid: calls.append((bid, df.count()))
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    fed = [c for c in calls if c[1] > 0]
    assert len(fed) >= 3
    assert sum(c[1] for c in fed) == n


# --------------------------------------------------------------------------
# custom Arrow writer (batch + streaming)
# --------------------------------------------------------------------------

def test_batch_writer_overwrite_and_stray_tmp(spark, tmp_path):
    """Two-phase commit contract: overwrite replaces prior content, and
    a stray temp file (a crashed/speculative attempt's leftover) is
    never promoted into the table."""
    import os

    from map_v2_etl_spark.sources import pydatasource

    pydatasource.register(spark)
    d = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id % 3 AS g")
    df.write.format("m2e_arrow_parquet").option("path", d).mode(
        "append"
    ).save()
    assert spark.read.parquet(d).count() == 100
    # plant a stray temp file, then overwrite-write half the rows
    os.makedirs(os.path.join(d, "_tmp"), exist_ok=True)
    stray = os.path.join(d, "_tmp", "part-stray.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"junk")
    df.filter("id < 50").write.format("m2e_arrow_parquet").option(
        "path", d
    ).mode("overwrite").save()
    assert spark.read.parquet(d).count() == 50, "overwrite must replace"
    assert not os.path.exists(os.path.join(d, "_tmp")), "tmp dir cleared"
    names = os.listdir(d)
    assert "part-stray.parquet" not in names, "stray file must not promote"


def test_batch_writer_append_accumulates(spark, tmp_path):
    from map_v2_etl_spark.sources import pydatasource

    pydatasource.register(spark)
    d = str(tmp_path / "a")
    df = spark.range(40)
    for _ in range(2):
        df.write.format("m2e_arrow_parquet").option("path", d).mode(
            "append"
        ).save()
    assert spark.read.parquet(d).count() == 80


def test_stream_writer_epoch_replay_idempotent(spark, tmp_path):
    """An epoch replay (restart between sink write and checkpoint
    commit) rewrites ITS epoch's files instead of duplicating rows —
    simulated by driving write+commit twice with the same batchId."""
    import glob
    import os

    import pyarrow as pa

    from map_v2_etl_spark.sources.pydatasource import (
        ArrowParquetStreamWriter,
    )

    d = str(tmp_path / "s")

    class _Ctx:  # stand-in for TaskContext in the unit harness
        def partitionId(self):
            return 0


    batch = pa.RecordBatch.from_pydict({"x": list(range(10))})
    w = ArrowParquetStreamWriter({"path": d}, overwrite=False)
    import pyspark

    real_get = pyspark.TaskContext.get
    pyspark.TaskContext.get = staticmethod(lambda: _Ctx())
    try:
        for _replay in range(2):  # same epoch delivered twice
            msg = w.write(iter([batch]))
            w.commit([msg], batchId=7)
    finally:
        pyspark.TaskContext.get = real_get
    files = sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    assert files == ["epoch-7-task-0.parquet"], files
    assert spark.read.parquet(d).count() == 10


def test_stream_writer_epoch_replay_shrinking_partitions(spark, tmp_path):
    """An epoch replay that lands rows in FEWER partitions than the
    first commit must still replace the epoch atomically: the first
    attempt's task-1 file (a partition that is empty in the replay) has
    to be cleared at commit, or its rows survive alongside the replay's
    and duplicate. Pins the r10 fix (clear epoch-{batchId}-* before
    promoting)."""
    import glob
    import os

    import pyarrow as pa

    from map_v2_etl_spark.sources.pydatasource import (
        ArrowParquetStreamWriter,
    )

    d = str(tmp_path / "s")

    class _Ctx:
        def __init__(self, pid):
            self._pid = pid

        def partitionId(self):
            return self._pid

    w = ArrowParquetStreamWriter({"path": d}, overwrite=False)
    import pyspark

    real_get = pyspark.TaskContext.get
    try:
        # first commit of epoch 9: two task partitions with rows
        msgs = []
        for pid, vals in [(0, [1, 2, 3]), (1, [4, 5])]:
            pyspark.TaskContext.get = staticmethod(
                lambda p=pid: _Ctx(p)
            )
            msgs.append(
                w.write(iter([pa.RecordBatch.from_pydict({"x": vals})]))
            )
        w.commit(msgs, batchId=9)
        assert spark.read.parquet(d).count() == 5
        # replay of epoch 9: same logical rows, all in partition 0
        pyspark.TaskContext.get = staticmethod(lambda: _Ctx(0))
        msg = w.write(
            iter([pa.RecordBatch.from_pydict({"x": [1, 2, 3, 4, 5]})])
        )
        w.commit([msg], batchId=9)
    finally:
        pyspark.TaskContext.get = real_get
    files = sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    # the stale epoch-9-task-1 file from the first commit must be gone
    assert files == ["epoch-9-task-0.parquet"], files
    assert spark.read.parquet(d).count() == 5


def test_stream_writer_epoch_prune_is_exact_id_not_prefix(spark, tmp_path):
    """Committing epoch 1 must never delete epoch 10/11/... output: the
    prune step's directory glob "epoch-1-*" is prefix-ambiguous, so the
    writer re-filters by EXACT batch id before removing anything. The
    scenario is a stream restarted with a fresh checkpoint (batch ids
    reset to 0,1,...) into a directory holding a prior run's later
    epochs — prefix-pruning there destroyed committed data."""
    import glob
    import os

    import pyarrow as pa

    from map_v2_etl_spark.sources.pydatasource import (
        ArrowParquetStreamWriter,
    )

    d = str(tmp_path / "s")

    class _Ctx:
        def __init__(self, pid):
            self._pid = pid

        def partitionId(self):
            return self._pid

    w = ArrowParquetStreamWriter({"path": d}, overwrite=False)
    import pyspark

    real_get = pyspark.TaskContext.get
    try:
        # prior run left committed epochs 10 and 11 in the directory
        for bid, vals in [(10, [101, 102]), (11, [111])]:
            pyspark.TaskContext.get = staticmethod(lambda: _Ctx(0))
            msg = w.write(iter([pa.RecordBatch.from_pydict({"x": vals})]))
            w.commit([msg], batchId=bid)
        # fresh-checkpoint run commits epoch 1 twice (second is a
        # shrunk-partition replay so the prune loop actually runs)
        msgs = []
        for pid, vals in [(0, [1, 2]), (1, [3])]:
            pyspark.TaskContext.get = staticmethod(lambda p=pid: _Ctx(p))
            msgs.append(
                w.write(iter([pa.RecordBatch.from_pydict({"x": vals})]))
            )
        w.commit(msgs, batchId=1)
        pyspark.TaskContext.get = staticmethod(lambda: _Ctx(0))
        msg = w.write(iter([pa.RecordBatch.from_pydict({"x": [1, 2, 3]})]))
        w.commit([msg], batchId=1)
    finally:
        pyspark.TaskContext.get = real_get
    files = sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    # epoch 1's stale task-1 pruned; epochs 10 and 11 untouched
    assert files == [
        "epoch-1-task-0.parquet",
        "epoch-10-task-0.parquet",
        "epoch-11-task-0.parquet",
    ], files
    assert spark.read.parquet(d).count() == 6


def test_stream_writer_end_to_end(spark, tmp_path):
    import glob
    import os

    from pyspark.sql import functions as F

    from map_v2_etl_spark.sources import pydatasource, pystream

    pydatasource.register(spark)
    pystream.register(spark)
    src = f"{SF}/events.parquet"
    n = spark.read.parquet(src).count()
    d = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.format("m2e_parquet_replay")
        .option("path", src)
        .option("columns", "event_id,event_type,value")
        .option("batch_rows", str(max(1, n // 3)))
        .load()
    )
    q = (
        stream.writeStream.format("m2e_arrow_parquet")
        .option("path", d)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(d)
    assert back.count() == n
    # exact content: decimal sum is order-independent
    a = back.agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("s")).first()["s"]
    b = spark.read.parquet(src).agg(
        F.sum(F.col("value").cast("decimal(20,4)")).alias("s")
    ).first()["s"]
    assert a == b
    epochs = {
        os.path.basename(f).split("-")[1]
        for f in glob.glob(os.path.join(d, "epoch-*.parquet"))
    }
    assert len(epochs) >= 3, "stream must have written multiple epochs"


def test_custom_source_to_custom_sink_survives_restart(spark, tmp_path):
    """Capstone: custom streaming SOURCE → custom streaming SINK with a
    mid-stream stop + checkpoint restart. Exactly-once end to end:
    the source's _floor recovery prevents re-planning committed
    offsets, and the sink's epoch-tagged files absorb the replayed
    uncommitted epoch by overwrite. Final content must equal the batch
    table exactly."""
    import time

    from pyspark.sql import functions as F

    from map_v2_etl_spark.sources import pydatasource, pystream

    pydatasource.register(spark)
    pystream.register(spark)
    src = f"{SF}/events.parquet"
    n = spark.read.parquet(src).count()
    d = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def mk():
        return (
            spark.readStream.format("m2e_parquet_replay")
            .option("path", src)
            .option("columns", "event_id,value")
            .option("batch_rows", "150")
            .load()
            .writeStream.format("m2e_arrow_parquet")
            .option("path", d)
            .option("checkpointLocation", ck)
            .start()
        )

    q = mk()
    deadline = time.time() + 60
    while True:
        try:
            written = spark.read.parquet(d).count()
        except Exception:
            written = 0
        if written >= max(300, n // 3):
            break
        assert time.time() < deadline, "stream made no progress"
        time.sleep(0.1)
    q.stop()
    q2 = mk()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    back = spark.read.parquet(d)
    assert back.count() == n
    a = back.agg(
        F.sum(F.col("value").cast("decimal(20,4)")).alias("s"),
        F.sum("event_id").alias("ids"),
    ).first()
    b = spark.read.parquet(src).agg(
        F.sum(F.col("value").cast("decimal(20,4)")).alias("s"),
        F.sum("event_id").alias("ids"),
    ).first()
    assert (a["s"], a["ids"]) == (b["s"], b["ids"])


def test_stream_writer_concurrent_attempts_isolated(spark, tmp_path):
    """Two concurrent attempts of the SAME task (speculation / a retry
    racing a zombie original) must never share a temp path: each write
    lands in its own uuid-named temp file, and only the attempt whose
    message reaches commit() is promoted to the deterministic
    epoch-{batchId}-task-{pid} name."""
    import glob
    import os

    import pyarrow as pa

    from map_v2_etl_spark.sources.pydatasource import (
        ArrowParquetStreamWriter,
    )

    d = str(tmp_path / "s")

    class _Ctx:
        def partitionId(self):
            return 0

    w = ArrowParquetStreamWriter({"path": d}, overwrite=False)
    import pyspark

    real_get = pyspark.TaskContext.get
    pyspark.TaskContext.get = staticmethod(lambda: _Ctx())
    try:
        # attempt A (the zombie) and attempt B (the retry) both write
        # BEFORE either commits — with a shared temp path B would be
        # appending over A's partial file
        msg_a = w.write(iter([pa.RecordBatch.from_pydict({"x": [1, 2]})]))
        msg_b = w.write(iter([pa.RecordBatch.from_pydict({"x": [3, 4, 5]})]))
        assert msg_a.filename != msg_b.filename, "attempts shared a temp path"
        assert msg_a.final_name == msg_b.final_name == "task-0.parquet"
        tmp_files = glob.glob(os.path.join(d, "_tmp", "*.parquet"))
        assert len(tmp_files) == 2, "each attempt must own its temp file"
        # only the successful attempt (B) is committed
        w.commit([msg_b], batchId=3)
    finally:
        pyspark.TaskContext.get = real_get
    files = sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    assert files == ["epoch-3-task-0.parquet"], files
    assert spark.read.parquet(d).count() == 3  # B's rows, not A's
    assert not os.path.exists(os.path.join(d, "_tmp")), "stray tmp survived"


def test_reader_empty_dataset(spark, tmp_path):
    """Reading back a dataset directory with no promoted part files
    (every task partition was empty) fails with a clear message when
    the schema must be inferred, and yields a correct zero-row result
    when the caller supplies the schema explicitly."""
    import pytest

    from map_v2_etl_spark.sources import pydatasource

    pydatasource.register(spark)
    d = str(tmp_path / "empty")
    import os

    os.makedirs(d)
    with pytest.raises(Exception, match="no .parquet files under"):
        spark.read.format("m2e_arrow_parquet").option("path", d).load()

    out = (
        spark.read.format("m2e_arrow_parquet")
        .schema("doc_id bigint, lang string")
        .option("path", d)
        .load()
    )
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang"]
