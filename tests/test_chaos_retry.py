"""Chaos test: the custom Arrow sinks under REAL task retries.

Everything the two-phase commit protocol claims was previously pinned
by driving write()/commit() by hand (tests/test_wave24.py). This file
injects GENUINE task failures — a transform that raises on every
task's FIRST attempt (TaskContext.attemptNumber() == 0) — on a
retry-capable master (``local[4, 3]``: the third bracket arg is
spark.task.maxFailures, without which local mode fails the job on the
first task failure), and asserts exactly-once output anyway:

* batch writer: every task fails once and retries; the promoted table
  holds each row exactly once, and no stray temp files survive —
  the failed attempts' uuid temp files were discarded with _tmp.
* streaming writer: same injection inside a foreachBatch-free custom
  sink stream; row totals equal the source exactly.

A dedicated SparkSession is built and torn down here: retry policy is
a session-level conf, and the suite's shared session must keep the
default fail-fast behavior (a hidden retry budget would mask real
bugs in every other test).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def retry_spark():
    existing = SparkSession.getActiveSession()
    if existing is not None:
        existing.stop()
    spark = (
        SparkSession.builder.master("local[4, 3]")
        .appName("chaos-retry")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def _make_chaos():
    """Build the failure injector as a LOCAL closure: a module-level
    function would cloudpickle by reference to this test module, which
    executors cannot import; a closure pickles by value."""

    def _fail_first_attempt(pdf_iter):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx.attemptNumber() == 0:
            raise RuntimeError(
                f"chaos: injected failure, task "
                f"{ctx.partitionId()} attempt 0"
            )
        yield from pdf_iter

    return _fail_first_attempt


def test_batch_writer_exactly_once_under_task_retries(
    retry_spark, tmp_path
):
    from map_v2_etl_spark.sources import pydatasource

    pydatasource.register(retry_spark)
    out = str(tmp_path / "chaos_batch")
    n = 1000
    df = retry_spark.range(n).repartition(4).mapInPandas(
        _make_chaos(), "id long"
    )
    (
        df.write.format("m2e_arrow_parquet")
        .option("path", out)
        .mode("append")
        .save()
    )
    back = retry_spark.read.parquet(out)
    assert back.count() == n
    assert back.agg(F.sum("id")).first()[0] == n * (n - 1) // 2
    ids = [r[0] for r in back.select("id").collect()]
    assert len(set(ids)) == n, "retry duplicated rows"
    assert not os.path.exists(os.path.join(out, "_tmp")), "stray tmp"


def test_stream_writer_exactly_once_under_task_retries(
    retry_spark, tmp_path
):
    from map_v2_etl_spark.sources import pydatasource, pystream

    pydatasource.register(retry_spark)
    pystream.register(retry_spark)
    src = str(tmp_path / "src.parquet")
    n = 1200
    retry_spark.range(n).select(
        F.col("id").alias("event_id")
    ).coalesce(1).write.parquet(src)
    src_file = glob.glob(os.path.join(src, "*.parquet"))[0]
    out = str(tmp_path / "chaos_stream")
    stream = (
        retry_spark.readStream.format("m2e_parquet_replay")
        .option("path", src_file)
        .option("batch_rows", "500")
        .option("tasks", "4")
        .load()
        .mapInPandas(_make_chaos(), "event_id long")
    )
    q = (
        stream.writeStream.format("m2e_arrow_parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = retry_spark.read.parquet(out)
    assert back.count() == n
    assert back.agg(F.sum("event_id")).first()[0] == n * (n - 1) // 2
    assert not os.path.exists(os.path.join(out, "_tmp")), "stray tmp"
