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
* streaming writer: same injection through the replay source → custom
  sink stream; row totals equal the source exactly.

ISOLATION: retry policy is a SparkContext-level setting, and stopping
or replacing the suite's shared session-scoped `spark` fixture would
leave every later test holding a stopped context (the r9 review
caught exactly that hazard in the first cut, masked only by
alphabetical collection order). Each scenario therefore runs in its
OWN INTERPRETER via subprocess — zero interference with the shared
session, at the cost of one extra JVM spin-up per scenario.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = """
import glob, os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4, 3]")
    .appName("chaos-retry")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)

def make_chaos():
    def fail_first_attempt(pdf_iter):
        from pyspark import TaskContext
        ctx = TaskContext.get()
        if ctx.attemptNumber() == 0:
            raise RuntimeError(
                f"chaos: injected failure, task "
                f"{{ctx.partitionId()}} attempt 0"
            )
        yield from pdf_iter
    return fail_first_attempt
"""

_BATCH = """
from map_v2_etl_spark.sources import pydatasource
pydatasource.register(spark)
out = os.path.join({tmp!r}, "chaos_batch")
n = 1000
df = spark.range(n).repartition(4).mapInPandas(make_chaos(), "id long")
(df.write.format("m2e_arrow_parquet").option("path", out)
   .mode("append").save())
back = spark.read.parquet(out)
assert back.count() == n
assert back.agg(F.sum("id")).first()[0] == n * (n - 1) // 2
ids = [r[0] for r in back.select("id").collect()]
assert len(set(ids)) == n, "retry duplicated rows"
assert not os.path.exists(os.path.join(out, "_tmp")), "stray tmp"
print("BATCH_OK")
"""

_STREAM = """
from map_v2_etl_spark.sources import pydatasource, pystream
pydatasource.register(spark)
pystream.register(spark)
src = os.path.join({tmp!r}, "src.parquet")
n = 1200
spark.range(n).select(F.col("id").alias("event_id")).coalesce(1)\\
    .write.parquet(src)
src_file = glob.glob(os.path.join(src, "*.parquet"))[0]
out = os.path.join({tmp!r}, "chaos_stream")
stream = (
    spark.readStream.format("m2e_parquet_replay")
    .option("path", src_file).option("batch_rows", "500")
    .option("tasks", "4").load()
    .mapInPandas(make_chaos(), "event_id long")
)
q = (stream.writeStream.format("m2e_arrow_parquet")
     .option("path", out)
     .option("checkpointLocation", os.path.join({tmp!r}, "ckpt"))
     .start())
try:
    q.processAllAvailable()
finally:
    q.stop()
back = spark.read.parquet(out)
assert back.count() == n
assert back.agg(F.sum("event_id")).first()[0] == n * (n - 1) // 2
assert not os.path.exists(os.path.join(out, "_tmp")), "stray tmp"
print("STREAM_OK")
"""


def _run(script: str, marker: str) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"chaos subprocess failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert marker in proc.stdout


@pytest.mark.parametrize(
    "body,marker", [(_BATCH, "BATCH_OK"), (_STREAM, "STREAM_OK")]
)
def test_sinks_exactly_once_under_task_retries(tmp_path, body, marker):
    script = _COMMON.format(repo=_REPO) + body.format(tmp=str(tmp_path))
    _run(script, marker)
