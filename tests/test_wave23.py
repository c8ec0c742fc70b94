"""Wave-23 tests: streaming Python Data Source, applyInArrow group
transform, dynamic partition pruning.

Load-bearing claims per query:
* stream_python_datasource — the replay runs as MULTIPLE microbatches
  (not one giant batch) and still composes to exactly the batch
  answer; the per-microbatch partition split parallelizes each batch.
* arrow_group_transform — result equals the built-in aggregate twin
  (count/sum) and numpy-midpoint median equals percentile_approx-free
  exact median computed independently.
* dynamic_partition_pruning — the fact scan's physical plan carries a
  dynamicpruning subquery in PartitionFilters (the runtime-pruning
  shape), and results equal a plain filter+aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"
DEC = "decimal(20,4)"


# --------------------------------------------------------------------------
# stream_python_datasource
# --------------------------------------------------------------------------

def test_replay_stream_multibatch_equals_batch(spark):
    from map_v2_etl_spark.sources import pystream

    pystream.register(spark)
    path = f"{SF}/events.parquet"
    n_rows = spark.read.parquet(path).count()
    batch_rows = max(1, n_rows // 4)  # force ≥4 microbatches
    stream = (
        spark.readStream.format("m2e_parquet_replay")
        .option("path", path)
        .option("columns", "event_id,event_type,value")
        .option("batch_rows", str(batch_rows))
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("w23_replay_test")
        .start()
    )
    try:
        q.processAllAvailable()
        fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(fed) >= 4, "replay must advance in multiple microbatches"
        assert sum(p["numInputRows"] for p in fed) == n_rows
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("w23_replay_test").collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast(DEC)).cast("double")
                .alias("sum_value"),
            )
            .collect(),
        )
    )
    assert got == want


def test_replay_stream_partition_split():
    """A microbatch's row range splits into `tasks` near-equal slices
    covering it exactly, and slice reads reproduce the rows."""
    from map_v2_etl_spark.sources.pystream import ParquetReplayStreamReader

    r = ParquetReplayStreamReader(
        {"path": f"{SF}/events.parquet", "tasks": "4", "batch_rows": "100"}
    )
    parts = r.partitions({"row": 40}, {"row": 140})
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 40 and spans[-1][1] == 140
    for (a, b), (c, _) in zip(spans, spans[1:]):
        assert b == c, "slices must tile the range with no gap/overlap"
    rows = []
    for p in parts:
        for batch in r.read(p):
            rows.extend(batch.to_pylist())
    assert len(rows) == 100


def test_replay_stream_offsets_park_at_eof():
    from map_v2_etl_spark.sources.pystream import ParquetReplayStreamReader

    r = ParquetReplayStreamReader(
        {"path": f"{SF}/events.parquet", "batch_rows": "10000000"}
    )
    assert r.initialOffset() == {"row": 0}
    first = r.latestOffset()
    assert first == {"row": r.n_rows}
    assert r.latestOffset() == first, "EOF must park (no empty batches)"


# --------------------------------------------------------------------------
# arrow_group_transform
# --------------------------------------------------------------------------

def test_arrow_group_transform_vs_builtin(spark):
    out = {r["lang"]: r for r in
           REGISTRY["arrow_group_transform"].fn(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    twin = {
        r["lang"]: r
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .collect()
    }
    assert set(out) == set(twin)
    for lang, w in twin.items():
        assert out[lang]["n_docs"] == w["n_docs"]
        assert out[lang]["sum_chars"] == w["sum_chars"]
        # exact median, computed independently
        vals = sorted(
            r["n_chars"]
            for r in docs.filter(F.col("lang") == lang)
            .select("n_chars")
            .collect()
        )
        n = len(vals)
        med = (vals[(n - 1) // 2] + vals[n // 2]) / 2.0
        assert out[lang]["median_chars"] == med


# --------------------------------------------------------------------------
# dynamic_partition_pruning
# --------------------------------------------------------------------------

def test_dpp_subquery_in_plan(spark, tmp_path):
    from map_v2_etl_spark.plans.queries_wave23 import build_dpp_frames, dpp_join

    fact, dim = build_dpp_frames(spark, SF, str(tmp_path / "dpp"))
    plan = dpp_join(fact, dim)._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_dpp_results_equal_plain_filter(spark):
    out = sorted(
        map(tuple, REGISTRY["dynamic_partition_pruning"].fn(spark, SF)
            .collect())
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    day = ev.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )
    want = sorted(
        map(
            tuple,
            day.filter(F.pmod(F.col("n"), F.lit(2)) == 1).collect(),
        )
    )
    assert out == want
    assert out, "fixture should have at least one odd-count date"


def test_dpp_dim_predicate_not_statically_inferable(spark, tmp_path):
    """The guard this query exists to keep: the fact scan's STATIC
    PartitionFilters must stay trivial (isnotnull only) — if a future
    edit makes the dim predicate key-derivable, Catalyst infers it
    onto the fact and the dynamicpruning subquery stops being
    load-bearing (the bench_scale trap)."""
    import re

    from map_v2_etl_spark.plans.queries_wave23 import build_dpp_frames, dpp_join

    fact, dim = build_dpp_frames(spark, SF, str(tmp_path / "dpp2"))
    plan = dpp_join(fact, dim)._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)", plan):
        inner = m.group(1)
        for pred in inner.split(","):
            pred = pred.strip()
            assert (
                not pred
                or pred.startswith("isnotnull")
                or "dynamicpruning" in pred
            ), f"static inferred partition filter leaked into the scan: {pred}"


# --------------------------------------------------------------------------
# replay-source restart correctness (the _floor recovery protocol)
# --------------------------------------------------------------------------

def _replay_query(spark, src, ck, sink):
    from map_v2_etl_spark.sources import pystream

    pystream.register(spark)
    return (
        spark.readStream.format("m2e_parquet_replay")
        .option("path", src)
        .option("columns", "event_id")
        .option("batch_rows", "200")
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: sink.append((bid, df.count()))
        )
        .option("checkpointLocation", ck)
        .start()
    )


def test_replay_restart_mid_stream_exactly_once(spark, tmp_path):
    """A stop between microbatches + restart from the checkpoint must
    deliver every row EXACTLY once — the naive reset-to-zero cursor
    re-delivered 40% of the corpus (measured before the _floor
    protocol; see pystream.py's restart-correctness block).

    Accounting is idempotent BY batchId: Spark's foreachBatch contract
    is at-least-once with a stable batchId — if q.stop() lands between
    the sink append and the checkpoint commit, the restart legitimately
    replays that uncommitted batch under the SAME bid, and a blind
    list-sum double-counts it (the ~50% flake this dedup fixes). The
    replayed bid must carry the identical row count, and the engine-side
    no-duplicate-rows guarantee is pinned by the frontier tripwire test
    below."""
    import time

    src = f"{SF}/events.parquet"
    n = spark.read.parquet(src).count()
    sink = []
    q = _replay_query(spark, src, str(tmp_path / "ck"), sink)
    deadline = time.time() + 60
    while sum(dict(sink).values()) < max(400, n // 3):
        assert time.time() < deadline, "stream made no progress"
        time.sleep(0.1)
    q.stop()
    q2 = _replay_query(spark, src, str(tmp_path / "ck"), sink)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    by_bid = {}
    for bid, count in sink:
        assert by_bid.setdefault(bid, count) == count, (
            f"replayed batch {bid} delivered a different row count"
        )
    assert sum(by_bid.values()) == n


def test_replay_restart_after_clean_stop_delivers_nothing(spark, tmp_path):
    """Restarting a FULLY-committed checkpoint must deliver zero new
    rows: the engine's first (backward) plan request teaches the fresh
    reader the committed frontier and the clamp empties every
    subsequent range."""
    src = f"{SF}/events.parquet"
    n = spark.read.parquet(src).count()
    sink = []
    q = _replay_query(spark, src, str(tmp_path / "ck"), sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(c for _, c in sink) == n
    q2 = _replay_query(spark, src, str(tmp_path / "ck"), sink)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sum(c for _, c in sink) == n, "clean restart must not replay"


def test_replay_stream_duplicate_delivery_tripwire():
    """The reader RAISES if the engine plans a forward range below an
    offset it committed in this run (the in-run signature of duplicate
    delivery), and accepts the legitimate boundary case (replay starts
    exactly AT the committed frontier)."""
    import pytest

    from map_v2_etl_spark.sources.pystream import ParquetReplayStreamReader

    r = ParquetReplayStreamReader(
        {"path": f"{SF}/events.parquet", "batch_rows": "100"}
    )
    r.commit({"row": 100})
    # legal: next batch starts at the committed frontier
    assert r.partitions({"row": 100}, {"row": 200})
    # illegal: re-planning committed rows
    with pytest.raises(RuntimeError, match="committed frontier"):
        r.partitions({"row": 50}, {"row": 150})
    # degenerate probes below the frontier are engine bookkeeping, not
    # data delivery — never fatal
    assert r.partitions({"row": 50}, {"row": 50})


def test_replay_stream_engine_version_pin_warns(monkeypatch):
    """The restart protocol is pinned to the traced pyspark line; any
    other engine version warns loudly at reader construction instead of
    silently trusting an undocumented call sequence."""
    import warnings

    import pyspark

    from map_v2_etl_spark.sources.pystream import ParquetReplayStreamReader

    opts = {"path": f"{SF}/events.parquet"}
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # traced version: no warning
        ParquetReplayStreamReader(opts)
    monkeypatch.setattr(pyspark, "__version__", "4.9.0")
    with pytest.warns(RuntimeWarning, match="re-trace"):
        ParquetReplayStreamReader(opts)


import pytest  # noqa: E402  (used by the tripwire tests above)


def test_replay_restart_protocol_fuzz(tmp_path):
    """Volume fuzz of the _floor/frontier restart protocol (r12 hand-off
    fuzz-net item): a pure-Python simulator of the TRACED 4.1.2
    MicroBatchExecution call sequence (degenerate partitions(F, F)
    probe on restart, full replay of the uncommitted tail, commit(end)
    thereafter) drives real ParquetReplayStreamReader instances through
    4000 randomized stop/restart schedules — crashes injected at every
    protocol point (before the offset-log write, before the sink,
    before the commit-log write, after commit, and inside the restart
    replay itself) — and checks the exactly-once accounting reference:
    (1) a replayed batchId always carries the identical range,
    (2) committed batches tile [0, n_rows) with no gap and no overlap,
    (3) partitions() tiles every planned range exactly, and
    (4) the committed-frontier tripwire never fires on a legitimate
    schedule. A 20k-trial volume run passed before this 4k permanent
    cut. No Spark session: the reader's protocol state machine is the
    unit under test."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_v2_etl_spark.sources.pystream import ParquetReplayStreamReader

    fix = str(tmp_path / "fixture.parquet")
    pq.write_table(pa.table({"event_id": list(range(512))}), fix)

    class Crash(Exception):
        pass

    def run_trial(rng):
        n_rows = rng.randint(1, 400)
        batch_rows = rng.choice([1, 3, 7, 16, 50, 128])
        tasks = rng.choice([1, 2, 4])
        p_crash = rng.choice([0.0, 0.05, 0.15, 0.3])

        def mk_reader():
            r = ParquetReplayStreamReader(
                {
                    "path": fix,
                    "batch_rows": str(batch_rows),
                    "tasks": str(tasks),
                }
            )
            r.n_rows = n_rows
            return r

        offset_log, commit_log, sink = [], set(), []

        def deliver(reader, bid, start, end):
            parts = reader.partitions({"row": start}, {"row": end})
            ranges = sorted(
                (p.start, p.end) for p in parts if p.end > p.start
            )
            covered = start
            for lo, hi in ranges:
                assert lo == covered, (
                    f"partition gap/overlap {ranges} for [{start},{end})"
                )
                covered = hi
            assert covered == end
            sink.append((bid, start, end))

        def maybe_crash():
            if rng.random() < p_crash:
                raise Crash()

        restarts, fresh = 0, True
        while True:
            reader = mk_reader()
            try:
                if not fresh and offset_log:
                    F = offset_log[-1][2]
                    reader.partitions({"row": F}, {"row": F})
                    maybe_crash()
                    last_bid, last_start, last_end = offset_log[-1]
                    if last_bid not in commit_log:
                        deliver(reader, last_bid, last_start, last_end)
                        maybe_crash()
                        commit_log.add(last_bid)
                        reader.commit({"row": last_end})
                        maybe_crash()
                fresh = False
                while True:
                    start = offset_log[-1][2] if offset_log else 0
                    end = reader.latestOffset()["row"]
                    if end <= start:
                        return n_rows, offset_log, commit_log, sink
                    maybe_crash()  # before offset-log write
                    bid = len(offset_log)
                    offset_log.append((bid, start, end))
                    maybe_crash()  # before sink
                    deliver(reader, bid, start, end)
                    maybe_crash()  # before commit-log write
                    commit_log.add(bid)
                    reader.commit({"row": end})
                    maybe_crash()  # after commit
            except Crash:
                restarts += 1
                if restarts > 25:
                    p_crash = 0.0  # drain to completion
                continue

    rng = random.Random(31337)
    for _ in range(4000):
        n_rows, offset_log, commit_log, sink = run_trial(rng)
        by_bid = {}
        for bid, s, e in sink:
            assert by_bid.setdefault(bid, (s, e)) == (s, e), (
                f"replayed batch {bid} delivered a different range"
            )
        assert set(commit_log) == set(by_bid)
        cur = 0
        for s, e in sorted(by_bid[b] for b in commit_log):
            assert s == cur, "committed ranges gap/overlap"
            cur = e
        assert cur == n_rows
