"""Structured Streaming extension: stream/batch parity on real streaming runs."""

import os

from map_v2_etl_spark.sources.registry import load_table
from map_v2_etl_spark.streaming.windows import (
    run_stream_on_parquet,
    session_windows,
    tumbling_window_counts,
)


def rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_tumbling_window_stream_equals_batch(spark, sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    batch = tumbling_window_counts(load_table(spark, "events", sf_dir))
    streamed = run_stream_on_parquet(
        spark, path, tumbling_window_counts,
        query_name="t_tumbling", output_mode="complete",
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert rows_set(streamed, cols) == rows_set(batch, cols)


def test_stateful_running_totals_match_batch(spark, sf_dir):
    """applyInPandasWithState per-user running totals: after the stream
    drains, state must equal the batch groupBy answer."""
    from pyspark.sql import functions as F

    from map_v2_etl_spark.streaming.stateful import running_user_totals

    path = os.path.join(sf_dir, "events.parquet")
    streamed = run_stream_on_parquet(
        spark, path, running_user_totals,
        query_name="t_stateful", output_mode="update",
    )
    # update mode appends one row per (user, micro-batch); keep the latest
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in streamed.collect()  # single-file source -> one batch
    }
    batch = load_table(spark, "events", sf_dir).groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    expect = {r.user_id: (r.n, r.total) for r in batch.collect()}
    assert set(final) == set(expect)
    for uid, (n, total) in expect.items():
        assert final[uid][0] == n
        assert abs(final[uid][1] - total) < 1e-6


def test_session_windows_run(spark, sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    streamed = run_stream_on_parquet(
        spark, path, session_windows,
        query_name="t_sessions", output_mode="complete",
    )
    rows = streamed.collect()
    assert len(rows) > 0
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


def test_transform_with_state_matches_apply_in_pandas(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from map_v2_etl_spark.sources.registry import load_table
    from map_v2_etl_spark.streaming.stateful import (
        HAS_TWS,
        running_user_totals_tws,
    )
    from map_v2_etl_spark.streaming.windows import run_stream_on_parquet

    if not HAS_TWS:
        import pytest

        pytest.skip(
            "transformWithStateInPandas requires Spark >= 4.0 and "
            "google.protobuf on the workers"
        )
    path = os.path.join(sf_dir, "events.parquet")
    streamed = run_stream_on_parquet(
        spark, path, running_user_totals_tws,
        query_name="t_tws", output_mode="update",
    )
    final = {
        r.user_id: (r.n_events, r.total_value) for r in streamed.collect()
    }
    batch = load_table(spark, "events", sf_dir).groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    expect = {r.user_id: (r.n, r.total) for r in batch.collect()}
    assert set(final) == set(expect)
    for uid, (n, total) in expect.items():
        assert final[uid][0] == n
        assert abs(final[uid][1] - total) < 1e-6


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join drains to exactly the
    batch twin's rows (registry query events_stream_join)."""
    from map_v2_etl_spark.plans.registry import REGISTRY, all_queries
    from map_v2_etl_spark.streaming.joins import run_stream_join_on_parquet

    all_queries()
    path = os.path.join(sf_dir, "events.parquet")
    streamed = run_stream_join_on_parquet(spark, path, query_name="t_sjoin")
    batch = REGISTRY["events_stream_join"].fn(spark, sf_dir)
    cols = ["purchase_id", "click_id", "user_id", "purchase_ts", "click_ts"]
    assert rows_set(streamed, cols) == rows_set(batch, cols)
    assert streamed.count() > 0


def test_foreach_batch_upsert_incremental(spark, sf_dir, tmp_path):
    """Events streamed one file per micro-batch through the foreachBatch
    upsert sink: final state == batch latest-row-per-user, across
    multiple incremental merges."""
    from pyspark.sql import functions as F

    from map_v2_etl_spark.streaming.sinks import (
        latest_per_key,
        run_stream_upsert_on_parquet,
    )

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "value"
    )
    src = str(tmp_path / "ev_shards")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    out = run_stream_upsert_on_parquet(
        spark,
        src,
        str(tmp_path / "state"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    )
    got = {r.user_id: (r.event_id, r.value) for r in out.collect()}
    expect = {
        r.user_id: (r.event_id, r.value)
        for r in latest_per_key(
            spark.read.parquet(src), ["user_id"], ["ts", "event_id"]
        ).collect()
    }
    assert got == expect
    # multiple versions committed -> genuinely incremental
    import glob as g
    assert len(g.glob(str(tmp_path / "state" / "v*"))) >= 2


def test_stateful_funnel_order_robust(spark, tmp_path):
    """The stateful funnel must be correct even when micro-batches
    arrive out of event-time order: a later batch delivering an EARLIER
    view lowers the first-view anchor and changes which click counts."""
    import os

    from pyspark.sql import functions as F

    from map_v2_etl_spark.streaming.funnel import running_funnel
    from map_v2_etl_spark.streaming.windows import run_stream_on_parquet

    d = str(tmp_path / "ev")
    os.makedirs(d)
    cols = "event_id long, ts string, user_id long, event_type string"
    # file 1 (first batch): late events — click at 02:00, purchase 03:00,
    # view at 02:30 (between them)
    spark.createDataFrame(
        [
            (1, "2024-01-01 02:00:00", 1, "click"),
            (2, "2024-01-01 03:00:00", 1, "purchase"),
            (3, "2024-01-01 02:30:00", 1, "view"),
        ],
        cols,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    # file 2 (second batch): an EARLIER view arrives late — now the
    # 02:00 click follows a view and the 03:00 purchase follows it
    spark.createDataFrame(
        [(4, "2024-01-01 01:00:00", 1, "view")], cols
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    out = run_stream_on_parquet(
        spark, d, running_funnel,
        query_name="funnel_order_test", output_mode="update",
    )
    rows = sorted(out.collect(), key=lambda r: r["n_seen"])
    # interim state after batch 1: view at 02:30, but no click after it
    # (some interleaving may deliver both files in one batch; only the
    # FINAL state is contractual)
    final = rows[-1]
    assert final["n_seen"] == 4
    assert (
        final["reached_view"],
        final["reached_click"],
        final["reached_purchase"],
    ) == (1, 1, 1)


def test_upsert_sink_replay_idempotent(spark, tmp_path):
    """foreachBatch recovery contract: after a failure, Structured
    Streaming REPLAYS the last batch with the same batch_id — the sink
    must land in the identical state (idempotent version-dir overwrite +
    atomic pointer flip), not double-apply."""
    from map_v2_etl_spark.streaming.sinks import IncrementalParquetUpsert

    sink = IncrementalParquetUpsert(
        spark, str(tmp_path / "state"), ["k"], ["ts"]
    )
    b0 = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "p")], ["k", "ts", "v"]
    )
    b1 = spark.createDataFrame(
        [("a", 3, "z"), ("c", 1, "q")], ["k", "ts", "v"]
    )
    sink(b0, 0)
    sink(b1, 1)
    after_once = {
        (r["k"], r["ts"], r["v"]) for r in sink.current().collect()
    }
    sink(b1, 1)  # replay of the failed/duplicated final batch
    after_replay = {
        (r["k"], r["ts"], r["v"]) for r in sink.current().collect()
    }
    assert after_once == after_replay == {
        ("a", 3, "z"), ("b", 1, "p"), ("c", 1, "q")
    }


def test_streaming_windows_independent_of_session_timezone(spark, sf_dir):
    """r6 TZ-sweep regression guard: the streaming 6-hour top-k must
    produce IDENTICAL rows under a -05:00 session — window boundaries
    come from epoch arithmetic on the stored values (streaming/ts.py),
    never from the session zone. 6 hours is the discriminating width:
    the New_York offset does not divide it, so the pre-fix NTZ->LTZ
    cast would shift every boundary (5-minute windows cannot catch
    this — every whole-hour offset divides them)."""
    from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

    all_queries()

    def rows(name):
        df = REGISTRY[name].fn(spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(
            tuple(str(r[c]) for c in cols) for r in df.collect()
        )

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "UTC")
        base = rows("events_topk_stream")
        spark.conf.set(key, "America/New_York")
        spark.catalog.clearCache()
        shifted = rows("events_topk_stream")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert base == shifted
