"""Real-readStream parity for the last two batch-fold streaming twins
(r10, VERDICT r9 item 8): events_sliding_window and events_late_audit.

With these, every streaming-tagged registry query either runs a real
stream INSIDE the certified query or has a real-stream pytest twin —
the full matrix is recorded in docs/STREAMING_MATRIX.md.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries
from map_v2_etl_spark.streaming.windows import run_stream_on_parquet

all_queries()


def rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_sliding_window_stream_equals_batch(spark, sf_dir):
    """The sliding 10-min/5-min aggregation, run as a REAL streaming
    query in complete mode, must equal the registry's certified batch
    twin row for row (same window assignment, same decimal-exact
    sums)."""
    path = os.path.join(sf_dir, "events.parquet")

    def sliding(stream):
        return (
            stream.select(
                F.window("ts", "10 minutes", "5 minutes").alias("w"),
                "event_type",
                "value",
            )
            .groupBy(F.col("w.start").alias("window_start"), "event_type")
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum(F.col("value").cast("decimal(20,4)"))
                .cast("double")
                .alias("total_value"),
            )
        )

    streamed = run_stream_on_parquet(
        spark, path, sliding,
        query_name="t_sliding", output_mode="complete",
    )
    batch = REGISTRY["events_sliding_window"].fn(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert rows_set(streamed, cols) == rows_set(batch, cols)


def _write_arrival_files(tmp_path, batches):
    """One parquet file per arrival batch, mtimes strictly ascending so
    FileStreamSource (which orders by modification time) delivers them
    as separate micro-batches in the given order."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "late_src")
    os.makedirs(d)
    t0 = time.time() - 3600
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "ts": pa.array(
                    [r[0] for r in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([r[1] for r in rows]),
            }
        )
        f = os.path.join(d, f"batch-{i:03d}.parquet")
        pq.write_table(tbl, f)
        os.utime(f, (t0 + i * 10, t0 + i * 10))
    return d


def test_late_audit_contract_on_real_watermark_stream(spark, tmp_path):
    """events_late_audit models which rows a watermark would drop. This
    pins that model against Spark's REAL behavior: a windowed count
    with withWatermark('ts', '10 minutes') in append mode, driven one
    file per micro-batch, must exclude exactly the rows whose event
    time fell behind (running max over prior batches − delay) at
    arrival — the same running-max-minus-delay rule the audit query
    computes per source."""
    from datetime import datetime as dt

    T = lambda s: dt.fromisoformat(f"2024-01-01 {s}")  # noqa: E731
    batches = [
        # batch 0: window [10:00, 10:10) gets 2 on-time clicks
        [(T("10:00:00"), "click"), (T("10:05:00"), "click")],
        # batch 1: advance event time to 10:30 -> watermark becomes
        # 10:20 at the NEXT batch
        [(T("10:30:00"), "view")],
        # batch 2: spacer — eviction happens at batch END, so this is
        # the batch whose close EMITS window [10:00, 10:10) with n=2
        # (traced on pyspark 4.1: a late row arriving in the same batch
        # the watermark crosses still merges into live state; the drop
        # only applies once the window's state is gone)
        [(T("10:31:00"), "view")],
        # batch 3: LATE click at 10:02 — its window is closed and
        # evicted; Spark must DROP it, not re-open the window (the
        # audit's rule flags it: ts 10:02 < running-max 10:31 − 10 min)
        [(T("10:02:00"), "click")],
        # batch 4: advance to 10:55 so the 10:30/10:31 windows close
        [(T("10:55:00"), "view")],
    ]
    src = _write_arrival_files(tmp_path, batches)

    def audited(stream):
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("window.start").alias("ws"), "event_type", "n"
            )
        )

    streamed = run_stream_on_parquet(
        spark, src, audited,
        query_name="t_late_audit", output_mode="append",
    )
    emitted = [(r["ws"], r["event_type"], r["n"]) for r in streamed.collect()]
    # the closed click window holds ONLY the 2 on-time rows, emitted
    # exactly once: the late click was dropped by the real watermark —
    # neither merged (n=3) nor re-opened as a second 1-row emission
    click_rows = [e for e in emitted if e[1] == "click"]
    assert click_rows == [(T("10:00:00"), "click", 2)], emitted
    # and the audit formula applied to this arrival order agrees: one
    # row (the 10:02 click arriving after 10:31) is flagged late
    import pandas as pd

    rows = [r for b in batches for r in b]
    seen_max = pd.Series([r[0] for r in rows]).cummax().shift(1)
    late = [
        r
        for i, r in enumerate(rows)
        if i > 0 and r[0] < seen_max[i] - pd.Timedelta(minutes=10)
    ]
    assert late == [(T("10:02:00"), "click")]


def test_same_batch_late_row_still_merges_before_eviction(spark, tmp_path):
    """Version-pin for the traced pyspark 4.1 nuance the late-audit
    model documents (docs/STREAMING_MATRIX.md, VERDICT r10 item 7):
    a late row arriving in the SAME micro-batch in which the watermark
    first exceeds its window end still MERGES into live state — the
    late-input filter and state eviction both take effect at batch end,
    so the drop applies from the NEXT batch on. The audit query models
    only the steady-state (next-batch) rule, so if a future pyspark
    starts filtering late input eagerly at batch start, the audit's
    count and the engine's would silently diverge by exactly these
    boundary rows — this test fails loudly instead.

    Arrival schedule: the 10:02 click's window [10:00, 10:10) is
    already behind the 10:20 watermark when batch 2 STARTS (the 10:30
    row advanced it at the end of batch 1), yet the click must still
    merge: eviction of the window happens at the END of batch 2."""
    from datetime import datetime as dt

    T = lambda s: dt.fromisoformat(f"2024-01-01 {s}")  # noqa: E731
    batches = [
        [(T("10:00:00"), "click"), (T("10:05:00"), "click")],
        # end of this batch: watermark -> 10:30 - 10 min = 10:20,
        # past the click window's 10:10 end
        [(T("10:30:00"), "view")],
        # batch 2: late click arrives in the eviction batch itself —
        # on pyspark 4.1 it still merges (emitted n=3, not 2)
        [(T("10:02:00"), "click")],
        # close out the view windows
        [(T("10:55:00"), "view")],
    ]
    src = _write_arrival_files(tmp_path, batches)

    def audited(stream):
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "event_type", "n")
        )

    streamed = run_stream_on_parquet(
        spark, src, audited,
        query_name="t_same_batch_merge", output_mode="append",
    )
    click_rows = [
        (r["ws"], r["event_type"], r["n"])
        for r in streamed.collect()
        if r["event_type"] == "click"
    ]
    assert click_rows == [(T("10:00:00"), "click", 3)], (
        "pyspark's late-row eviction timing changed: the same-batch "
        f"late click no longer merges before eviction ({click_rows}); "
        "re-trace events_late_audit's steady-state model and update "
        "docs/STREAMING_MATRIX.md"
    )
