"""Stream-stream joins (SURVEY.md §2.10 extension surface).

The reference has no event-time processing; this adds the watermarked
stream-stream interval join — the streaming operator behind "attribute
each purchase to the clicks that led to it". The batch twin (identical
predicate and output columns) is the oracle-checked registry query
`events_stream_join` (plans/queries_wave5.py).

Scale posture: a stream-stream inner join keeps BOTH sides in state; the
watermark plus the time-range join condition is what lets Spark age rows
out (clicks older than the watermark horizon can no longer match any
future purchase, so their state is dropped). Without the range condition
the state grows without bound — the condition is load-bearing, not an
optimization.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_stream_interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each purchase to the same user's clicks within ``lookback``
    before it. Both inputs may be streaming DataFrames with columns
    (event_id, ts, user_id); output columns match the batch twin
    `events_stream_join`.

    Watermarks on BOTH sides are required for state cleanup of a
    stream-stream join; ``watermark`` must be >= ``lookback`` or matches
    arriving at the edge of the window get dropped as late.
    """
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")
            )
            & (F.col("click_ts") <= F.col("purchase_ts")),
        )
        .select(
            "purchase_id", "click_id", "user_id", "purchase_ts", "click_ts"
        )
    )


def run_stream_join_on_parquet(
    spark: SparkSession,
    parquet_path: str,
    query_name: str = "stream_join_out",
    lookback: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Drive stream_stream_interval_join as a REAL streaming query: two
    independent readStream sources over the same events parquet (one
    filtered to purchases, one to clicks), memory sink,
    processAllAvailable — the local-test analogue of two kafka topics.

    ``watermark`` defaults to ``lookback`` — the callee requires
    watermark >= lookback, and a fixed default smaller than a caller's
    lookback would silently age out in-window matches across batches.
    """
    from .windows import stage_stream_source

    watermark = watermark if watermark is not None else lookback
    batch_df = spark.read.parquet(parquet_path)
    schema = batch_df.schema
    parquet_path, _staged = stage_stream_source(
        parquet_path, prefix="m2e_sjoin_"
    )

    def source() -> DataFrame:
        from .ts import normalize_event_time

        return normalize_event_time(
            spark.readStream.schema(schema).parquet(parquet_path), schema
        )

    purchases = source().filter(F.col("event_type") == "purchase")
    clicks = source().filter(F.col("event_type") == "click")
    q = (
        stream_stream_interval_join(
            purchases, clicks, lookback=lookback, watermark=watermark
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment: join a streaming fact to a BATCH
    dimension table, then aggregate per dimension attribute.

    The static side needs no watermark and holds no state — Spark
    re-plans it per micro-batch (picking up dim updates between
    batches). With ``broadcast_dim=True`` (default) the dimension is
    broadcast-HINTED: right for dimension tables that fit executor
    memory (the usual case), and the stream never shuffles on the join
    key. For a dimension too big to broadcast pass False and let Spark
    plan a shuffled join — the hint would force an OOM, not a fallback.

    Output: (c_mktsegment, n_events, total_value) with the sum through
    decimal — batch-equivalent when every event is replayed, so the
    streaming run is value-oracle-checkable (plans/queries_wave11).
    """
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    enriched = events.join(dim_side, events[key] == dim[dim_key])
    return (
        enriched.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )
