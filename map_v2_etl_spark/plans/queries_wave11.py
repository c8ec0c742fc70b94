"""Wave-11 surface: stream-static enrichment, the grouped-agg pandas
UDF API, and parquet compaction.

* events_enriched_stream — a REAL Structured Streaming run joining the
  event stream to the static customer dimension (broadcast; no state on
  the static side) and aggregating revenue per market segment, in
  "complete" output mode. With every event replayed the result is
  batch-equivalent, so this streaming join+agg gets a full value oracle
  — the stream-STATIC row of the streaming-join matrix (stream-stream
  lives in events_stream_join).
* grouped_geomean — the GROUPED_AGG pandas UDF surface (the one UDF
  class the engine had not exercised: Arrow-batched per-group numpy
  reduction). Geometric mean of positive event values per type; oracle
  exp(avg(ln x)) with the same round-6 discipline as bm25.
* compaction is an operator + test, not a query: see
  sources/parquet_io.compact_parquet (small-file compaction — the
  maintenance job every long-lived 100 TB table needs).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query


@query(
    "events_enriched_stream",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(20,4))) AS DOUBLE)
             AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=["streaming", "join", "stream-static", "enrichment"],
)
def q_events_enriched_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment as a real streaming query:
    events readStream ⋈ broadcast(customer) → per-segment revenue,
    complete mode. The static side holds no streaming state and the
    stream never shuffles on the join key — the production shape for
    dimension enrichment. Batch-equivalent on full replay ⇒ full value
    oracle (rare for a streaming join)."""
    from ..streaming.joins import stream_static_enrich
    from ..streaming.windows import run_stream_on_parquet

    dim = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    qname = "enrich_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return run_stream_on_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        lambda ev: stream_static_enrich(ev, dim),
        query_name=qname,
        output_mode="complete",
    )


@query(
    "grouped_geomean",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(exp(avg(ln(value))), 6) AS geomean_value
    FROM events WHERE value > 0 GROUP BY event_type
    """,
    tags=["udf", "grouped-agg", "pandas"],
)
def q_grouped_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type geometric mean of positive event values via a
    GROUPED_AGG pandas UDF — the Arrow-batched per-group reduction API
    (the UDF class the engine had not yet exercised; everything else
    uses pandas_udf scalar / applyInPandas / mapInPandas / UDTF).

    The UDF computes exp(mean(log x)) with numpy in one vectorized
    reduction per group; the count rides along as a built-in agg in the
    same pass. Scale: standard hash aggregation — the UDF only changes
    the per-group reduction kernel, not the shuffle shape."""
    from ..functions.pandas_aggs import geomean

    ev = load_table(spark, "events", sf_dir).filter(F.col("value") > 0)
    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg(); the count comes from a second group-by
    # joined back (both sides are |event_type| rows)
    gm = ev.groupBy("event_type").agg(
        F.round(geomean("value"), 6).alias("geomean_value")
    )
    n = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    return n.join(gm, "event_type").select(
        "event_type", "n", "geomean_value"
    )
