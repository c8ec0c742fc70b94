"""Wave-16 surface: as-of join variants + exact equi-width histograms
(SURVEY.md §2.3, §2.4 extensions).

* asof_join_forward   — earliest right row AT-OR-AFTER each left row
                        (the "next event" direction pandas merge_asof
                        calls forward); same union + running-first
                        composition, opposite frame.
* asof_join_tolerance — backward as-of that VOIDS matches older than a
                        tolerance horizon (stale-quote guard in market
                        data, stale-click guard here).
* column_histograms   — exact equi-width histograms over several metric
                        columns in one pass: the distribution companion
                        to extents (bin boundaries from global min/max,
                        identical IEEE arithmetic in both engines so
                        bin assignment is bit-deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..sources.registry import load_table
from .registry import query

_DUCK_ASOF_FWD = (
    "SELECT p.event_id, p.user_id, p.ts, c.ts AS ts_right, c.value AS value "
    "FROM (SELECT event_id, user_id, ts FROM events "
    "      WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events "
    "                WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id AND p.ts <= c.ts"
)


@query("asof_join_forward", _DUCK_ASOF_FWD, tags=["join", "asof", "forward"])
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase matched to the user's EARLIEST click
    at-or-after it (follow-on behavior attribution). Same single-shuffle
    union composition as the backward join, with a current..following
    running-first frame."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["value"], direction="forward",
    )


_DUCK_ASOF_TOL = (
    "SELECT p.event_id, p.user_id, p.ts, "
    "CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.ts END AS ts_right, "
    "CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.value END AS value "
    "FROM (SELECT event_id, user_id, ts FROM events "
    "      WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events "
    "                WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id AND p.ts >= c.ts"
)


@query(
    "asof_join_tolerance",
    _DUCK_ASOF_TOL,
    tags=["join", "asof", "tolerance"],
)
def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 1-hour staleness horizon: a prior click
    older than the tolerance is no match at all (nulls), the
    stale-quote guard of market-data as-of joins."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["value"], tolerance=F.lit(3600.0),
    )


_HIST_BINS = 16
_HIST_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

_DUCK_HIST = f"""
WITH v AS ({" UNION ALL ".join(
    f"SELECT '{c}' AS id, CAST({c} AS DOUBLE) AS v FROM lineitem"
    for c in _HIST_COLS)}),
s AS (SELECT id, min(v) AS mn, max(v) AS mx FROM v GROUP BY id),
b AS (SELECT v.id,
             CAST(COALESCE(least(floor((v.v - s.mn)
               / nullif((s.mx - s.mn) / {_HIST_BINS}, 0)),
               {_HIST_BINS - 1}), 0) AS INT) AS bin
      FROM v JOIN s USING (id))
SELECT id, CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY id, bin
"""


@query("column_histograms", _DUCK_HIST, tags=["agg", "histogram", "extents"])
def q_column_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-width histograms ({bins} bins from global min/max) for
    several metric columns in one melt pass — the distribution
    companion to extents. Bin assignment computes the same IEEE double
    expression in both engines, so boundary calls are bit-identical;
    the top edge folds into the last bin (the d3.bin convention).

    Scale: one stack + two hash aggregations; the (column → min/max)
    table is |cols| rows and broadcasts into the binning projection —
    cell values never shuffle, only (column, bin) partial counts."""
    li = load_table(spark, "lineitem", sf_dir)
    stack_args = [F.lit(len(_HIST_COLS))]
    for c in _HIST_COLS:
        stack_args += [F.lit(c), F.col(c).cast("double")]
    v = li.select(F.stack(*stack_args).alias("id", "v"))
    s = v.groupBy("id").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    width = F.nullif((F.col("mx") - F.col("mn")) / _HIST_BINS, F.lit(0.0))
    bin_ = F.coalesce(
        F.least(
            F.floor((F.col("v") - F.col("mn")) / width),
            F.lit(_HIST_BINS - 1),
        ),
        F.lit(0),
    ).cast("int")
    return (
        v.join(F.broadcast(s), "id")
        .select("id", bin_.alias("bin"))
        .groupBy("id", "bin")
        .agg(F.count("*").alias("n"))
        .select(
            "id",
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_incremental — screen a new crawl increment against the corpus
# ---------------------------------------------------------------------------

from .queries_ext import _DUCK_TOKENS  # noqa: E402  (corrected shared
# tokenizer fragment: full-whitespace strip, mirroring dedup.tokens)
_DUCK_SHINGLES_INC = (
    "list_distinct(["
    + "||' '||".join(f"w[i+{j}]" if j else "w[i]" for j in range(3))
    + " for i in generate_series(1, len(w)-2)])"
)

_DUCK_INCREMENTAL = f"""
WITH sh AS (
  SELECT doc_id, unnest({_DUCK_SHINGLES_INC}) AS s
  FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
  GROUP BY 1, 2
)
SELECT id_a, id_b, c / (na.n_sh + nb.n_sh - c) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE c / (na.n_sh + nb.n_sh - c) >= 0.8
"""


@query(
    "dedup_incremental",
    _DUCK_INCREMENTAL,
    tags=["dedup", "incremental", "minhash", "lsh"],
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening: docs with doc_id % 5 = 0 play the
    NEW crawl increment; every near-dup pair (new, existing) at exact
    Jaccard ≥ 0.8 surfaces — the nightly-ingest shape where the corpus
    side's MinHash signatures are a precomputed table and only the
    increment is signed fresh. Candidates come from banded LSH
    restricted to cross-side bucket collisions (new×new and old×old
    pairs never form), verified exactly; shares the exact-Jaccard
    oracle on the same recall argument as dedup_minhash_pairs."""
    from ..operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, "documents", sf_dir)
    return minhash_lsh_pairs(
        docs, threshold=0.8, new_side=F.col("doc_id") % 5 == 0
    )


# ---------------------------------------------------------------------------
# events_topk_stream — streaming windowed counts, batch top-k rank
# ---------------------------------------------------------------------------

_DUCK_TOPK_STREAM = """
WITH w AS (
  SELECT time_bucket(INTERVAL '21600 seconds', ts)
           AS window_start,
         event_type, count(*) AS c
  FROM events GROUP BY 1, 2),
r AS (SELECT window_start, event_type, c,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY c DESC, event_type) AS rk
      FROM w)
SELECT CAST(window_start AS VARCHAR) AS window_start, event_type,
       CAST(c AS BIGINT) AS n_events, CAST(rk AS BIGINT) AS rank
FROM r WHERE rk <= 3
"""


@query(
    "events_topk_stream",
    _DUCK_TOPK_STREAM,
    tags=["streaming", "window", "topk"],
)
def q_events_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: top-3 per 6-hour window, with the window
    COUNTS produced by a real Structured Streaming run in COMPLETE
    output mode (replayed to completion, so streaming output equals
    batch; append mode would hold back the final watermark-open
    windows) and the
    per-window ranking applied as a batch post-pass — the standard
    split, because ranking needs a complete window and belongs after
    the streaming aggregation's results-table, not inside it.

    Scale: complete-mode state is one row per (window, type) over the
    stream's lifetime — bounded here by the replayed span; a live
    deployment would run append mode + watermark and accept that each
    window ranks only after it expires. The rank window runs over
    windows × types."""
    import hashlib as _h

    from pyspark.sql.window import Window as W

    from ..streaming.windows import run_stream_on_parquet

    def agg6h(stream):
        return (
            stream
            .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(F.count("*").alias("c"))
            .select(
                F.col("w.start").alias("window_start"), "event_type", "c"
            )
        )

    qname = "topk6h_" + _h.md5(sf_dir.encode()).hexdigest()[:8]
    counts = run_stream_on_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        agg6h,
        query_name=qname,
        output_mode="complete",
    )
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("c"), "event_type")
    )
    from ..streaming.ts import as_naive_utc

    return (
        counts.withColumn("rank", rk)
        .filter(F.col("rank") <= 3)
        .select(
            # UTC-wall rendering by epoch arithmetic: a plain string
            # cast renders the instant in the SESSION zone, shifting
            # every 6-hour boundary under tz offsets that don't divide
            # the window (the r6 TZ sweep finding)
            as_naive_utc("window_start").cast("string")
            .alias("window_start"),
            "event_type",
            F.col("c").cast("long").alias("n_events"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# events_funnel_stream — stateful streaming funnel, batch-equal on replay
# ---------------------------------------------------------------------------

from .queries_wave14 import _DUCK_FUNNEL as _DUCK_FUNNEL_STREAM


@query(
    "events_funnel_stream",
    _DUCK_FUNNEL_STREAM,
    tags=["streaming", "stateful", "funnel"],
)
def q_events_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered view→click→purchase funnel computed INCREMENTALLY by
    a custom stateful streaming operator (applyInPandasWithState, one
    state entry per user, order-robust recompute from the per-user
    timestamp multiset — streaming/funnel.py). Replayed to completion
    the final state per user equals the batch event_funnel query, so a
    hand-written stateful operator gets a full value oracle. Users with
    no funnel-relevant events never fire the state function and join in
    as all-zero rows, exactly like the batch left join."""
    import hashlib as _h

    from pyspark.sql.window import Window as W

    from ..streaming.funnel import running_funnel
    from ..streaming.windows import run_stream_on_parquet

    qname = "funnel_" + _h.md5(sf_dir.encode()).hexdigest()[:8]
    out = run_stream_on_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        running_funnel,
        query_name=qname,
        output_mode="update",
    )
    latest = (
        out.withColumn(
            "_r",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.desc("n_seen"))
            ),
        )
        .filter(F.col("_r") == 1)
        .select("user_id", "reached_view", "reached_click",
                "reached_purchase")
    )
    users = load_table(spark, "events", sf_dir).select("user_id").distinct()
    return (
        users.join(latest, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("reached_view", F.lit(0)).cast("int").alias(
                "reached_view"
            ),
            F.coalesce("reached_click", F.lit(0)).cast("int").alias(
                "reached_click"
            ),
            F.coalesce("reached_purchase", F.lit(0)).cast("int").alias(
                "reached_purchase"
            ),
        )
    )
