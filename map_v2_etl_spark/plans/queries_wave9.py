"""Wave-9 surface: maximal repeated spans, quality-priority canonical
dedup, and sliding-window aggregation.

The reference (/root/reference) has none of these; they extend the
engine per the north-star charter (BASELINE.json). Rationale per query:

* dup_spans — the span-level output of substring dedup (Lee et al.
  2021): instead of a per-doc score (dup_span_score), emit each MAXIMAL
  run of consecutive word-8-gram positions whose grams occur in other
  documents — the exact ranges a span-removal pass would cut. The run
  grouping is the classic gaps-and-islands pattern (position − dense
  row index is constant within a run), all integers.
* dedup_keep_best — survivor selection done right: within each exact-
  duplicate text group, keep the DOC with the best quality signal
  (longest text, then lowest id) instead of blindly the lowest id —
  the per-cluster max_by shape every production dedup ends with.
* events_sliding_window — overlapping windows (10 min every 5 min):
  each event lands in exactly window/slide windows. The batch twin of
  streaming `window(ts, '10 minutes', '5 minutes')`; the oracle
  reconstructs the overlap with generate_series, which pins Spark's
  window-assignment arithmetic cross-engine.

All outputs are integers/strings/timestamps except the decimal-summed
event values (cast through decimal so the sum is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .registry import query

_DUCK_TOKS = (
    "SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), "
    r"'\s+'), x -> x <> '') AS toks FROM documents"
)

# ---------------------------------------------------------------------------
# dup_spans
# ---------------------------------------------------------------------------

_SPAN_N = 8

_DUCK_DUP_SPANS = f"""
WITH t AS ({_DUCK_TOKS}),
pos AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {_SPAN_N - 1})) AS i
        FROM t WHERE len(toks) >= {_SPAN_N}),
g AS (SELECT doc_id, i,
             array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' ')
               AS gram
      FROM pos),
gd AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
shared AS (
  SELECT g.doc_id, g.i,
         g.i - CAST(row_number() OVER
             (PARTITION BY g.doc_id ORDER BY g.i) AS BIGINT) AS isl
  FROM g JOIN gd USING (gram)),
runs AS (
  SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
         CAST(count(*) AS BIGINT) AS n_positions
  FROM shared GROUP BY doc_id, isl)
SELECT doc_id, span_start,
       n_positions,
       n_positions + {_SPAN_N - 1} AS span_len_tokens
FROM runs
"""


@query("dup_spans", _DUCK_DUP_SPANS, tags=["text", "dedup", "substring", "islands"])
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal runs of consecutive duplicated-8-gram positions per doc:
    (doc_id, span_start, n_positions, span_len_tokens) — the concrete
    token ranges a span-removal dedup pass would excise.

    Islands detection: for the shared positions of a doc, i − rank(i)
    is constant exactly within each consecutive run, so one window
    function + one group-by finds maximal spans — no self-join, no
    iteration. Scale: the window partitions by doc_id over the shared
    positions only (a small fraction of the corpus), after the same
    gram-frequency join as dup_span_score."""
    from ..operators.dedup import tokens
    from ..sources.registry import widen_partitions

    docs = widen_partitions(load_table(spark, "documents", sf_dir))
    toks = F.filter(tokens(F.col("text")), lambda w: w != F.lit(""))
    t = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= _SPAN_N
    )
    g = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.size("toks") - (_SPAN_N - 1))
        ).alias("i"),
        "toks",
    ).select(
        "doc_id",
        "i",
        F.concat_ws(" ", F.slice("toks", F.col("i"), _SPAN_N)).alias("gram"),
    )
    gd = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    shared = g.join(gd, "gram").select(
        "doc_id",
        "i",
        (
            F.col("i")
            - F.row_number().over(
                W.partitionBy("doc_id").orderBy("i")
            ).cast("long")
        ).alias("isl"),
    )
    return (
        shared.groupBy("doc_id", "isl")
        .agg(
            F.min("i").cast("long").alias("span_start"),
            F.count("*").cast("long").alias("n_positions"),
        )
        .select(
            "doc_id",
            "span_start",
            "n_positions",
            (F.col("n_positions") + (_SPAN_N - 1)).alias("span_len_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_keep_best
# ---------------------------------------------------------------------------

_DUCK_FINGERPRINT = (
    "md5(array_to_string(list_sort(list_distinct(list_filter("
    r"string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''))), ' '))"
)

_DUCK_KEEP_BEST = f"""
WITH k AS (SELECT doc_id, n_chars, {_DUCK_FINGERPRINT} AS fp
           FROM documents),
r AS (SELECT fp, doc_id, n_chars,
             row_number() OVER (PARTITION BY fp
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM k)
SELECT fp,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS best_id,
       CAST(max(n_chars) AS BIGINT) AS best_n_chars
FROM r GROUP BY fp
"""


@query("dedup_keep_best", _DUCK_KEEP_BEST, tags=["dedup", "canonical", "quality"])
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority survivor selection per exact-duplicate group
    (canonical fingerprint key): keep the LONGEST member, ties to the
    lowest id — vs dedup_exact's lowest-id-always. One hash shuffle on
    the fingerprint; max_by with a STRUCT ordering key (n_chars,
    −doc_id) carries the argmax without a second pass or a join back,
    and is exact at any id magnitude (round-2 advice: the previous
    n_chars*1e8−doc_id fold silently corrupts the ordering once
    doc_id ≥ 1e8; DuckDB's max_by lacks struct keys, so the oracle
    states the same ordering as a row_number window instead)."""
    from ..operators.text import fingerprint

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "doc_id", "n_chars", fingerprint(F.col("text")).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max_by(
                F.col("doc_id"),
                F.struct(
                    F.col("n_chars").cast("long").alias("a"),
                    (-F.col("doc_id")).cast("long").alias("b"),
                ),
            )
            .cast("long")
            .alias("best_id"),
            F.max("n_chars").cast("long").alias("best_n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# events_sliding_window
# ---------------------------------------------------------------------------

_DUCK_SLIDING = """
WITH e AS (
  SELECT event_type, ts, value,
         CAST(floor(epoch(ts) / 300) AS BIGINT) AS slot
  FROM events),
w AS (
  SELECT event_type, value,
         unnest(generate_series(slot - 1, slot)) AS wslot
  FROM e)
-- naive epoch arithmetic, NOT to_timestamp: the TIMESTAMPTZ round trip
-- renders in the session zone and shifts windows under TZ != UTC
SELECT TIMESTAMP '1970-01-01'
         + to_seconds(CAST(wslot * 300 AS BIGINT)) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20, 4))) AS DOUBLE) AS total_value
FROM w GROUP BY wslot, event_type
"""


@query(
    "events_sliding_window",
    _DUCK_SLIDING,
    tags=["events", "window", "sliding", "streaming-twin"],
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 10-minute windows sliding every 5 minutes: each event
    contributes to exactly 2 windows. Batch twin of the streaming
    `window(ts, '10 minutes', '5 minutes')` aggregation; the oracle
    regenerates the two covering slots per event with generate_series,
    pinning Spark's slide-assignment arithmetic cross-engine. Sums go
    through decimal so overlap duplication stays exact.

    Scale: explode-by-2 then hash agg with map-side combine — the
    shuffle carries (window, type) partials, the overlap factor is the
    window/slide ratio by construction."""
    ev = load_table(spark, "events", sf_dir)
    win = ev.select(
        F.window("ts", "10 minutes", "5 minutes").alias("w"),
        "event_type",
        "value",
    )
    out = (
        win.groupBy(F.col("w.start").alias("window_start"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    return out
