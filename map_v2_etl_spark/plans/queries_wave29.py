"""Wave-29 surface: SCD2 point-in-time lookup and sequence pattern
analytics.

* scd2_lookup — the CONSUMING half of wave-27's SCD Type-2 build: every
  fact event is enriched with the dimension state that was valid at its
  arrival (exclusive: the state JUST BEFORE the event, so an
  episode-opening event sees the episode it closed). This is the
  point-in-time dimension join every warehouse runs against an SCD2
  table — and the interval semantics make the match provably unique:
  episodes tile [first_from, ∞) with valid_to = next valid_from, so
  ``valid_from < ts AND (valid_to IS NULL OR ts <= valid_to)`` admits
  exactly one episode (boundary ts matches the CLOSING episode, not the
  opening one; zero-length episodes — duplicate ts change points — can
  never match). Events at/before the user's first change point get
  NULL state (left join).

  Plan shape: the fact and the dimension BOTH key on user_id, so the
  range predicate rides a user-keyed equi-join as a post-filter; the
  per-user episode list is bounded by the user's own change count, so
  the filtered join never degenerates toward a cross product. At
  100 TB the dimension is key-sized (episodes, not events) and the one
  shuffle each side is on the join key.

* sequence_pattern_match — MATCH_RECOGNIZE-flavored per-user sequence
  analytics: each user's events collapse (ordered by ts, event_id)
  into a compact state string (event-type initials), then pattern
  features compute JVM-side on the string: ordered-conversion
  existence (view → click → purchase as a regex), direct-transition
  counts (literal substring occurrences), and first-state tests.

  Determinism note (why existence + literal counts, not regex COUNTS):
  Spark's regex engine (java.util.regex, backtracking-greedy) and
  DuckDB's (RE2, leftmost-longest) agree on whether a match EXISTS and
  on literal substring occurrence counts, but can disagree on match
  EXTENTS — and non-overlapping regex counting depends on extents. The
  feature set is deliberately restricted to the engine-portable
  subset; extent-dependent counting belongs in a pytest ground-truth
  twin, not a cross-engine hash oracle.

  Plan shape: ONE shuffle (groupBy user), order restored inside the
  aggregate via array_sort over (ts, event_id, initial) structs — no
  window over the raw stream, no per-user re-shuffle. The per-user
  string is bounded by the user's own event count; corpora with
  unbounded per-key streams sessionize first (events_session_windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .queries_wave27 import _DUCK_SCD2, scd2_intervals_from
from .registry import query

# --------------------------------------------------------------------------
# scd2_lookup
# --------------------------------------------------------------------------

_DUCK_LOOKUP = f"""
WITH dim AS ({_DUCK_SCD2})
SELECT e.event_id, e.user_id, e.event_type,
       d.state AS state_at_arrival,
       d.valid_from AS state_since
FROM events e
LEFT JOIN dim d
  ON d.user_id = e.user_id
 AND d.valid_from < e.ts
 AND (d.valid_to IS NULL OR e.ts <= d.valid_to)
"""


@query(
    "scd2_lookup",
    _DUCK_LOOKUP,
    tags=["warehouse", "scd2", "point-in-time", "join"],
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment of every event with its user's SCD2
    state at arrival (module docstring)."""
    ev = load_table(spark, "events", sf_dir)
    dim = scd2_intervals_from(ev).select(
        F.col("user_id").alias("d_user"),
        "state",
        "valid_from",
        "valid_to",
    )
    cond = (
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from") < F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") <= F.col("valid_to")))
    )
    return (
        ev.select("event_id", "user_id", "ts", "event_type")
        .join(dim, cond, "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("state").alias("state_at_arrival"),
            F.col("valid_from").alias("state_since"),
        )
    )


# --------------------------------------------------------------------------
# sequence_pattern_match
# --------------------------------------------------------------------------

_DUCK_SEQ = """
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id)
SELECT user_id,
  CAST(length(s) AS INTEGER) AS seq_len,
  CAST((length(s) - length(replace(s, 'vc', ''))) / 2 AS INTEGER)
    AS n_view_click,
  CAST((length(s) - length(replace(s, 'cp', ''))) / 2 AS INTEGER)
    AS n_click_purchase,
  regexp_matches(s, 'v.*c.*p') AS has_conversion,
  substr(s, 1, 1) = 's' AS starts_with_signup
FROM seq
"""


@query(
    "sequence_pattern_match",
    _DUCK_SEQ,
    tags=["events", "sequence", "pattern", "analytics"],
)
def q_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence pattern features over the ordered state
    string (module docstring)."""
    ev = load_table(spark, "events", sf_dir)
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("i"),
                        )
                    )
                ),
                lambda x: x["i"],
            ),
            "",
        ).alias("s")
    )

    def _count(sub: str):
        return (
            (F.length("s") - F.length(F.replace(F.col("s"), F.lit(sub))))
            / 2
        ).cast("int")

    return seq.select(
        "user_id",
        F.length("s").cast("int").alias("seq_len"),
        _count("vc").alias("n_view_click"),
        _count("cp").alias("n_click_purchase"),
        F.col("s").rlike("v.*c.*p").alias("has_conversion"),
        (F.substring("s", 1, 1) == "s").alias("starts_with_signup"),
    )
