"""Wave-27 surface: SCD Type-2 dimension building.

* scd2_intervals — the slowly-changing-dimension Type-2 build, the
  warehouse pattern that turns a mutation LOG into a VERSIONED
  dimension: one row per (entity, state episode) with
  [valid_from, valid_to) validity and an is_current flag. The classic
  two-step, all window functions:

    1. change detection — a row opens a new episode iff its state
       differs from the entity's previous row (lag() over the event
       order); consecutive duplicates of the same state extend the
       episode instead of opening one (the dedup step naive SCD2 jobs
       forget, which explodes the dimension with zero-information
       versions);
    2. interval closing — valid_to = lead(valid_from) over the
       SURVIVING episode rows; null lead ⇒ open interval ⇒ is_current.

  The engine already certifies the CONSUMER side of SCD2 separately
  (range_join joins facts to validity intervals; asof_join is the
  two-sided shortcut), so this query certifies the BUILD side — the
  half that decides whether history is even recorded correctly.

  Scale shape: two window passes over the same (user_id × ts) ordering
  — ONE shuffle (the second window reuses the first's partitioning,
  visible in the plan audit), partial nothing, no joins. At 100 TB the
  change log is the small side of the world (mutations, not facts);
  the build is embarrassingly per-entity.

  Ordering ties: (ts, event_id) — the engine's standard total order on
  events — so lag/lead are deterministic and the oracle (same SQL
  shape in DuckDB) is value-hash exact. valid_from/valid_to carry
  event_id alongside ts in the output for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .registry import query

_DUCK_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
episodes AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         event_id AS from_event_id
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type),
closed AS (
  SELECT user_id, state, valid_from, from_event_id,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, from_event_id)
           AS valid_to
  FROM episodes)
SELECT user_id, state, valid_from, from_event_id, valid_to,
       valid_to IS NULL AS is_current
FROM closed
"""


def scd2_intervals_from(ev: DataFrame) -> DataFrame:
    """The SCD2 build over any (user_id, event_type, ts, event_id)
    change log — separated from the fixture load so the property tests
    can drive it with hypothesis-generated logs."""
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    episodes = (
        ev.withColumn("prev_type", F.lag("event_type").over(order))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.col("event_id").alias("from_event_id"),
        )
    )
    close = W.partitionBy("user_id").orderBy("valid_from", "from_event_id")
    return episodes.withColumn(
        "valid_to", F.lead("valid_from").over(close)
    ).withColumn("is_current", F.col("valid_to").isNull())


@query(
    "scd2_intervals",
    _DUCK_SCD2,
    tags=["warehouse", "scd2", "window", "intervals"],
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a state-change log → SCD Type-2 validity intervals per
    user. See module docstring (change detection + interval closing,
    one shuffle, duplicate-state suppression)."""
    return scd2_intervals_from(load_table(spark, "events", sf_dir))
