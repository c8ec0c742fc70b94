"""Wave-36 surface: journey transition matrices and LOCF imputation.

* event_transition_matrix — the first-order Markov view of user
  journeys: consecutive event pairs per user ((ts, event_id)-ordered
  lag), counted into a (from_type → to_type) transition matrix with
  row-normalized probabilities. The product-analytics primitive behind
  "what do users do after X" and journey-graph visualizations; journey
  ends contribute nothing (lag semantics), and the probability is one
  float division rounded to 6 (the house pattern) off exact integer
  counts.

* locf_fill — last-observation-carried-forward imputation onto a
  DENSE daily grid: per user, each calendar day of the fixture span
  gets the day's LAST observed value (by (ts, event_id)), and silent
  days inherit the most recent prior observation via
  ``last_value(... IGNORE NULLS)`` over the date order — the standard
  sensor/price panel regularization. Days before a user's first
  observation stay NULL (nothing to carry). Carried values are RAW
  column values (no arithmetic), so the only determinism requirement
  is the pick order, which the (ts, event_id) total order fixes; the
  grid is literal-bounded (the fixture's January span — the
  cdc_time_travel cutoff idiom), so the plan is data-independent.

Scale: the transition matrix is one user-partitioned lag window + a
(type × type)-sized aggregate. LOCF is a per-user day aggregate
(map-combining max_by), a grid cross join (users × 30 literal days —
the sequence()+explode dense-grid discipline of
events_resample_gapfill), and one carry-forward window per user —
no self-joins, no per-gap scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# event_transition_matrix
# --------------------------------------------------------------------------

_DUCK_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
t AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
r AS (SELECT from_type, sum(n) AS row_n FROM t GROUP BY from_type)
SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
       ROUND(CAST(t.n AS DOUBLE) / CAST(r.row_n AS DOUBLE), 6) AS prob
FROM t JOIN r ON r.from_type = t.from_type
"""


@query(
    "event_transition_matrix",
    _DUCK_TRANSITIONS,
    tags=["events", "markov", "transitions", "analytics"],
)
def q_event_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order journey transition matrix (module docstring)."""
    ev = load_table(spark, "events", sf_dir)
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(order).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    t = seq.groupBy(
        "from_type", F.col("event_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    row_n = F.sum("n").over(W.partitionBy("from_type"))
    return t.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("n").cast("double") / row_n.cast("double"), 6
        ).alias("prob"),
    )


# --------------------------------------------------------------------------
# locf_fill
# --------------------------------------------------------------------------

#: the fixture's calendar span (events are 2024-01-01..30 at every SF —
#: the cdc_time_travel literal-cutoff idiom)
_GRID_FROM = "2024-01-01"
_GRID_TO = "2024-01-30"

_DUCK_LOCF = f"""
WITH days AS (
  SELECT strftime(d, '%Y-%m-%d') AS day
  FROM generate_series(DATE '{_GRID_FROM}', DATE '{_GRID_TO}',
                       INTERVAL 1 DAY) AS t(d)),
users AS (SELECT DISTINCT user_id FROM events),
obs AS (
  SELECT user_id, day, value AS day_value FROM (
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, value,
           row_number() OVER (
             PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE value IS NOT NULL)
  WHERE rn = 1),
grid AS (
  SELECT u.user_id, d.day, o.day_value
  FROM users u CROSS JOIN days d
  LEFT JOIN obs o ON o.user_id = u.user_id AND o.day = d.day)
SELECT user_id, day,
       last_value(day_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY day) AS filled_value,
       day_value IS NOT NULL AS was_observed
FROM grid
"""


@query(
    "locf_fill",
    _DUCK_LOCF,
    tags=["timeseries", "imputation", "locf", "gapfill"],
)
def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid with last-observation-carried-forward values
    (module docstring)."""
    ev = load_table(spark, "events", sf_dir)
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_GRID_FROM).cast("date"),
                F.lit(_GRID_TO).cast("date"),
            )
        ).alias("d")
    ).select(F.date_format("d", "yyyy-MM-dd").alias("day"))
    users = ev.select("user_id").distinct()
    obs = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.max_by("value", F.struct("ts", "event_id")).alias(
                "day_value"
            )
        )
    )
    grid = users.crossJoin(F.broadcast(days)).join(
        obs, ["user_id", "day"], "left"
    )
    carry = W.partitionBy("user_id").orderBy("day")
    return grid.select(
        "user_id",
        "day",
        F.last("day_value", ignorenulls=True)
        .over(carry)
        .alias("filled_value"),
        F.col("day_value").isNotNull().alias("was_observed"),
    )
