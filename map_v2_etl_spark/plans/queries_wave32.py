"""Wave-32 surface: interval analytics — merged coverage and peak
concurrency (the gaps-and-islands / sweep-line family).

Both queries lift each event to a fixed 10-minute activity interval
[ts, ts+600s) and analyze the interval SET — the operations behind
occupancy dashboards, license-seat sizing, and SLA "concurrent
sessions" billing:

* interval_coverage — per user, the UNION length of their activity
  intervals (overlaps counted once) and the number of disjoint activity
  islands. Gaps-and-islands as pure window algebra: an interval opens a
  new island iff its start exceeds the running max end of everything
  before it (ROWS frame ending at 1 PRECEDING over a (start, event_id)
  total order), island ids are the running sum of those flags, and
  coverage per island is max(end) − min(start). One shuffle (user
  partitions); no self-join, no explode-per-second.

* peak_concurrency — per event type, the maximum number of
  simultaneously open intervals: the classic sweep — each interval
  contributes (+1 at start, −1 at end) boundary rows, a running sum
  ordered by (t, delta) walks the boundary sequence, the peak is its
  max. Half-open semantics ride the ORDER: delta −1 sorts before +1 at
  equal t, so an interval ending exactly when another starts never
  counts as overlap. The default RANGE...CURRENT ROW window frame
  includes ALL peer rows (both engines, SQL standard), which keeps the
  running sum deterministic under ties — and the peak exact, because
  within a peer group the prefix sums are monotone (all deltas equal),
  so every group-boundary value the true sweep visits is a window
  value some row carries.

Determinism/TZ discipline: event times convert to INTEGER epoch
microseconds up front (Spark ``unix_micros`` on the instant ↔ DuckDB
``epoch_us``; both truncate the source's nanos identically), so every
comparison, subtraction, and window order is integer arithmetic — no
session-timezone dependence (the r6 TZ-sweep class), no float drift.

Scale: both plans are one shuffle on their analysis key plus windows
inside the partition. Interval sets per key are the user's own events —
bounded; the sweep's boundary table is exactly 2 rows per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pyspark.sql import types as T

from ..sources.registry import load_table
from .registry import query

#: activity interval length: 10 minutes in microseconds
_IV_US = 600_000_000


def _epoch_us(df: DataFrame, col: str = "ts"):
    """Event time as integer epoch microseconds, matching DuckDB's
    ``epoch_us``: NTZ columns go through the wall-clock-as-UTC
    timestampdiff idiom (streaming/ts.py — names no timezone), instant
    columns through unix_micros. Both truncate sub-microsecond."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    return F.unix_micros(col)

_DUCK_COVERAGE = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_IV_US} AS e
  FROM events),
o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax,
         event_id
  FROM iv),
fl AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nf
  FROM o),
isl AS (
  SELECT user_id, s, e,
         sum(nf) OVER (PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS iid
  FROM fl),
per AS (
  SELECT user_id, iid, max(e) - min(s) AS cov
  FROM isl GROUP BY user_id, iid)
SELECT user_id, CAST(count(*) AS INTEGER) AS n_islands,
       CAST(sum(cov) AS BIGINT) AS covered_us
FROM per GROUP BY user_id
"""


def coverage_from_intervals(
    iv: DataFrame, key: str = "user_id", tie: str = "event_id"
) -> DataFrame:
    """Gaps-and-islands over interval rows (key, tie, s, e) → per-key
    (n_islands, covered_us). Extracted so the property tests can drive
    it over hypothesis-generated interval sets."""
    order = W.partitionBy(key).orderBy("s", tie)
    o = iv.withColumn(
        "pmax",
        F.max("e").over(order.rowsBetween(W.unboundedPreceding, -1)),
    )
    fl = o.withColumn(
        "nf",
        F.when(
            F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
        ).otherwise(0),
    )
    isl = fl.withColumn(
        "iid",
        F.sum("nf").over(order.rowsBetween(W.unboundedPreceding, 0)),
    )
    per = isl.groupBy(key, "iid").agg(
        (F.max("e") - F.min("s")).alias("cov")
    )
    return per.groupBy(key).agg(
        F.count("*").cast("int").alias("n_islands"),
        F.sum("cov").cast("bigint").alias("covered_us"),
    )


@query(
    "interval_coverage",
    _DUCK_COVERAGE,
    tags=["intervals", "islands", "window", "analytics"],
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user merged-interval coverage via gaps-and-islands windows
    (module docstring)."""
    ev = load_table(spark, "events", sf_dir)
    t_us = _epoch_us(ev)
    iv = ev.select(
        "user_id",
        "event_id",
        t_us.alias("s"),
        (t_us + F.lit(_IV_US)).alias("e"),
    )
    return coverage_from_intervals(iv)


_DUCK_PEAK = f"""
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s, epoch_us(ts) + {_IV_US} AS e
  FROM events),
b AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv),
r AS (
  SELECT event_type,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d) AS conc
  FROM b),
pk AS (SELECT event_type, max(conc) AS peak FROM r GROUP BY event_type),
n AS (SELECT event_type, count(*) AS n_iv FROM iv GROUP BY event_type)
SELECT pk.event_type, CAST(pk.peak AS INTEGER) AS peak_concurrent,
       CAST(n.n_iv AS BIGINT) AS n_intervals
FROM pk JOIN n ON n.event_type = pk.event_type
"""


def peak_from_intervals(iv: DataFrame, key: str) -> DataFrame:
    """Boundary sweep over interval rows (key, s, e) → per-key
    (peak_concurrent, n_intervals). Extracted for the property tests."""
    b = iv.select(
        key, F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        iv.select(key, F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    # default frame with ORDER BY = RANGE ... CURRENT ROW, peer-
    # inclusive in both engines (the determinism argument in the
    # module docstring relies on it)
    running = F.sum("d").over(W.partitionBy(key).orderBy("t", "d"))
    r = b.withColumn("conc", running)
    # interval count derived from the boundary rows themselves (each
    # interval contributes exactly one d=+1 row) — a separate count
    # aggregate over `iv` would re-scan the source a third time
    return r.groupBy(key).agg(
        F.max("conc").cast("int").alias("peak_concurrent"),
        F.sum(((F.col("d") + 1) / 2).cast("int"))
        .cast("bigint")
        .alias("n_intervals"),
    )


@query(
    "peak_concurrency",
    _DUCK_PEAK,
    tags=["intervals", "sweep-line", "window", "analytics"],
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type peak concurrent intervals via the boundary sweep
    (module docstring)."""
    ev = load_table(spark, "events", sf_dir)
    t_us = _epoch_us(ev)
    iv = ev.select(
        "event_type",
        t_us.alias("s"),
        (t_us + F.lit(_IV_US)).alias("e"),
    )
    return peak_from_intervals(iv, "event_type")
