"""Wave-34 surface: time-series finance/IoT primitives — time-weighted
averages and OHLC resampling.

* time_weighted_avg — per-user TWAP of the step function "value holds
  from its event until the next event": Σ value_i · (ts_{i+1} − ts_i)
  over [first_ts, last_ts], divided by the span. The metric billing
  and TWAP/TWAA systems compute when samples arrive irregularly — a
  plain AVG over-weights bursts. Exactness discipline: durations are
  integer epoch microseconds (wave-32's dtype-aware helper), values
  ride as DECIMAL(20,4), so Σ value·dur is an EXACT scale-4 decimal in
  both engines regardless of summation order (float Σ would be
  order-nondeterministic across engines); the final division is float
  and ROUNDED to 6 decimals (the tfidf/pmi house pattern) because the
  two engines' huge-DECIMAL→double conversions were measured 1 ulp
  apart (Spark converts correctly-rounded via BigDecimal; DuckDB's
  int128/10^scale path double-rounds). NULL-valued events
  are excluded up front (a NULL segment has no definable hold value);
  single-event users yield NULL twap (zero span, NULLIF-guarded).

* resample_ohlc — per (day × event_type) OHLC bars: open/close = value
  at the (ts, event_id)-first/last event of the bucket, high/low =
  extremes, n = count. The classic irregular→bar resample. First/last
  are window row_numbers over the full (ts, event_id) total order —
  deterministic under timestamp ties — rather than engine-specific
  argmin/argmax variants; the day key uses the certified
  date_format/strftime wall-clock idiom (UTC-pinned engine session /
  NTZ bare session — both TZ-free, the r6 sweep class).

Scale: TWAP is one user-partitioned window (lead) + one aggregate;
OHLC is one window over (day, type) partitions + one aggregate. No
joins, no data-dependent driver work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .queries_wave32 import _epoch_us
from .registry import query

_DEC = "decimal(20,4)"

_DUCK_TWAP = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CAST(value AS DECIMAL(20,4)) AS v
  FROM events WHERE value IS NOT NULL),
seg AS (
  SELECT user_id, v,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
           AS dur
  FROM ev),
agg AS (
  SELECT user_id,
         sum(v * dur) AS wsum,
         sum(dur) AS span,
         count(*) AS n_ev
  FROM seg WHERE dur IS NOT NULL GROUP BY user_id)
SELECT user_id,
       ROUND(CAST(wsum AS DOUBLE) / CAST(NULLIF(span, 0) AS DOUBLE), 6)
         AS twap,
       CAST(span AS BIGINT) AS span_us,
       CAST(n_ev + 1 AS BIGINT) AS n_events
FROM agg
"""


@query(
    "time_weighted_avg",
    _DUCK_TWAP,
    tags=["timeseries", "twap", "window"],
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the held value (module
    docstring)."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("value").isNotNull()
    )
    base = ev.select(
        "user_id",
        _epoch_us(ev).alias("t"),
        "event_id",
        F.col("value").cast(_DEC).alias("v"),
    )
    order = W.partitionBy("user_id").orderBy("t", "event_id")
    seg = base.withColumn("dur", F.lead("t").over(order) - F.col("t"))
    agg = (
        seg.filter(F.col("dur").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("v") * F.col("dur")).alias("wsum"),
            F.sum("dur").alias("span"),
            F.count("*").alias("n_ev"),
        )
    )
    return agg.select(
        "user_id",
        F.round(
            F.col("wsum").cast("double")
            / F.nullif(F.col("span"), F.lit(0)).cast("double"),
            6,
        ).alias("twap"),
        F.col("span").cast("bigint").alias("span_us"),
        (F.col("n_ev") + 1).cast("bigint").alias("n_events"),
    )


_DUCK_OHLC = """
WITH ev AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value,
         row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), event_type
                            ORDER BY ts, event_id) AS rn_f,
         row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_l
  FROM events WHERE value IS NOT NULL)
SELECT day, event_type,
       CAST(max(CASE WHEN rn_f = 1 THEN value END) AS DOUBLE) AS open,
       CAST(max(value) AS DOUBLE) AS high,
       CAST(min(value) AS DOUBLE) AS low,
       CAST(max(CASE WHEN rn_l = 1 THEN value END) AS DOUBLE) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM ev GROUP BY day, event_type
"""


@query(
    "resample_ohlc",
    _DUCK_OHLC,
    tags=["timeseries", "ohlc", "resample", "window"],
)
def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type (module docstring)."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            "value",
            "ts",
            "event_id",
        )
    )
    part = W.partitionBy("day", "event_type")
    first = part.orderBy("ts", "event_id")
    last = part.orderBy(F.desc("ts"), F.desc("event_id"))
    marked = ev.withColumn(
        "rn_f", F.row_number().over(first)
    ).withColumn("rn_l", F.row_number().over(last))
    return marked.groupBy("day", "event_type").agg(
        F.max(F.when(F.col("rn_f") == 1, F.col("value")))
        .cast("double")
        .alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        F.max(F.when(F.col("rn_l") == 1, F.col("value")))
        .cast("double")
        .alias("close"),
        F.count("*").cast("bigint").alias("n"),
    )
