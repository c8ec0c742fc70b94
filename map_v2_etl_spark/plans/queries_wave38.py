"""Wave-38 surface: distribution drift monitoring.

* distribution_drift — the train/serve (or week-over-week) drift check
  every production model pipeline runs: per event type, the value
  distribution of the fixture's first half (ts ≤ Jan 16) is compared
  against the second half on a FIXED equal-width binning, and the L1
  histogram distance (total variation × 2) is reported in parts per
  million — plus the single most-drifted bin. Fixed literal bins (not
  learned quantiles) are the production choice for drift: the binning
  must be identical across the compared snapshots or the comparison
  measures the binning, not the data (learned per-snapshot edges are
  exactly quantile_binning, wave-35 — complementary, not a substitute).

  Exactness discipline (the media_near_dups integer-L1 trick): with
  per-bin counts c and totals n, Σ|c_a·n_b − c_b·n_a| is exact
  integer arithmetic; ppm = (num · 10^6) intdiv (n_a·n_b) stays
  integer end-to-end — no float proportions, no summation-order
  dependence, identical in both engines. The most-drifted bin breaks
  ties toward the lower bin id (explicit rank order), so even a
  symmetric fixture hashes deterministically. The cross-products run
  in DECIMAL(38,0) on Spark and HUGEINT in DuckDB (r10): int64 would
  silently wrap past ~3M rows per side per group under Spark's
  non-ANSI arithmetic, and 100 TB per-type halves exceed that bound —
  38-digit headroom covers ~10^10 rows per side. The widening costs
  nothing: it applies only to the grid-sized frame (N_BINS × types
  rows), never the full scan.

  Scale: two filtered aggregates over one scan each (bin × type
  grids), a grid-sized join, one grid-sized window — no full-data
  joins, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .registry import query

_SPLIT = "2024-01-16 00:00:00"
_BIN_W = 50.0
_N_BINS = 20

_DUCK_DRIFT = f"""
WITH binned AS (
  SELECT event_type,
         ts <= TIMESTAMP '{_SPLIT}' AS first_half,
         greatest(least(CAST(floor(value / {_BIN_W}) AS INTEGER),
                        {_N_BINS - 1}), 0)
           AS bin
  FROM events WHERE value IS NOT NULL),
grid AS (
  SELECT t.event_type, b.bin,
         coalesce(a.c, 0) AS ca, coalesce(bb.c, 0) AS cb
  FROM (SELECT DISTINCT event_type FROM binned) t
  CROSS JOIN (SELECT unnest(range({_N_BINS})) AS bin) b
  LEFT JOIN (SELECT event_type, bin, count(*) AS c FROM binned
             WHERE first_half GROUP BY 1, 2) a
    ON a.event_type = t.event_type AND a.bin = b.bin
  LEFT JOIN (SELECT event_type, bin, count(*) AS c FROM binned
             WHERE NOT first_half GROUP BY 1, 2) bb
    ON bb.event_type = t.event_type AND bb.bin = b.bin),
tot AS (
  SELECT event_type, sum(ca) AS na, sum(cb) AS nb FROM grid
  GROUP BY event_type),
d AS (
  SELECT g.event_type, g.bin,
         abs(CAST(g.ca AS HUGEINT) * t.nb
             - CAST(g.cb AS HUGEINT) * t.na) AS diff, t.na, t.nb
  FROM grid g JOIN tot t ON t.event_type = g.event_type),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY diff DESC, bin) AS rn
  FROM d)
SELECT event_type,
       CAST(max(na) AS BIGINT) AS n_first,
       CAST(max(nb) AS BIGINT) AS n_second,
       CAST((sum(diff) * 1000000)
            // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT)
         AS l1_ppm,
       CAST(max(CASE WHEN rn = 1 THEN bin END) AS INTEGER)
         AS most_drifted_bin
FROM ranked GROUP BY event_type
"""


@query(
    "distribution_drift",
    _DUCK_DRIFT,
    tags=["drift", "monitoring", "histogram", "ml-ops"],
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type first-half vs second-half value-distribution drift
    (module docstring)."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("value").isNotNull()
    )
    binned = ev.select(
        "event_type",
        (F.col("ts") <= F.lit(_SPLIT).cast("timestamp_ntz")).alias(
            "first_half"
        ),
        # clamp BOTH ends: values past the top land in the last bin,
        # negatives in the first — an unclamped negative bin would fall
        # out of the 0..N grid join and silently vanish from the totals
        F.greatest(
            F.least(
                F.floor(F.col("value") / _BIN_W).cast("int"),
                F.lit(_N_BINS - 1),
            ),
            F.lit(0),
        ).alias("bin"),
    )
    bins = spark.range(_N_BINS).select(F.col("id").cast("int").alias("bin"))
    halves = binned.groupBy("event_type", "bin").agg(
        F.sum(F.col("first_half").cast("int")).alias("ca"),
        F.sum((~F.col("first_half")).cast("int")).alias("cb"),
    )
    # the type list is derivable from the group-sized aggregate — a
    # distinct over `binned` would scan the source a second time
    types = halves.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bins))
        .join(halves, ["event_type", "bin"], "left")
        .fillna(0, ["ca", "cb"])
    )
    tot = W.partitionBy("event_type")
    d = grid.select(
        "event_type",
        "bin",
        "ca",
        "cb",
        F.sum("ca").over(tot).alias("na"),
        F.sum("cb").over(tot).alias("nb"),
    ).withColumn(
        # DECIMAL(38,0) cross-products: exact far past the int64 wrap
        # point (module docstring) — the frame is grid-sized, so the
        # widening is free
        "diff",
        F.abs(
            F.col("ca").cast("decimal(38,0)") * F.col("nb")
            - F.col("cb").cast("decimal(38,0)") * F.col("na")
        ),
    )
    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.desc("diff"), "bin")
    )
    return (
        d.withColumn("rn", rn)
        .groupBy("event_type")
        .agg(
            F.max("na").cast("bigint").alias("n_first"),
            F.max("nb").cast("bigint").alias("n_second"),
            F.expr(
                "(sum(diff) * 1000000)"
                " DIV (CAST(max(na) AS DECIMAL(38,0)) * max(nb))"
            )
            .cast("bigint")
            .alias("l1_ppm"),
            F.max(F.when(F.col("rn") == 1, F.col("bin")))
            .cast("int")
            .alias("most_drifted_bin"),
        )
    )
