"""Wave-28 surface: KMV sketch set algebra and snapshot change-data-feed.

Both extend the engine along the r6-VERDICT "new plan shapes" axis (the
reference, /root/reference, has neither — its surface is a bounded
CSV/GeoJSON tile ETL):

* kmv_sketch_sets — mergeable bottom-k (KMV / theta-style) distinct
  sketches with UNION and INTERSECTION estimation
  (operators/sketches.py): per order-month sketches of the active
  customer set, merged pairwise into audience-overlap estimates —
  "how many customers ordered in BOTH March and July?". This is the
  set operation the HLL surface (hll_merge_rollup) structurally cannot
  answer: HLL unions perfectly but inclusion-exclusion on its
  estimates compounds error against a small intersection. The whole
  estimator is deterministic (md5-prefix hashes, fixed-parenthesization
  double arithmetic), so the ESTIMATES value-hash certify against a
  DuckDB oracle computing the identical sketch — an approximate
  operator under an exact correctness gate. Accuracy vs ground truth
  is pinned separately in tests/test_wave28.py (5σ on every estimate).

  Plan shape: distinct → per-group bottom-k window → sketch rows only
  from there on (pair stage costs O(pairs · k), data-independent).

* snapshot_diff — the change-data-feed DERIVATION: given the LWW table
  states at two cutoffs T1 < T2 (same per-user last-event semantics as
  cdc_time_travel / stream_foreach_batch_upsert), emit per-key ops
  {insert, update, delete} with before/after images — what
  Delta/Iceberg CDF readers serve, computed here from snapshots by a
  single full-outer diff join. Tombstone semantics carried from
  wave-21: a key whose latest event ≤ T2 is 'error' reads as ABSENT,
  so a T1-visible key deleted by T2 emits a delete row with its
  before-image. unchanged keys are filtered with null-safe equality
  (values may legitimately be NULL).

  Plan shape: two key-sized LWW aggregates (the raw log collapses
  map-side) → one full-outer shuffle join on the key → null-safe
  change filter. At 100 TB the join carries per-key state only, never
  the log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# kmv_sketch_sets
# --------------------------------------------------------------------------

#: sketch size: 150-170 distinct customers per month at cert scale keeps
#: k=64 sketches FULL (the estimator regime actually exercises; k above
#: the per-group cardinality would certify only the trivial exact path)
_KMV_K = 64
from ..operators.sketches import KMV_M as _KMV_M  # noqa: E402

# the oracle computes the IDENTICAL sketch: same md5-prefix hash, same
# bottom-k ranks over distinct hashes, same (k-1)*(M/kth) double
# parenthesization, same positive-half-up rounding
_DUCK_KMV = f"""
WITH h AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS g,
         CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15)) AS BIGINT) AS h
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
sk AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h)
  WHERE rn <= {_KMV_K}),
st AS (SELECT g, count(*) AS n_sk, max(h) AS kth FROM sk GROUP BY g),
pairs AS (
  SELECT a.g AS ga, a.n_sk AS n_a, a.kth AS kth_a,
         b.g AS gb, b.n_sk AS n_b, b.kth AS kth_b
  FROM st a JOIN st b ON a.g < b.g),
tagged AS (
  SELECT p.ga, p.gb, s.h, 1 AS in_a, 0 AS in_b
  FROM pairs p JOIN sk s ON s.g = p.ga
  UNION ALL
  SELECT p.ga, p.gb, s.h, 0 AS in_a, 1 AS in_b
  FROM pairs p JOIN sk s ON s.g = p.gb),
merged AS (
  SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b
  FROM tagged GROUP BY ga, gb, h),
u AS (
  SELECT ga, gb, count(*) AS n_u, max(h) AS kth_u,
         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS c_ab
  FROM (SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
        FROM merged)
  WHERE rn <= {_KMV_K} GROUP BY ga, gb),
est AS (
  SELECT p.ga, p.gb, u.n_u, u.c_ab,
    CASE WHEN p.n_a < {_KMV_K} THEN CAST(p.n_a AS DOUBLE)
         ELSE {_KMV_K - 1}.0 * ({_KMV_M!r} / CAST(p.kth_a AS DOUBLE)) END AS ea,
    CASE WHEN p.n_b < {_KMV_K} THEN CAST(p.n_b AS DOUBLE)
         ELSE {_KMV_K - 1}.0 * ({_KMV_M!r} / CAST(p.kth_b AS DOUBLE)) END AS eb,
    CASE WHEN u.n_u < {_KMV_K} THEN CAST(u.n_u AS DOUBLE)
         ELSE {_KMV_K - 1}.0 * ({_KMV_M!r} / CAST(u.kth_u AS DOUBLE)) END AS eu
  FROM pairs p JOIN u ON u.ga = p.ga AND u.gb = p.gb)
SELECT ga AS group_a, gb AS group_b,
  CAST(ROUND(ea) AS BIGINT) AS est_a,
  CAST(ROUND(eb) AS BIGINT) AS est_b,
  CAST(ROUND(eu) AS BIGINT) AS est_union,
  CASE WHEN n_u < {_KMV_K} THEN CAST(c_ab AS BIGINT)
       ELSE CAST(ROUND(CAST(c_ab AS DOUBLE) * (eu / {_KMV_K}.0)) AS BIGINT)
  END AS est_intersect
FROM est
"""


@query(
    "kmv_sketch_sets",
    _DUCK_KMV,
    tags=["sketch", "kmv", "distinct", "set-algebra"],
)
def q_kmv_sketch_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly active-customer KMV sketches → pairwise union/intersect
    estimates (module docstring). 1995 only: 12 groups, 66 pairs."""
    from ..operators import sketches as S

    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    months = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_custkey"
    )
    sk = S.kmv_sketch(months, "month", "o_custkey", _KMV_K)
    return S.kmv_pair_estimates(sk, "month", _KMV_K)


# --------------------------------------------------------------------------
# snapshot_diff
# --------------------------------------------------------------------------

#: diff window inside the events table's 2024-01-01..30 span (same
#: NTZ-literal idiom as cdc_time_travel — no session-TZ dependence)
_T1 = "2024-01-12 00:00:00"
_T2 = "2024-01-22 00:00:00"

_DUCK_DIFF = f"""
WITH r1 AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_T1}'),
s1 AS (SELECT user_id, event_type, value FROM r1
       WHERE rn = 1 AND event_type <> 'error'),
r2 AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_T2}'),
s2 AS (SELECT user_id, event_type, value FROM r2
       WHERE rn = 1 AND event_type <> 'error')
SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
  CASE WHEN s1.user_id IS NULL THEN 'insert'
       WHEN s2.user_id IS NULL THEN 'delete'
       ELSE 'update' END AS op,
  s1.event_type AS before_type, s1.value AS before_value,
  s2.event_type AS after_type,  s2.value AS after_value
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
WHERE s1.user_id IS NULL OR s2.user_id IS NULL
   OR NOT (s1.event_type IS NOT DISTINCT FROM s2.event_type
           AND s1.value IS NOT DISTINCT FROM s2.value)
"""


def _lww_state(ev: DataFrame, cutoff: str | None = None) -> DataFrame:
    """Visible LWW state, optionally as of a cutoff: per-user latest
    (event_type, value) by (ts, event_id), tombstones ('error' latest)
    absent — the read semantics shared with cdc_time_travel
    (queries_wave21). The ONE canonical copy: wave-30's replica
    reconciliation imports it rather than re-stating the semantics."""
    if cutoff is not None:
        ev = ev.filter(F.col("ts") <= F.lit(cutoff).cast("timestamp_ntz"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_type", "value"), F.struct("ts", "event_id")
            ).alias("s")
        )
        .filter(F.col("s.event_type") != "error")
        .select("user_id", "s.event_type", "s.value")
    )


@query("snapshot_diff", _DUCK_DIFF, tags=["cdc", "diff", "change-data-feed"])
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between the LWW states at T1 and T2 (module
    docstring): full-outer diff join emitting insert/update/delete rows
    with before/after images; unchanged keys drop via null-safe
    equality."""
    ev = load_table(spark, "events", sf_dir)
    s1 = _lww_state(ev, _T1).select(
        "user_id",
        F.col("event_type").alias("before_type"),
        F.col("value").alias("before_value"),
    )
    s2 = _lww_state(ev, _T2).select(
        F.col("user_id").alias("user_id2"),
        F.col("event_type").alias("after_type"),
        F.col("value").alias("after_value"),
    )
    joined = s1.join(
        s2, s1["user_id"] == s2["user_id2"], "full_outer"
    )
    unchanged = F.col("before_type").eqNullSafe(F.col("after_type")) & F.col(
        "before_value"
    ).eqNullSafe(F.col("after_value"))
    return (
        joined.filter(
            F.col("user_id").isNull()
            | F.col("user_id2").isNull()
            | ~unchanged
        )
        .select(
            F.coalesce("user_id", "user_id2").alias("user_id"),
            F.when(F.col("user_id").isNull(), F.lit("insert"))
            .when(F.col("user_id2").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
            "before_type",
            "before_value",
            "after_type",
            "after_value",
        )
    )
