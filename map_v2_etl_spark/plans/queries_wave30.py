"""Wave-30 surface: Merkle-style segment-checksum replica reconciliation.

* replica_merkle_diff — the production pattern for diffing two copies
  of a 100 TB keyed table WITHOUT comparing every row across the wire:

    1. each replica folds every row into a per-SEGMENT checksum
       (order-insensitive bit_xor of a row hash; segments = key ranges)
       — one map-side-combining aggregate per replica, the only stage
       that touches full data;
    2. the segment summaries (bounded: #populated-segments rows)
       compare checksum + count — matching segments are PROVEN equal
       (up to hash collision) and never rescanned;
    3. only MISMATCHED segments drill down to the per-key diff — the
       expensive key-level full-outer join runs on the pruned subset.

  Replica A is the LWW state of the events table; replica B is A with
  a SPARSE deterministic divergence — the realistic reconciliation
  scenario (a replica that missed a handful of updates / suffered a
  corruption, not one that lags on every key): ~1/13 of keys carry a
  corrupted payload, ~1/17 were never replicated, and B holds one row
  A lacks. Sparse divergence is what makes the protocol WORTH running:
  most segments checksum-match and prune (pinned in tests); a
  time-lagged replica diverging on ~95% of keys would force a full
  drill-down — for that shape, diff the snapshots directly
  (snapshot_diff, wave-28).

  Output: one row per differing key with its segment and a status in
  {only_a, only_b, changed}.

  Engine-portable checksum discipline: the row hash is the md5-prefix
  hash60 over a '|'-joined rendering in which the DOUBLE value rides
  as DECIMAL(20,4) text (raw double->string formatting differs between
  engines; decimal text is the repo's established cross-engine final),
  NULLs as a sentinel. bit_xor is order-insensitive and cannot
  overflow, so the checksum is identical in any engine and any row
  order — what lets the DuckDB oracle replay the whole protocol.

  Scale notes: segments are keyed by ``user_id % 256`` — a fixed
  segment COUNT here for oracle brevity; production fixes the segment
  SIZE and recurses (Merkle tree), but one level demonstrates the plan
  shape. The drill-down filter is a broadcast semi-join on the
  mismatched segment ids (bounded by the segment count); a healthy
  replica pair prunes everything and stage 3 is empty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

_N_SEG = 256
#: sparse-divergence knobs: keys ≡0 (mod 13) carry a corrupted payload
#: in B; keys ≡0 (mod 17) are missing from B; B has one extra key (-1)
_CORRUPT_MOD = 13
_MISSING_MOD = 17

_ROW_HASH_SQL = (
    "CAST(('0x'||substr(md5("
    "CAST(user_id AS VARCHAR) || '|' || event_type || '|' || "
    "COALESCE(CAST(CAST(value AS DECIMAL(20,4)) AS VARCHAR), '<null>')"
    "),1,15)) AS BIGINT)"
)

_DUCK_MERKLE = f"""
WITH a_state AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  WHERE rn = 1 AND event_type <> 'error'),
b_state AS (
  SELECT user_id,
         CASE WHEN user_id % {_CORRUPT_MOD} = 0 THEN 'corrupted'
              ELSE event_type END AS event_type,
         value
  FROM a_state WHERE user_id % {_MISSING_MOD} <> 0
  UNION ALL
  SELECT CAST(-1 AS BIGINT), 'synthetic', CAST(0.0 AS DOUBLE)),
a_rows AS (
  SELECT user_id, user_id % {_N_SEG} AS seg, {_ROW_HASH_SQL} AS rh
  FROM a_state),
b_rows AS (
  SELECT user_id, user_id % {_N_SEG} AS seg, {_ROW_HASH_SQL} AS rh
  FROM b_state),
a_seg AS (SELECT seg, bit_xor(rh) AS cks, count(*) AS n FROM a_rows GROUP BY seg),
b_seg AS (SELECT seg, bit_xor(rh) AS cks, count(*) AS n FROM b_rows GROUP BY seg),
bad AS (
  SELECT COALESCE(a.seg, b.seg) AS seg
  FROM a_seg a FULL OUTER JOIN b_seg b ON a.seg = b.seg
  WHERE a.seg IS NULL OR b.seg IS NULL
     OR a.cks <> b.cks OR a.n <> b.n)
SELECT COALESCE(a.user_id, b.user_id) AS user_id,
       COALESCE(a.seg, b.seg) AS seg,
       CASE WHEN b.user_id IS NULL THEN 'only_a'
            WHEN a.user_id IS NULL THEN 'only_b'
            ELSE 'changed' END AS status
FROM (SELECT * FROM a_rows WHERE seg IN (SELECT seg FROM bad)) a
FULL OUTER JOIN
     (SELECT * FROM b_rows WHERE seg IN (SELECT seg FROM bad)) b
  ON a.user_id = b.user_id
WHERE a.user_id IS NULL OR b.user_id IS NULL OR a.rh <> b.rh
"""


# the LWW read-state semantics live in ONE place (queries_wave28);
# re-stating them here is the drift surface the r9 review flagged
from .queries_wave28 import _lww_state  # noqa: E402


def _perturbed_replica(a_state: DataFrame) -> DataFrame:
    """Replica B: A with the sparse deterministic divergence described
    in the module docstring (corrupted payloads, missing keys, one
    extra key)."""
    spark = a_state.sparkSession
    extra = spark.createDataFrame(
        [(-1, "synthetic", 0.0)], a_state.schema
    )
    return (
        a_state.filter(F.col("user_id") % _MISSING_MOD != 0)
        .withColumn(
            "event_type",
            F.when(
                F.col("user_id") % _CORRUPT_MOD == 0, F.lit("corrupted")
            ).otherwise(F.col("event_type")),
        )
        .unionByName(extra)
    )


def _row_hash() -> Column:
    """Engine-portable row checksum input (module docstring); the
    60-bit md5 hash itself is operators.sketches.hash60."""
    from ..operators.sketches import hash60

    rendered = F.concat_ws(
        "|",
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.coalesce(
            F.col("value").cast("decimal(20,4)").cast("string"),
            F.lit("<null>"),
        ),
    )
    return hash60(rendered)


def _segmented(state: DataFrame) -> DataFrame:
    # plain % (not pmod) on both engines: C-style remainder, so the
    # synthetic -1 key lands in segment -1 identically in Spark/DuckDB
    return state.select(
        "user_id",
        (F.col("user_id") % _N_SEG).alias("seg"),
        _row_hash().alias("rh"),
    )


def _seg_summary(rows: DataFrame) -> DataFrame:
    return rows.groupBy("seg").agg(
        F.bit_xor("rh").alias("cks"), F.count("*").alias("n")
    )


@query(
    "replica_merkle_diff",
    _DUCK_MERKLE,
    tags=["reconciliation", "merkle", "checksum", "diff"],
)
def q_replica_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-checksum replica reconciliation (module docstring):
    summarize → compare → drill down only into mismatched segments."""
    ev = load_table(spark, "events", sf_dir)
    # In production the replicas are STORED TABLES; this fixture
    # derives them from the log, so materialize each derived row set
    # once (key-sized: one row per visible key). Without this the
    # summary AND drill-down stages each replay the full log->state
    # aggregation per replica — measured 8 scans / 18 exchanges for a
    # protocol whose whole point is one data pass per replica.
    a_state = _lww_state(ev).localCheckpoint(eager=True)
    a_rows = _segmented(a_state).localCheckpoint(eager=True)
    b_rows = _segmented(_perturbed_replica(a_state)).localCheckpoint(
        eager=True
    )
    a_seg = _seg_summary(a_rows).alias("sa")
    b_seg = _seg_summary(b_rows).alias("sb")
    bad = (
        a_seg.join(b_seg, F.col("sa.seg") == F.col("sb.seg"), "full_outer")
        .filter(
            F.col("sa.seg").isNull()
            | F.col("sb.seg").isNull()
            | (F.col("sa.cks") != F.col("sb.cks"))
            | (F.col("sa.n") != F.col("sb.n"))
        )
        .select(F.coalesce("sa.seg", "sb.seg").alias("bad_seg"))
    )
    # drill-down: broadcast the (bounded, <= segment-count rows)
    # mismatched segment list as a semi-join filter onto both replicas
    # — matching segments are never rescanned at key granularity
    a_bad = a_rows.join(
        F.broadcast(bad), a_rows["seg"] == bad["bad_seg"], "left_semi"
    ).alias("a")
    b_bad = b_rows.join(
        F.broadcast(bad), b_rows["seg"] == bad["bad_seg"], "left_semi"
    ).alias("b")
    return (
        a_bad.join(
            b_bad, F.col("a.user_id") == F.col("b.user_id"), "full_outer"
        )
        .filter(
            F.col("a.user_id").isNull()
            | F.col("b.user_id").isNull()
            | (F.col("a.rh") != F.col("b.rh"))
        )
        .select(
            F.coalesce("a.user_id", "b.user_id").alias("user_id"),
            F.coalesce("a.seg", "b.seg").alias("seg"),
            F.when(F.col("b.user_id").isNull(), F.lit("only_a"))
            .when(F.col("a.user_id").isNull(), F.lit("only_b"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )
