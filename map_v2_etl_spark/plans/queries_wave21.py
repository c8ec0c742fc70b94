"""Wave-21 surface: snapshot time travel, the manual skew-split join,
and bit-exact weighted sampling.

The reference (/root/reference) has neither; both extend the engine
along VERDICT r6 item 7's axis — NEW PLAN SHAPES rather than new
domains:

* cdc_time_travel — the snapshot-read-with-time-travel twin of
  cdc_apply (queries_wave18.py). cdc_apply compacts the whole log every
  run; real lakehouse tables (Delta/Iceberg, public designs) instead
  keep a VERSIONED SNAPSHOT LOG: version N+1 is computed from snapshot
  N plus only the delta batch, and any historical version stays
  readable ("time travel"). The query materializes snapshot v1 (log up
  to a cutoff), derives v2 INCREMENTALLY (v1 parquet + post-cutoff
  delta only — the full log is never re-scanned for v2), then reads
  both versions back. Tombstones ('error' latest) are RETAINED inside
  snapshots with their merge metadata (ts, event_id) and filtered at
  read time — dropping them at write time would resurrect deleted keys
  on the next merge (the reason Delta keeps tombstones until vacuum).
  The oracle states both versions as full-log LWW windows, so the
  incremental merge is value-hash-proved equivalent to recomputation.

* skew_split_join — the manual hot/cold split join, the pre-AQE (and
  beyond-AQE: runtime stats can miss) pattern for a shuffle join whose
  key distribution is power-law. 75% of fact rows share ONE key
  (l_orderkey % 4 != 0 -> key 1), which in a plain shuffle join lands
  on a single reducer — the canonical 100 TB straggler. The plan
  measures the skew itself (one partial-agg key census, skew-immune
  because partial aggregation combines map-side), splits the fact at a
  hot-key threshold, joins the hot leg against a BROADCAST slice of
  the dim (bounded: at most HOT_MAX keys) and the cold leg through the
  ordinary shuffle, then unions. Same rows either way — the oracle is
  the plain join — but no reducer ever sees the hot key's fact rows
  concentrated. Complements skew_salted_agg (queries_more.py), which
  demonstrates salting for AGGREGATION; this is the JOIN-side
  treatment.

* weighted_sample — sequential Poisson / priority πps sampling
  (Ohlsson 1998): the k smallest u/w win, u an exact dyadic from the
  doc's own id hash, w the byte length — a reproducible size-weighted
  corpus subsample whose ENTIRE float path (power-of-two scaling + one
  IEEE division) is bit-identical across engines, so the sample itself
  is value-hash certified. Plan shape: TakeOrderedAndProject — the
  global top-k that never sorts or shuffles the corpus.

Scale notes: cdc_time_travel's merge shuffles only (snapshot ∪
compacted delta) — per-key state, never the raw log; snapshots are
plain parquet so version reads are partition-pruned FileScans. The
skew census collect is bounded to HOT_MAX keys (loud failure past it);
the broadcast carries at most that many dim rows.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .queries_wave17 import _eager
from .registry import query

DEC = "decimal(20,4)"

#: v1 cutoff inside the events table's 2024-01-01..30 span; string
#: literal cast to the column's own NTZ type — naive wall-clock on both
#: engines, no session-timezone dependence (docs/ROUND6 TZ sweep class)
_CUTOFF = "2024-01-15 00:00:00"

_DUCK_TT = f"""
WITH ranked AS (
  SELECT user_id, event_type, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_CUTOFF}'),
ranked2 AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT CAST(1 AS INTEGER) AS version, user_id,
       event_type AS last_type, value AS last_value
FROM ranked WHERE rn = 1 AND event_type <> 'error'
UNION ALL
SELECT CAST(2 AS INTEGER) AS version, user_id,
       event_type AS last_type, value AS last_value
FROM ranked2 WHERE rn = 1 AND event_type <> 'error'
"""


def _compact(ev: DataFrame) -> DataFrame:
    """Per-user latest event WITH merge metadata (the cdc_apply max_by
    shape, keeping ts/event_id so later batches can merge against it)."""
    return ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("ts", "event_id", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("s")
    ).select("user_id", "s.ts", "s.event_id", "s.event_type", "s.value")


def _read_version(spark: SparkSession, root: str, v: int) -> DataFrame:
    """Time-travel read: snapshot v is a self-contained full state
    (checkpoint-style, not a delta chain); tombstones filter at read."""
    snap = spark.read.parquet(os.path.join(root, f"v={v}"))
    return snap.filter(F.col("event_type") != "error").select(
        F.lit(v).cast("int").alias("version"),
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


@query("cdc_time_travel", _DUCK_TT, tags=["cdc", "snapshot", "time-travel"])
def q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned snapshot log with time travel (module docstring): v1 =
    compacted log ≤ cutoff, v2 = v1 snapshot MERGED with only the
    post-cutoff delta, both versions read back and unioned. The oracle
    recomputes each version from the full log — certifying that the
    incremental merge path is exactly equivalent to recomputation."""
    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    root = tempfile.mkdtemp(prefix="m2e_tt_")
    try:
        v1 = _compact(ev.filter(F.col("ts") <= cutoff))
        v1.write.mode("overwrite").parquet(os.path.join(root, "v=1"))
        delta = _compact(ev.filter(F.col("ts") > cutoff))
        # incremental merge: snapshot ∪ delta, LWW per user on
        # (ts, event_id) — the raw pre-cutoff log is never re-read
        merged = _compact(
            spark.read.parquet(os.path.join(root, "v=1")).unionByName(delta)
        )
        merged.write.mode("overwrite").parquet(os.path.join(root, "v=2"))
        return _eager(
            _read_version(spark, root, 1).unionByName(
                _read_version(spark, root, 2)
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# skew_split_join
# --------------------------------------------------------------------------

#: a key is HOT when it carries more fact rows than this; at 100 TB the
#: threshold is "rows that overwhelm one reducer" (partition-size
#: budget / row width). Sized so exactly the deliberate 75%-key trips
#: it at EVERY test SF (sf0.001's hot key carries ~4.5k rows; no
#: ordinary orderkey exceeds ~7 lineitems at any SF) — the hot leg must
#: actually exercise at the smallest fixture, not only at oracle scale.
HOT_ROWS = 2_000
#: loud upper bound on the hot-key census collect — the broadcast leg
#: must stay dim-slice-sized; a distribution with thousands of hot keys
#: needs salting (skew_salted_agg), not splitting
HOT_MAX = 64

_DUCK_SKEW = (
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
    f"CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_price "
    "FROM lineitem JOIN orders ON "
    "(CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_orderkey END) "
    "= o_orderkey GROUP BY o_orderpriority"
)


@query("skew_split_join", _DUCK_SKEW, tags=["join", "skew", "broadcast"])
def q_skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/cold split join over a deliberately power-law key (module
    docstring): census -> split -> broadcast hot leg ∪ shuffle cold leg
    -> aggregate. The oracle is the PLAIN join — the split must be
    invisible in the result."""
    from ..operators.joins import hot_cold_split_join

    li = load_table(spark, "lineitem", sf_dir).select(
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_extendedprice",
    )
    od = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    joined = hot_cold_split_join(li, od, "k", HOT_ROWS, HOT_MAX)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast(DEC))
        .cast("double")
        .alias("sum_price"),
    )


# --------------------------------------------------------------------------
# weighted_sample
# --------------------------------------------------------------------------

#: sample size and the dyadic-u resolution (2^20 buckets / 2^21 scale —
#: both powers of two so u is EXACTLY representable and u/w is one
#: correctly-rounded IEEE division, bit-identical across engines)
_WS_K = 200
_WS_M = 1 << 20
_WS_SCALE = float(1 << 21)


def _duck_weighted_sample() -> str:
    from .duck_vec import xxhash64_ctes

    return f"""
WITH {xxhash64_ctes("hx", "documents", keep="doc_id, text", col="doc_id")},
keyed AS (
  SELECT doc_id,
         CAST(strlen(text) AS BIGINT) AS w,
         (CAST(((h % {_WS_M}) + {_WS_M}) % {_WS_M} + 1 AS DOUBLE)
          / {_WS_SCALE}) / CAST(strlen(text) AS DOUBLE) AS key
  FROM hx WHERE strlen(text) > 0)
SELECT doc_id, w, key FROM keyed
ORDER BY key, doc_id LIMIT {_WS_K}
"""


@query(
    "weighted_sample",
    _duck_weighted_sample(),
    tags=["sampling", "weighted", "topk"],
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement — sequential
    Poisson / priority πps sampling (Ohlsson 1998, public literature):
    each doc draws u ~ Uniform(0,1] from its own id hash and the k
    smallest u/w win, so inclusion odds scale with the weight (here
    byte length — the "sample long documents proportionally" knob of
    mixture curation). The training-data use: a size-weighted corpus
    subsample whose members are REPRODUCIBLE from ids alone.

    Cross-engine bit-exactness, by construction rather than tolerance:
    u = (xxhash64(doc_id) mod 2^20 + 1) / 2^21 is an exact dyadic
    (power-of-two scaling is lossless in binary floating point), w is
    an integer byte count, and u/w is ONE correctly-rounded IEEE
    division — so both engines rank identical doubles and the oracle
    (duck_vec.xxhash64_ctes hash parity) value-hash-certifies the
    sample itself. No pow/ln (last-ulp divergence across libm
    implementations) anywhere.

    Scale: the plan is TakeOrderedAndProject — each partition keeps its
    local top-k and the driver merges k-sized heaps; no global sort, no
    full shuffle. k rows of driver state for any corpus size."""
    docs = load_table(spark, "documents", sf_dir)
    u = (
        (F.pmod(F.xxhash64("doc_id"), F.lit(_WS_M)) + 1).cast("double")
        / F.lit(_WS_SCALE)
    )
    w = F.octet_length("text").cast("bigint")
    return (
        docs.filter(F.octet_length("text") > 0)
        .select(
            "doc_id",
            w.alias("w"),
            (u / w.cast("double")).alias("key"),
        )
        .orderBy("key", "doc_id")
        .limit(_WS_K)
    )
