"""Wave-25 surface: mergeable-sketch rollup.

* hll_merge_rollup — the property that makes sketches the right
  cardinality tool at 100 TB, CERTIFIED rather than asserted: HLL
  register states merge by register-wise max, and max is associative/
  commutative/idempotent, so partial sketches built at ANY granularity
  merge to the same state as a direct pass — reaggregation without
  rescan. The Spark plan deliberately takes the long way: per-(type,
  day) register states (the shape you'd persist per partition/day at
  corpus scale) → merged per type (register-wise max over days) →
  merged again into a '__all__' level (max over types — note a user
  active under several types is counted ONCE globally, which no sum of
  per-type counts can do; union-through-merge is exactly what HLL
  buys). The DuckDB oracle computes each level DIRECTLY from the raw
  rows — equality under the driver's value hash proves the merge path
  is exactly the direct path, at every level.

  The register arithmetic is the engine's portable first-principles
  HLL (queries_wave3.q_hll_sql_counts: xxhash64 → trailing-zero rank,
  integer register max, exact int64 z-sum, one shared float literal) —
  duplicated here deliberately rather than refactored out, so wave 3's
  certified query keeps its plan-relevant source slice untouched
  (tools/cert_fingerprint.py would otherwise rotate its cert).

  Scale shape: level-0 states are a (types × days × ≤4096)-row integer
  table — kilobytes per partition after map-side combine regardless of
  corpus size; every later level aggregates STATES, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

_P, _M, _RHO_CAP = 12, 4096, 41
_SCALE = 1 << 42
_NUM = 0.7213 / (1 + 1.079 / _M) * _M * _M * float(_SCALE)


def _duck_hll_rollup() -> str:
    from .duck_vec import xxhash64_ctes

    est = (
        "CAST(round(CASE WHEN "
        f"{_NUM!r} / CAST(z_scaled AS DOUBLE) <= {2.5 * _M!r} AND v < {_M} "
        f"THEN {float(_M)!r} * ln({float(_M)!r} / ({float(_M)!r} - v)) "
        f"ELSE {_NUM!r} / CAST(z_scaled AS DOUBLE) END) AS BIGINT)"
    )
    return (
        f"WITH {xxhash64_ctes('hx', 'events', keep='event_type', col='user_id')}, "
        f"rr AS (SELECT event_type, h & {_M - 1} AS reg, "
        f"CASE WHEN (h >> {_P}) = 0 THEN {_RHO_CAP} "
        f"ELSE least(bit_count(((h >> {_P}) & (-(h >> {_P}))) - 1) + 1, "
        f"{_RHO_CAP}) END AS rho FROM hx), "
        # DIRECT per-level register states from the raw rows — the
        # independent recomputation the merge path must equal
        "lvl AS (SELECT event_type, reg, max(rho) AS r FROM rr GROUP BY 1, 2 "
        "        UNION ALL "
        "        SELECT '__all__', reg, max(rho) FROM rr GROUP BY 2), "
        "ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS v, "
        "CAST(sum(CAST(1 AS BIGINT) << (42 - r)) AS BIGINT) AS zs "
        "FROM lvl GROUP BY 1), "
        "e AS (SELECT event_type, v, "
        f"CAST(zs + ({_M} - v) * {_SCALE} AS BIGINT) AS z_scaled FROM ag) "
        "SELECT event_type, v AS n_registers, z_scaled, "
        f"{est} AS est_users FROM e"
    )


@query(
    "hll_merge_rollup",
    _duck_hll_rollup(),
    tags=["agg", "approx", "sketch", "hll", "merge", "rollup"],
)
def q_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """day-level HLL states → merged per type → merged global — see
    module docstring (the oracle recomputes each level directly)."""
    ev = load_table(spark, "events", sf_dir)
    h = F.xxhash64("user_id")
    t = F.shiftright(h, _P)
    lsb = t.bitwiseAND(-t)
    rho = F.when(t == 0, F.lit(_RHO_CAP)).otherwise(
        F.least(F.bit_count(lsb - 1) + 1, F.lit(_RHO_CAP))
    )
    # level 0: per-(type, day) sketch states — what a 100 TB pipeline
    # persists per day and never rescans
    fine = (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            h.bitwiseAND(F.lit(_M - 1)).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "day", "reg")
        .agg(F.max("rho").alias("r"))
    )
    # level 1: merge days into per-type states (register-wise max)
    typed = fine.groupBy("event_type", "reg").agg(F.max("r").alias("r"))
    # level 2: merge types into the global state — the union-through-
    # merge that deduplicates users across types
    glob = (
        typed.groupBy("reg")
        .agg(F.max("r").alias("r"))
        .select(F.lit("__all__").alias("event_type"), "reg", "r")
    )
    lvl = typed.unionByName(glob)
    ag = lvl.groupBy("event_type").agg(
        F.count("*").alias("v"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 42 - r)")).alias("zs"),
    )
    z_scaled = (
        F.col("zs") + (F.lit(_M) - F.col("v")) * F.lit(_SCALE)
    ).cast("long")
    est_raw = F.lit(_NUM) / z_scaled.cast("double")
    est = F.when(
        (est_raw <= F.lit(2.5 * _M)) & (F.col("v") < _M),
        F.lit(float(_M))
        * F.log(F.lit(float(_M)) / (F.lit(float(_M)) - F.col("v"))),
    ).otherwise(est_raw)
    return ag.select(
        "event_type",
        F.col("v").alias("n_registers"),
        z_scaled.alias("z_scaled"),
        F.round(est).cast("long").alias("est_users"),
    )
