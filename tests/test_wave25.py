"""Wave-25 tests: HLL merge rollup.

Claims pinned: the merged global estimate tracks the true global
distinct count within HLL error (~1.04/sqrt(4096) ≈ 1.6%, pinned at
5% for slack); union-through-merge deduplicates users across types
(global < sum of per-type estimates when audiences overlap); and the
merge path is exactly the direct path (state equality, not just
estimate equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_hll_rollup_accuracy_and_union(spark):
    out = {r["event_type"]: r for r in
           REGISTRY["hll_merge_rollup"].fn(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    true_global = ev.select("user_id").distinct().count()
    est_global = out["__all__"]["est_users"]
    assert abs(est_global - true_global) <= max(3, 0.05 * true_global)
    per_type_sum = sum(
        r["est_users"] for k, r in out.items() if k != "__all__"
    )
    # users act under several types, so the deduplicated union must be
    # well below the per-type sum
    assert est_global < per_type_sum


def test_hll_merge_path_equals_direct_states(spark):
    """Register-state equality, stronger than estimate equality: the
    day→type merge must yield bit-identical (reg, r) states to a direct
    per-type pass over the raw rows."""
    from map_v2_etl_spark.plans.queries_wave25 import _M, _P, _RHO_CAP

    ev = spark.read.parquet(f"{SF}/events.parquet")
    h = F.xxhash64("user_id")
    t = F.shiftright(h, _P)
    lsb = t.bitwiseAND(-t)
    rho = F.when(t == 0, F.lit(_RHO_CAP)).otherwise(
        F.least(F.bit_count(lsb - 1) + 1, F.lit(_RHO_CAP))
    )
    rr = ev.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        h.bitwiseAND(F.lit(_M - 1)).alias("reg"),
        rho.alias("rho"),
    )
    direct = rr.groupBy("event_type", "reg").agg(F.max("rho").alias("r"))
    via_days = (
        rr.groupBy("event_type", "day", "reg")
        .agg(F.max("rho").alias("r"))
        .groupBy("event_type", "reg")
        .agg(F.max("r").alias("r"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_days.collect())
    )
