"""Wave-28 tests: KMV sketch set algebra and snapshot change-data-feed.

Claims pinned:
* KMV estimates track ground truth within 5σ (σ = 1/sqrt(k-2)) on a
  constructed overlap whose exact |A|, |B|, |A∪B|, |A∩B| are known —
  including the intersection, the operation the HLL surface can't do.
* Exact regime: a sketch that never fills IS the distinct set — every
  estimate equals the exact count, intersection included.
* prefilter=True returns byte-identical sketch rows to the plain path
  (the threshold only bounds the sort input), and a deliberately
  starving headroom (<1) exercises the self-heal recompute and STILL
  returns the identical sketch.
* snapshot_diff is a faithful change feed: applying the emitted
  insert/update/delete ops to the T1 state reproduces the T2 state
  exactly (the defining property of a CDF), and op labels partition
  correctly against independently computed states.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import sketches as S
from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def _overlap_df(spark):
    """g='a': ids 0..5999; g='b': ids 3000..8999 → |A|=|B|=6000,
    |A∪B|=9000, |A∩B|=3000."""
    a = spark.range(0, 6000).select(F.lit("a").alias("g"), F.col("id"))
    b = spark.range(3000, 9000).select(F.lit("b").alias("g"), F.col("id"))
    return a.unionByName(b)


def test_kmv_accuracy_within_5_sigma(spark):
    k = 256
    df = _overlap_df(spark)
    sk = S.kmv_sketch(df, "g", "id", k)
    row = S.kmv_pair_estimates(sk, "g", k).collect()[0]
    sigma = 1.0 / math.sqrt(k - 2)
    for est, true in [
        (row["est_a"], 6000),
        (row["est_b"], 6000),
        (row["est_union"], 9000),
        (row["est_intersect"], 3000),
    ]:
        assert abs(est - true) / true <= 5 * sigma, (est, true)


def test_kmv_exact_regime(spark):
    """Sketch larger than every set → estimates are exact counts."""
    k = 16384
    df = _overlap_df(spark)
    sk = S.kmv_sketch(df, "g", "id", k)
    row = S.kmv_pair_estimates(sk, "g", k).collect()[0]
    assert (
        row["est_a"],
        row["est_b"],
        row["est_union"],
        row["est_intersect"],
    ) == (6000, 6000, 9000, 3000)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_kmv_prefilter_identical_and_self_heal(spark):
    k = 256
    df = _overlap_df(spark)
    plain = _rows(S.kmv_sketch(df, "g", "id", k))
    pre = _rows(S.kmv_sketch(df, "g", "id", k, prefilter=True))
    assert pre == plain
    # headroom < 1 guarantees the threshold keeps ~k/4 expected rows —
    # the starved branch must trigger and recompute exactly
    healed = _rows(
        S.kmv_sketch(df, "g", "id", k, prefilter=True, headroom=0.25)
    )
    assert healed == plain


def test_kmv_prefilter_fully_starved_group_self_heals(spark):
    """A headroom so small the threshold casts to 0 leaves EVERY group
    with zero survivors (h <= 0 never matches a 60-bit hash). The r9
    starvation check derived starved groups from sk itself, so a
    zero-survivor group never appeared in the check's groupBy and
    vanished from the output entirely. The fix derives starvation from
    `active` (left-join sk counts, coalesce to 0) — this pins that the
    fully-starved regime still returns the exact plain-path sketch."""
    k = 64
    df = _overlap_df(spark)
    plain = _rows(S.kmv_sketch(df, "g", "id", k))
    healed = _rows(
        S.kmv_sketch(df, "g", "id", k, prefilter=True, headroom=1e-18)
    )
    assert healed == plain
    # both groups must still be present — the r9 bug dropped them
    assert {r[0] for r in healed} == {"a", "b"}


def test_kmv_sketch_sets_regime(spark):
    """At fixture scale the monthly sketches FILL (estimator regime) —
    the query certifies the approximate path, not the trivial one —
    and estimates stay sane vs exact monthly actives."""
    out = REGISTRY["kmv_sketch_sets"].fn(spark, "/root/testdata/sf0.01")
    rows = out.collect()
    assert len(rows) == 66  # 12 months of 1995, unordered pairs
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    exact = {
        r["m"]: r["n"]
        for r in orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    sigma = 1.0 / math.sqrt(64 - 2)
    in_estimator_regime = 0
    for r in rows:
        ta, tb = exact[r["group_a"]], exact[r["group_b"]]
        assert abs(r["est_a"] - ta) / ta <= 5 * sigma
        assert abs(r["est_b"] - tb) / tb <= 5 * sigma
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1
        assert r["est_intersect"] <= min(r["est_a"], r["est_b"]) + 1
        if r["est_a"] != ta or r["est_b"] != tb:
            in_estimator_regime += 1
    assert in_estimator_regime > 0, "sketches never filled — k too large"


def test_snapshot_diff_replays_to_t2_state(spark):
    """The defining CDF property: T1 state ⊕ diff == T2 state."""
    from map_v2_etl_spark.plans.queries_wave28 import _T1, _T2, _lww_state

    ev = spark.read.parquet(f"{SF}/events.parquet")
    s1 = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in _lww_state(ev, _T1).collect()
    }
    s2 = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in _lww_state(ev, _T2).collect()
    }
    diff = REGISTRY["snapshot_diff"].fn(spark, SF).collect()
    assert diff, "fixture window produced an empty change feed"
    replayed = dict(s1)
    seen_ops = set()
    for r in diff:
        seen_ops.add(r["op"])
        if r["op"] == "insert":
            assert r["user_id"] not in s1
            assert r["before_type"] is None and r["before_value"] is None
            replayed[r["user_id"]] = (r["after_type"], r["after_value"])
        elif r["op"] == "delete":
            assert r["user_id"] in s1
            assert r["after_type"] is None and r["after_value"] is None
            del replayed[r["user_id"]]
        else:
            assert r["op"] == "update"
            assert replayed[r["user_id"]] == (
                r["before_type"],
                r["before_value"],
            )
            assert (r["before_type"], r["before_value"]) != (
                r["after_type"],
                r["after_value"],
            )
            replayed[r["user_id"]] = (r["after_type"], r["after_value"])
    assert replayed == s2
    assert "update" in seen_ops  # the window must exercise real changes


def test_kmv_prefilter_null_group_contract(spark):
    """NULL group keys cannot ride the prefilter's broadcast equi-join
    (NULL never equi-matches) — they must take the plain path so
    prefilter=True stays result-identical on null-keyed data (r9
    review finding: the first cut silently DROPPED the NULL group)."""
    k = 32
    df = (
        spark.range(0, 300)
        .selectExpr(
            "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('g', id % 2) END"
            " AS g",
            "id AS v",
        )
    )
    def rows_nullsafe(out):
        return sorted(
            map(tuple, out.collect()), key=lambda r: (r[0] is None, r)
        )

    plain = rows_nullsafe(S.kmv_sketch(df, "g", "v", k))
    pre = rows_nullsafe(S.kmv_sketch(df, "g", "v", k, prefilter=True))
    assert pre == plain
    assert any(r[0] is None for r in plain), "fixture lost the NULL group"
