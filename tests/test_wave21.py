"""Wave-21 tests: snapshot time travel and the hot/cold split join.

cdc_time_travel's load-bearing claims: (a) v2 via incremental merge
equals full-log recomputation (the oracle also proves this at sf0.01),
(b) tombstones delete in the version where they are latest and
resurrect when a later batch writes the key again, (c) v1 stays
readable after v2 exists. skew_split_join's claim: the split is
result-invisible vs the plain join while the hot leg is a real
broadcast join in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_cdc_time_travel_versions(spark):
    out = REGISTRY["cdc_time_travel"].fn(spark, SF).collect()
    v1 = {r["user_id"]: (r["last_type"], r["last_value"])
          for r in out if r["version"] == 1}
    v2 = {r["user_id"]: (r["last_type"], r["last_value"])
          for r in out if r["version"] == 2}
    assert v1 and v2
    assert v1 != v2, "post-cutoff delta must change some user's state"
    # v2 must equal a from-scratch recomputation of the full log
    ev = spark.read.parquet(f"{SF}/events.parquet")
    full = ev.groupBy("user_id").agg(
        F.max_by(F.struct("event_type", "value"),
                 F.struct("ts", "event_id")).alias("s")
    )
    expect = {
        r["user_id"]: (r["s"]["event_type"], r["s"]["value"])
        for r in full.collect() if r["s"]["event_type"] != "error"
    }
    assert v2 == expect
    # no version ever surfaces a tombstone
    assert all(r["last_type"] != "error" for r in out)


def test_cdc_time_travel_tombstone_lifecycle(spark):
    """A user deleted in v1 (latest pre-cutoff event is the tombstone)
    must resurrect in v2 iff a later non-tombstone event exists — i.e.
    the snapshot retained the tombstone for the merge to fight."""
    from map_v2_etl_spark.plans.queries_wave21 import _CUTOFF

    ev = spark.read.parquet(f"{SF}/events.parquet")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    pre_latest = ev.filter(F.col("ts") <= cutoff).groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts", "event_id")).alias("t")
    )
    deleted_v1 = {r["user_id"] for r in pre_latest.collect()
                  if r["t"] == "error"}
    out = REGISTRY["cdc_time_travel"].fn(spark, SF).collect()
    v1_users = {r["user_id"] for r in out if r["version"] == 1}
    v2 = {r["user_id"]: r["last_type"] for r in out if r["version"] == 2}
    assert deleted_v1, "fixture should contain pre-cutoff tombstoned users"
    assert not (deleted_v1 & v1_users)
    post_latest = ev.filter(F.col("ts") > cutoff).groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts", "event_id")).alias("t")
    )
    post = {r["user_id"]: r["t"] for r in post_latest.collect()}
    for u in deleted_v1:
        if u in post and post[u] != "error":
            assert v2.get(u) == post[u], f"user {u} must resurrect in v2"
        else:
            assert u not in v2, f"user {u} must stay deleted in v2"


def test_skew_split_join_matches_plain_join(spark):
    out = {
        r["o_orderpriority"]: (r["n"], round(r["sum_price"], 4))
        for r in REGISTRY["skew_split_join"].fn(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")
    plain = (
        li.select(
            F.when(F.col("l_orderkey") % 4 != 0, F.lit(1))
            .otherwise(F.col("l_orderkey")).alias("k"),
            "l_extendedprice",
        )
        .join(od.select(F.col("o_orderkey").alias("k"), "o_orderpriority"), "k")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)"))
            .cast("double").alias("sum_price"),
        )
    )
    expect = {
        r["o_orderpriority"]: (r["n"], round(r["sum_price"], 4))
        for r in plain.collect()
    }
    assert out == expect
    assert sum(n for n, _ in out.values()) == li.count(), (
        "every fact row must join exactly once (split legs must not "
        "drop or duplicate)"
    )


def test_skew_split_join_hot_leg_is_broadcast(spark):
    df = REGISTRY["skew_split_join"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_snapshot_merge_associative(spark):
    """The snapshot merge must be ASSOCIATIVE over batch boundaries:
    merging two sequential deltas one at a time equals merging their
    union at once equals compacting the full log — the property that
    lets a 100 TB snapshot log apply micro-batches in any grouping
    (e.g. the streaming foreachBatch upsert) without drift."""
    from map_v2_etl_spark.plans.queries_wave21 import _compact

    ev = spark.read.parquet(f"{SF}/events.parquet")
    c1 = F.lit("2024-01-10 00:00:00").cast("timestamp_ntz")
    c2 = F.lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    base = _compact(ev.filter(F.col("ts") <= c1))
    d1 = _compact(ev.filter((F.col("ts") > c1) & (F.col("ts") <= c2)))
    d2 = _compact(ev.filter(F.col("ts") > c2))

    def rows(df):
        return {
            (r["user_id"], r["ts"], r["event_id"],
             r["event_type"], r["value"])
            for r in df.collect()
        }

    stepwise = _compact(_compact(base.unionByName(d1)).unionByName(d2))
    at_once = _compact(base.unionByName(d1).unionByName(d2))
    full = _compact(ev)
    assert rows(stepwise) == rows(at_once) == rows(full)


def test_weighted_sample_properties(spark):
    """Sequential-Poisson sample: reproducible, k-sized, keys are
    exactly u/w (recomputed independently), and the plan is a global
    top-k (TakeOrderedAndProject — per-partition heaps, no full sort)."""
    df = REGISTRY["weighted_sample"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    rows = df.collect()
    assert len(rows) == 200
    again = {r["doc_id"] for r in REGISTRY["weighted_sample"].fn(spark, SF).collect()}
    assert {r["doc_id"] for r in rows} == again, "must be reproducible"
    # independent recomputation of u/w for the sampled docs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = [r["doc_id"] for r in rows]
    chk = {
        r["doc_id"]: (r["w"], r["key"])
        for r in docs.filter(F.col("doc_id").isin(ids)).select(
            "doc_id",
            F.octet_length("text").cast("bigint").alias("w"),
            (
                (F.pmod(F.xxhash64("doc_id"), F.lit(1 << 20)) + 1)
                .cast("double") / F.lit(float(1 << 21))
                / F.octet_length("text").cast("double")
            ).alias("key"),
        ).collect()
    }
    for r in rows:
        assert (r["w"], r["key"]) == chk[r["doc_id"]]
    # weight bias: the sample's mean doc length should exceed the
    # corpus mean (longer docs get smaller keys in expectation)
    mean_all = docs.agg(F.avg(F.octet_length("text"))).first()[0]
    mean_sample = sum(r["w"] for r in rows) / len(rows)
    assert mean_sample > mean_all


# ---------------------------------------------------------------------------
# hot_cold_split_join property check
# ---------------------------------------------------------------------------

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=5), min_size=0, max_size=60
    ),
    threshold=st.integers(min_value=1, max_value=20),
)
def test_hot_cold_split_join_equals_plain(keys, threshold):
    """Result-identity with the plain inner join over arbitrary key
    distributions and thresholds — all-hot, all-cold, empty fact, and
    keys absent from the dim included."""
    from map_v2_etl_spark.operators.joins import hot_cold_split_join

    spark = _spark
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k int, v int"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(5)], "k int, attr string"  # key 5 missing
    )
    split = {
        tuple(r) for r in hot_cold_split_join(
            fact, dim, "k", threshold
        ).collect()
    }
    plain = {tuple(r) for r in fact.join(dim, "k").collect()}
    assert split == plain


def test_hot_cold_split_join_hot_max_overflow_raises(spark):
    from map_v2_etl_spark.operators.joins import hot_cold_split_join

    fact = spark.createDataFrame(
        [(k, 0) for k in range(6) for _ in range(3)], "k int, v int"
    )
    dim = spark.createDataFrame([(k, k) for k in range(6)], "k int, a int")
    with pytest.raises(ValueError, match="salt"):
        hot_cold_split_join(fact, dim, "k", hot_threshold=1, hot_max=5).collect()
