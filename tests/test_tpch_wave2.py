"""Plan + semantics contracts for the extended TPC-H wave
(map_v2_etl_spark/plans/queries_tpch.py).

Value correctness is covered by the DuckDB oracle gate; these tests pin
the physical-plan properties each query's 100 TB story depends on, plus
the decorrelation semantics of q21 (the one query whose Spark form is
structurally different from its SQL oracle).
"""

import pytest

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries
from map_v2_etl_spark.sources.registry import load_table

all_queries()


def plan_of(name, spark, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q16", "tpch_q19"],
)
def test_dimension_joins_broadcast(spark, sf_dir, name):
    # every part/supplier/nation/region join must be a broadcast — a
    # shuffle join against a dimension table is the classic 100 TB bug
    plan = plan_of(name, spark, sf_dir)
    assert "BroadcastHashJoin" in plan


def test_q4_plans_semi_join(spark, sf_dir):
    plan = plan_of("tpch_q4", spark, sf_dir)
    assert "LeftSemi" in plan


def test_q16_plans_anti_join(spark, sf_dir):
    plan = plan_of("tpch_q16", spark, sf_dir)
    assert "LeftAnti" in plan


def test_q6_pushes_all_predicates_to_scan(spark, sf_dir):
    plan = plan_of("tpch_q6", spark, sf_dir)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed


def test_q10_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of("tpch_q10", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_q21_decorrelation_matches_exists_semantics(spark, sf_dir):
    # independent re-derivation of q21's answer with per-order pandas
    # logic: for each finished order with >=2 suppliers of which exactly
    # one is late, count that supplier's late lines
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    )
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
        .toPandas()
    )
    import collections
    import datetime

    late_cnt = collections.Counter()
    supps = collections.defaultdict(set)
    late_supps = collections.defaultdict(set)
    for r in rows.itertuples():
        supps[r.l_orderkey].add(r.l_suppkey)
        if r.l_shipdate > r.o_orderdate + datetime.timedelta(days=60):
            late_supps[r.l_orderkey].add(r.l_suppkey)
            late_cnt[(r.l_orderkey, r.l_suppkey)] += 1
    expected = collections.Counter()
    for ok, ls in late_supps.items():
        if len(supps[ok]) >= 2 and len(ls) == 1:
            (sk,) = ls
            expected[sk] += late_cnt[(ok, sk)]

    s = load_table(spark, "supplier", sf_dir).toPandas()
    name_of = dict(zip(s.s_suppkey, s.s_name))
    expected_by_name = {
        name_of[sk]: cnt for sk, cnt in expected.items() if cnt
    }

    got = {
        r.s_name: r.numwait
        for r in REGISTRY["tpch_q21"].fn(spark, sf_dir).collect()
    }
    assert got == expected_by_name


def test_q22_exact_decimal_threshold(spark, sf_dir):
    # the above-average filter must behave as bal > mean(positive bals);
    # recompute with exact integer cents to verify the cross-multiply
    c = load_table(spark, "customer", sf_dir).toPandas()
    cents = (c.c_acctbal * 100).round().astype("int64")
    pos = cents[cents > 0]
    keep = c[cents * len(pos) > pos.sum()]
    out = REGISTRY["tpch_q22"].fn(spark, sf_dir).collect()
    assert sum(r.numcust for r in out) <= len(keep)
