"""Wave-18: ingest resilience (quarantine, schema drift) + CDC replay."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries
from map_v2_etl_spark.sources.registry import load_table

all_queries()

SF = "/root/testdata/sf0.001"


def test_quarantine_routes_not_fails(spark):
    rows = {
        r["status"]: (r["n"], r["sum_price"])
        for r in REGISTRY["corrupt_record_quarantine"].fn(spark, SF)
        .collect()
    }
    od = load_table(spark, "orders", SF)
    n_bad = od.filter(F.col("o_orderkey") % 50 == 0).count()
    n_all = od.count()
    assert rows["_corrupt"][0] == n_bad
    assert rows["_corrupt"][1] is None  # corrupt rows carry no data
    assert sum(n for n, _ in rows.values()) == n_all  # nothing dropped


def test_schema_evolution_unknown_bucket(spark):
    rows = {
        r["priority"]: r["n"]
        for r in REGISTRY["schema_evolution_merge"].fn(spark, SF).collect()
    }
    od = load_table(spark, "orders", SF)
    assert rows["unknown"] == od.filter(F.col("o_orderkey") % 2 == 0).count()
    assert sum(rows.values()) == od.count()


def test_cdc_apply_matches_window_formulation(spark):
    got = {
        r["user_id"]: (r["last_type"], r["last_value"])
        for r in REGISTRY["cdc_apply"].fn(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ref_rows = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    )
    ref = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in ref_rows
        if r["event_type"] != "error"
    }
    assert got == ref
    # tombstoned keys are really gone
    tombstoned = {
        r["user_id"] for r in ref_rows if r["event_type"] == "error"
    }
    assert tombstoned.isdisjoint(got)
