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


def test_spatial_join_matches_bruteforce(spark):
    got = {
        (r["c_custkey"], r["n_nationkey"])
        for r in REGISTRY["spatial_join_pip"].fn(spark, SF).collect()
    }
    cust = load_table(spark, "customer", SF).select("c_custkey").collect()
    nat = load_table(spark, "nation", SF).select("n_nationkey").collect()
    expect = set()
    for c in cust:
        ck = c["c_custkey"]
        x, y = (ck % 20) + 0.25, ((ck * 7) % 20) + 0.5
        for n in nat:
            nk = n["n_nationkey"]
            cx, cy = 4.0 * (nk % 5) + 2.0, 4.0 * (nk // 5) + 2.0
            if abs(x - cx) + abs(y - cy) < 2.0:
                expect.add((ck, nk))
    assert got == expect
    assert expect  # non-degenerate at sf0.001


def test_spatial_join_respects_holes(spark):
    """A point inside the bbox AND the outer ring but inside a HOLE must
    be rejected — proves the refine is a real even-odd ray cast, not a
    bbox test."""
    from map_v2_etl_spark.operators.geo import spatial_join

    donut = (
        '{"type":"Polygon","coordinates":['
        "[[0,0],[10,0],[10,10],[0,10],[0,0]],"
        "[[4,4],[6,4],[6,6],[4,6],[4,4]]]}"
    )
    polys = spark.createDataFrame([(1, donut)], ["pid", "geometry"])
    pts = spark.createDataFrame(
        [
            (1, 5.0, 5.0),   # in the hole -> out
            (2, 2.0, 2.0),   # in the ring -> in
            (3, 11.0, 5.0),  # outside bbox -> out
            (4, 4.5, 9.5),   # in ring, above hole -> in
        ],
        ["pt", "x", "y"],
    )
    got = {
        r["pt"]
        for r in spatial_join(pts, polys, cell_size=4.0).collect()
    }
    assert got == {2, 4}


def test_incremental_merge_equals_recompute(spark):
    got = {
        (r["day"], r["event_type"]): (r["n"], r["sum_value"])
        for r in REGISTRY["incremental_agg_merge"].fn(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    full = {
        (r["day"], r["event_type"]): (r["n"], r["sum_value"])
        for r in ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == full
