"""Wave-16: as-of variants + exact histograms."""

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_forward_asof_matches_next_not_prev(spark):
    from map_v2_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, "past"), (1, 10, "now"), (1, 20, "future")],
        "k int, ts int, tag string",
    )
    fwd = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["tag"], direction="forward",
    ).collect()[0]
    assert fwd["tag"] == "now"  # at-or-after, ties match
    bwd = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["tag"],
    ).collect()[0]
    assert bwd["tag"] == "now"


def test_tolerance_voids_stale_matches(spark):
    from map_v2_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], "k int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 7.0)], "k int, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"], tolerance=F.lit(3600.0),
    ).collect()[0]
    assert out["v"] is None  # 3h-old match voided by 1h tolerance


def test_histograms_conserve_counts(spark):
    from map_v2_etl_spark.sources.registry import load_table

    rows = REGISTRY["column_histograms"].fn(spark, SF).collect()
    n_rows = load_table(spark, "lineitem", SF).count()
    per_col = {}
    for r in rows:
        assert 0 <= r["bin"] <= 15
        per_col[r["id"]] = per_col.get(r["id"], 0) + r["n"]
    assert set(per_col) == {"l_quantity", "l_extendedprice", "l_discount"}
    assert all(v == n_rows for v in per_col.values())
