"""Parquet layout: partition pruning and shuffle-free bucketed joins."""

from pyspark.sql import functions as F

from map_v2_etl_spark.sources.parquet_io import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from map_v2_etl_spark.sources.registry import load_table


def test_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_year")
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "yr", F.year("o_orderdate")
    )
    write_partitioned(orders, path, ["yr"])

    back = read_partitioned(spark, path)
    pruned = back.filter(F.col("yr") == 1997).select("o_orderkey", "yr")

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the year predicate must prune partitions at the scan, not filter rows
    assert "PartitionFilters" in plan
    assert "yr" in plan.split("PartitionFilters")[1][:200]

    expect = orders.filter(F.col("yr") == 1997).count()
    assert pruned.count() == expect


def test_partitioned_roundtrip_values(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li_by_flag")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    write_partitioned(li, path, ["l_returnflag"])
    back = read_partitioned(spark, path)
    a = {
        (r.l_orderkey, r.l_linenumber, r.l_quantity, r.l_returnflag)
        for r in li.collect()
    }
    b = {
        (r.l_orderkey, r.l_linenumber, r.l_quantity, r.l_returnflag)
        for r in back.collect()
    }
    assert a == b


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # saveAsTable uses the session warehouse dir (spark-warehouse/,
    # gitignored); tables are dropped at the end
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"],
    )
    write_bucketed(
        customer.select("c_custkey", "c_name"),
        "t_customer_b", ["c_custkey"], 8, sort_cols=["c_custkey"],
    )
    o_b = spark.table("t_orders_b")
    c_b = spark.table("t_customer_b")
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o_b.join(c_b, o_b.o_custkey == c_b.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: the join still returns every order with a customer
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")
