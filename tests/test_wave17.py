"""Wave-17: format roundtrips, partition pruning, training order,
curriculum staging."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()  # import side-effect: populate REGISTRY

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_equals_source_agg(spark):
    from map_v2_etl_spark.sources.registry import load_table

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["n"], r["sum_qty"], r["sum_price"]
        )
        for r in REGISTRY["orc_roundtrip"].fn(spark, SF).collect()
    }
    direct = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["n"], r["sum_qty"], r["sum_price"]
        )
        for r in load_table(spark, "lineitem", SF)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(20,4)"))
            .cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)"))
            .cast("double").alias("sum_price"),
        )
        .collect()
    }
    assert got == direct


def test_json_roundtrip_preserves_doubles(spark):
    from map_v2_etl_spark.sources.registry import load_table

    got = {
        r["o_orderpriority"]: (r["n"], r["sum_price"], r["min_key"])
        for r in REGISTRY["json_roundtrip"].fn(spark, SF).collect()
    }
    src = load_table(spark, "orders", SF)
    direct = {
        r["o_orderpriority"]: (r["n"], r["sum_price"], r["min_key"])
        for r in src.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
            .cast("double").alias("sum_price"),
            F.min("o_orderkey").alias("min_key"),
        )
        .collect()
    }
    assert got == direct


def test_partition_filter_reaches_the_scan(spark, tmp_path):
    """The equality predicate on the partition column must resolve as a
    PartitionFilter (directory pruning), not a post-scan row filter."""
    from map_v2_etl_spark.plans.queries_wave17 import (
        build_partitioned_events,
        read_pruned,
    )

    path = str(tmp_path / "ev_part")
    day = build_partitioned_events(spark, SF, path)
    pruned = read_pruned(spark, path, day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    head, _, _ = plan.partition("PushedFilters")
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "event_date" in pf
    # row count matches a plain filter over the source
    from map_v2_etl_spark.sources.registry import load_table

    ev = load_table(spark, "events", SF)
    expect = ev.filter(
        F.date_format("ts", "yyyy-MM-dd") == day
    ).count()
    assert pruned.count() == expect > 0


def test_training_order_matches_global_window(spark):
    out = {
        r["doc_id"]: r["ord"]
        for r in REGISTRY["training_order"].fn(spark, SF).collect()
    }
    from map_v2_etl_spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF).select("doc_id")
    ref = {
        r["doc_id"]: r["ord"]
        for r in docs.select(
            "doc_id",
            F.row_number()
            .over(
                W.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
            )
            .cast("long")
            .alias("ord"),
        ).collect()
    }
    assert out == ref
    # it is a permutation of 1..n
    assert sorted(out.values()) == list(range(1, len(out) + 1))


def test_curriculum_stages_partition_and_order(spark):
    rows = {
        r["stage"]: r
        for r in REGISTRY["curriculum_stages"].fn(spark, SF).collect()
    }
    from map_v2_etl_spark.sources.registry import load_table

    n_docs = load_table(spark, "documents", SF).count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    stages = sorted(rows)
    # stages are ordered by length: each stage's max <= next stage's min
    for a, b in zip(stages, stages[1:]):
        assert rows[a]["max_tokens"] <= rows[b]["min_tokens"]


def test_partitioned_write_salts_within_day(spark, tmp_path, monkeypatch):
    """r18 (VERDICT r17 item 6): the pre-write clustering must not cap
    parallelism at the day cardinality. Forcing the salt regime (tiny
    byte target) fans each day out over >1 file — bounded by the salt
    count — while the pruned read and its results stay identical."""
    import glob
    import os

    import map_v2_etl_spark.plans.queries_wave17 as W17

    path = str(tmp_path / "ev_salted")
    monkeypatch.setattr(W17, "_SALT_TARGET_BYTES", 4 << 10)  # 4 KB
    day = W17.build_partitioned_events(spark, SF, path)
    days = [
        d for d in os.listdir(path) if d.startswith("event_date=")
    ]
    assert len(days) > 1
    per_day = {
        d: len(glob.glob(os.path.join(path, d, "*.parquet")))
        for d in days
    }
    # k = ceil(src_bytes / 4KB): the salt bound on files per day
    import os as _os

    src = _os.path.getsize(SF + "/events.parquet")
    k = -(-src // (4 << 10))
    assert max(per_day.values()) > 1, per_day  # the salt fans out
    assert max(per_day.values()) <= k, per_day  # and stays bounded
    # pruned read over the salted layout: same rows as a plain filter
    pruned = W17.read_pruned(spark, path, day)
    from map_v2_etl_spark.sources.registry import load_table

    ev = load_table(spark, "events", SF)
    expect = ev.filter(F.date_format("ts", "yyyy-MM-dd") == day).count()
    assert pruned.count() == expect > 0
