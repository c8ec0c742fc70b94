"""Semantics tests for the wave-3 surface (plans/queries_wave3.py):
lateral decorrelation, UDTF vs JVM explode agreement, VARIANT typed
extraction, HLL sketch accuracy, and streaming keep-first dedup."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries
from map_v2_etl_spark.sources.registry import load_table

all_queries()


def test_lateral_topk_matches_window_formulation(spark, sf_dir):
    got = {
        tuple(r)
        for r in REGISTRY["lateral_topk"].fn(spark, sf_dir).collect()
    }
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    expected = {
        tuple(r)
        for r in c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "c_name", "c_acctbal")
        .collect()
    }
    assert got == expected


def test_lateral_topk_is_decorrelated(spark, sf_dir):
    # the lateral subquery must become a window rank, not a nested loop
    plan = (
        REGISTRY["lateral_topk"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_udtf_matches_jvm_split(spark, sf_dir):
    got = REGISTRY["text_udtf_words"].fn(spark, sf_dir).collect()
    d = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    expected = (
        d.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(20)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in expected]


def test_variant_matches_get_json_object(spark, sf_dir):
    got = {
        (r.event_type, r.sum_k, r.n)
        for r in REGISTRY["variant_props"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    expected = {
        (r.event_type, r.sum_k, r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(
                F.get_json_object("props", "$.k").cast("bigint")
            ).alias("sum_k"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == expected


def test_hll_within_2pct_of_exact(spark, sf_dir):
    """The r10 certificate form: exact_users matches an independent
    countDistinct, the Datasketches estimate sits inside the 2%
    envelope (attestation column exactly 0), and the raw estimate —
    recomputed here the way the query computes it internally — is a
    real estimate, not a copy of the exact count."""
    rows = {
        r.event_type: r
        for r in REGISTRY["hll_user_counts"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, n in exact.items():
        assert rows[et].exact_users == n
        assert rows[et].est_err_over_2pct_e6 == 0, (et, rows[et])
    approx = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(14))
            ).alias("est")
        )
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.02 * n), (et, approx[et], n)


def test_hll_sql_within_4pct_of_exact(spark, sf_dir):
    """The explicit-register HLL (hll_sql_counts) is a real estimator,
    not just a hash-stable artifact: accuracy within ~2.6%/sqrt(m)-ish
    of exact (4% bound leaves room for small-count noise at test SF)."""
    got = {
        r.event_type: r.est_users
        for r in REGISTRY["hll_sql_counts"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(2, 0.04 * n), (et, got[et], n)


def test_streaming_dedup_agrees_with_batch_keyset(spark, sf_dir):
    import os
    import tempfile

    batch_keys = {
        (r.user_id, r.event_type)
        for r in REGISTRY["events_dedup_first"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        ev.write.parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .parquet(src)
            .dropDuplicates(["user_id", "event_type"])
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("dedup_stream_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.event_type)
            for r in spark.sql(
                "SELECT user_id, event_type FROM dedup_stream_t"
            ).collect()
        }
    assert got == batch_keys
