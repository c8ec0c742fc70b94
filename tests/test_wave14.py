"""Wave-14 event analytics: funnel ordering, cohort sanity, top-k cert."""

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_funnel_stages_are_monotone(spark):
    rows = REGISTRY["event_funnel"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # a later stage implies every earlier one
        assert r["reached_click"] <= r["reached_view"]
        assert r["reached_purchase"] <= r["reached_click"]


def test_funnel_respects_order_not_just_presence(spark):
    """A user whose only purchase precedes their first view must NOT
    count as a full-funnel conversion."""
    import map_v2_etl_spark.plans.queries_wave14 as w14
    import os
    import tempfile

    d = tempfile.mkdtemp()
    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.0, "{}"),
        (2, "2024-01-02 10:00:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-03 10:00:00", 1, "click", 1.0, "{}"),
        # user 2: proper order
        (4, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
        (5, "2024-01-02 10:00:00", 2, "click", 1.0, "{}"),
        (6, "2024-01-03 10:00:00", 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["user_id"]: r for r in w14.q_event_funnel(spark, d).collect()}
    assert out[1]["reached_view"] == 1
    assert out[1]["reached_click"] == 1
    assert out[1]["reached_purchase"] == 0  # purchase came first
    assert out[2]["reached_purchase"] == 1


def test_cohort_offsets_nonnegative_and_day0_complete(spark):
    rows = REGISTRY["cohort_retention"].fn(spark, SF).collect()
    assert rows
    assert all(r["day_offset"] >= 0 for r in rows)
    # every user is active on their own cohort day
    day0 = sum(r["n_active"] for r in rows if r["day_offset"] == 0)
    from map_v2_etl_spark.sources.registry import load_table

    n_users = load_table(spark, "events", SF).select("user_id").distinct().count()
    assert day0 == n_users


def test_top_k_sketch_certified(spark):
    rows = REGISTRY["event_top_k_certified"].fn(spark, SF).collect()
    assert len(rows) == 3
    assert all(r["sketch_ok"] for r in rows)
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]


def test_nb_classifier_beats_majority_class(spark):
    """The in-engine NB classifier must at least beat predicting the
    majority language everywhere (sanity that training worked)."""
    rows = REGISTRY["nb_lang_classifier"].fn(spark, SF).collect()
    assert rows
    acc = sum(r["is_correct"] for r in rows) / len(rows)
    from map_v2_etl_spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF)
    top = (
        docs.groupBy("lang").count().orderBy(F.desc("count")).first()["count"]
    )
    majority = top / docs.count()
    assert acc > majority
