"""Wave-13: Spark-4 SQL surface (recursive CTE, variant, pipe syntax)."""

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()  # populate REGISTRY

SF = "/root/testdata/sf0.001"


def test_containment_closure_includes_direct_pairs(spark):
    direct = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["ngram_containment"].fn(spark, SF).collect()
    }
    closure = {
        (r["id_a"], r["id_b"]): r["min_hops"]
        for r in REGISTRY["containment_closure"].fn(spark, SF).collect()
    }
    assert direct <= set(closure)
    assert all(closure[p] == 1 for p in direct)
    # every pair is id-ordered (DAG invariant that guarantees termination)
    assert all(a < b for a, b in closure)


def test_variant_matches_get_json_object(spark):
    from map_v2_etl_spark.sources.registry import load_table

    ev = load_table(spark, "events", SF)
    a = REGISTRY["events_props_variant"].fn(spark, SF)
    b = (
        ev.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k")
        )
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pipe_syntax_plan_equals_ansi(spark):
    """Pipe syntax is front-end sugar: the optimized plan must match the
    ANSI formulation's results exactly."""
    from map_v2_etl_spark.sources.registry import load_table

    li = load_table(spark, "lineitem", SF)
    ansi = (
        li.filter(F.col("l_shipdate") >= "1995-01-01")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(20,4)"))
            .cast("double")
            .alias("total_qty"),
        )
    )
    pipe = REGISTRY["pipe_syntax_topk"].fn(spark, SF)
    assert pipe.exceptAll(ansi).count() == 0
    assert ansi.exceptAll(pipe).count() == 0
