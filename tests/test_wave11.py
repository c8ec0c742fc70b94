"""Wave-11 semantics: stream-static enrichment parity, grouped-agg
pandas UDF, parquet compaction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F


def test_enriched_stream_matches_batch_join(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave11 import q_events_enriched_stream
    from map_v2_etl_spark.sources.registry import load_table

    got = {
        r["c_mktsegment"]: (r["n_events"], round(r["total_value"], 4))
        for r in q_events_enriched_stream(spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    want = {
        r["c_mktsegment"]: (r["n"], round(r["tv"], 4))
        for r in ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("double")
            .alias("tv"),
        )
        .collect()
    }
    assert got == want


def test_grouped_geomean_matches_python(spark, sf_dir):
    import math

    from map_v2_etl_spark.plans.queries_wave11 import q_grouped_geomean
    from map_v2_etl_spark.sources.registry import load_table

    got = {
        r["event_type"]: (r["n"], r["geomean_value"])
        for r in q_grouped_geomean(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value") > 0)
        .select("event_type", "value")
        .collect()
    )
    acc: dict[str, list[float]] = {}
    for r in rows:
        acc.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in acc.items():
        n, gm = got[et]
        assert n == len(vals)
        want = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert gm == pytest.approx(round(want, 6), abs=2e-6)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from map_v2_etl_spark.sources.parquet_io import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    # simulate an incremental writer: 40 tiny files
    df.repartition(40).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 40
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    n_files = compact_parquet(spark, path, target_file_bytes=10**9)
    assert n_files == 1
    assert len(glob.glob(f"{path}/part-*.parquet")) == 1
    after_df = spark.read.parquet(path)
    after = sorted(r["id"] for r in after_df.collect())
    assert after == before
    assert after_df.filter(F.col("v") != F.col("id") * 2).count() == 0
