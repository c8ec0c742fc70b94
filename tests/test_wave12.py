"""Wave-12 operators: source caps, block dedup, certified approx
quantiles, bloom decontamination, content-word ratio, containment."""

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()  # import side-effect: populate REGISTRY

SF = "/root/testdata/sf0.001"


def test_source_caps_bounds(spark):
    out = REGISTRY["source_caps"].fn(spark, SF).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["rk"])
    for src, rks in per.items():
        assert max(rks) <= 50
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_block_dedup_first_occurrence_survives(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d e f g h x y")],
        ["doc_id", "text"],
    )
    import map_v2_etl_spark.plans.queries_wave12 as w12

    # 18 tokens -> blocks at 1, 9, 17: [a..h], [a..h] (dup), [x y];
    # run the real query over a temp parquet so the code path is identical
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    row = w12.q_block_dedup(spark, d).collect()[0]
    assert row["n_blocks"] == 3
    assert row["n_kept"] == 2
    assert row["text_dedup"] == "a b c d e f g h x y"


def test_approx_quantiles_certified_all_ok(spark):
    rows = REGISTRY["approx_quantiles_certified"].fn(spark, SF).collect()
    assert rows and all(r["rank_ok"] for r in rows)


def test_bloom_equals_exact_decontamination(spark):
    exact = REGISTRY["decontaminate_docs"].fn(spark, SF)
    bloom = REGISTRY["decontaminate_bloom"].fn(spark, SF)
    assert exact.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(exact).count() == 0


def test_content_word_ratio_sane(spark):
    rows = REGISTRY["content_word_ratio"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_content"] <= r["n_tokens"]


def test_ngram_containment_superset_of_jaccard(spark):
    """Every symmetric Jaccard>=0.8 pair is containment>=0.8 too
    (jaccard <= containment by definition)."""
    jac = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()
    }
    cont = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["ngram_containment"].fn(spark, SF).collect()
    }
    assert jac <= cont
