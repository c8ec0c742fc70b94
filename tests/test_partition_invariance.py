"""Partition-invariance certification: the engine's results must not
depend on cluster topology. docs/SCALE.md's design rule is that every
operator pins its float evaluation order (folds, decimal means,
content-derived salts) instead of relying on reduction order — these
tests actually vary the physical layout (shuffle partition count AND a
forced input re-split) and assert the collected results are IDENTICAL,
cell for cell.

A query that passed its DuckDB oracle but failed here would be one
whose determinism is an accident of local[32]'s scheduling — exactly
the class of bug that only shows up on a real cluster."""

from __future__ import annotations

import pytest

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

# order-sensitivity risk spots: decimal-mean loops, Arrow fast paths,
# salted aggs, window ties, sketch register sums, mapInPandas batching
CASES = [
    "pivot_wide",
    "extents",
    "skew_salted_agg",
    "embedding_pq_topk",
    "embedding_kmeans",
    "hll_sql_counts",
    "dedup_clusters",
    "media_features",
    "quality_gopher_rules",
    "dedup_minhash_pairs",
    "tfidf_similar_pairs",
    "curation_pipeline",
    # newly-claimed deterministic float accumulations (round 4):
    # id-order folds in the pagerank fast path, value-sorted folds in
    # the stateful streaming batch update
    "doc_pagerank",
    "events_stateful_running",
    # round 6: window-selection dedup (winnowing) and the
    # decimal-sum-then-DOUBLE finals of the fixed wave17/18 class —
    # both claim partition-order-invariant float/int results
    "winnow_fingerprints",
    "winnow_pairs",
    "incremental_agg_merge",
    "corrupt_record_quarantine",
    # wave 20: the BPE argmax tie-break (count DESC, l, r) and the
    # integer anomaly flag both claim layout-independence — the argmax
    # rides a LIMIT over a shuffled agg, the classic risk spot
    "bpe_merges",
    "events_rolling_anomaly",
]


def _rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.collect():
        out.append(tuple(r[c] for c in cols))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_partitioning(spark, sf_dir, name):
    spec = REGISTRY[name]
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spec.fn(spark, sf_dir))
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(spec.fn(spark, sf_dir))
        spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
    assert a == b, f"{name} result depends on shuffle partition count"
