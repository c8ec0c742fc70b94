"""Benchmark harness — times the engine's headline queries.

Runs each named query from the registry at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced through the full plan with the noop sink (distributed
execution, no driver collect). A tiny warmup query first so JVM/codegen
startup is not billed to the first measured query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries  # noqa: E402
from map_v2_etl_spark.session import get_spark  # noqa: E402

all_queries()  # import side-effect: register every query module

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference's three core jobs (pivot, extents, join+slice)
# plus representative heavy operators from the extension surface.
HEADLINE = [
    "pivot_wide",
    "extents",
    "attr_join",
    "column_slice",
    "topk_per_group",
    "window_analytics",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "asof_join",
    "range_join",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "embedding_cosine_topk",
    "text_quality",
    "events_tumbling_window",
    "events_session_windows",
    "decontaminate_docs",
    "fuzzy_name_pairs",
    "pack_sequences",
    "merge_upsert",
    "quality_gopher_rules",
    "bm25_scores",
    "pii_redact",
    "embedding_pq_topk",
    "ngram_lm_score",
    "dsir_weights",
    "chunk_documents",
    "zorder_layout",
    "text_collocations",
    "tfidf_similar_pairs",
    "dup_span_score",
    "curation_pipeline",
    "doc_pagerank",
    "dup_spans",
    "events_sliding_window",
    # wave 10/11 additions (round-2 verdict #9)
    "vocab_induction",
    "doc_oov_rate",
    "grouped_geomean",
    "events_enriched_stream",
    # wave 12
    "decontaminate_bloom",
    "ngram_containment",
    "block_dedup",
    "source_caps",
    # waves 13-16
    "containment_closure",
    "events_props_variant",
    "event_funnel",
    "cohort_retention",
    "nb_lang_classifier",
    "triangle_count",
    "column_histograms",
    "dedup_incremental",
    "events_topk_stream",
    "events_funnel_stream",
    # wave 17
    "orc_roundtrip",
    "partition_pruned_scan",
    "training_order",
    "curriculum_stages",
    # wave 18
    "corrupt_record_quarantine",
    "cdc_apply",
    "spatial_join_pip",
    "events_late_audit",
    "incremental_agg_merge",
    # round 4
    "hll_sql_counts",
    "media_features",
    "geo_mvt_tiles",
    "embedding_kmeans",
    "media_frame_sample",
    # round 6 (winnow_pairs subsumes the fingerprint selection subplan)
    "winnow_pairs",
    "bpe_merges",
    "events_rolling_anomaly",
    # round 8: the wave-21 shapes, deferred from r7 per VERDICT r6 item 4
    # (don't grow the headline before the driver total is confirmed);
    # solo sf0.1 cost measured in docs/ROUND7.md §11 (~2.4 s combined)
    "cdc_time_travel",
    "skew_split_join",
    "weighted_sample",
    # round 13: the composed 100 TB ANN shape (IVF routing x PQ codes)
    "ivf_pq_topk",
    # round 14: the persisted-index query path (train/encode once,
    # query many — includes the build+write+read in its wall, so the
    # number is an upper bound on what a deployment's query batch pays)
    "ann_index_topk",
    # the r15 lifecycle queries (compact/rebuild/merge) are NOT
    # headline entries: each is a self-contained composition paying
    # 1-2 one-time index builds plus (for compact) ~3x n_cells file
    # creates at sf0.1's pathological 10-rows-per-cell ratio — wall
    # measures filesystem churn, not plan cost (21s observed, r15).
    # bench_scale's ann_index_maintenance cell times the phases
    # separately at 150k+ rows where data amortizes the per-file cost
    # (stream 3.4-6.6s, compact ~1-1.5s, query near-flat 2.6-3.7s).
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


WARMUP_SF_DIR = os.environ.get(
    "SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001"
)


def main() -> None:
    spark = get_spark("m2e-bench")
    # warmup: run every headline plan once at the smallest SF so JVM
    # spin-up, codegen compilation, and JIT are not billed to the
    # measured run — measurements then reflect steady-state throughput
    force(spark.range(1000).selectExpr("sum(id) as s"))
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is not None:
            try:
                force(spec.fn(spark, WARMUP_SF_DIR))
            except Exception:
                pass  # warmup is best-effort
    # drop every block the warmup's persisting queries stranded, so the
    # first measured query does not run under accumulated cache pressure
    spark.catalog.clearCache()

    # best-of-2: single-shot timings on a 32-thread local JVM carry
    # multi-second scheduler/JIT jitter (measured: same warm plan swinging
    # 2.4s -> 14s run-to-run); min-of-two is the steady-state throughput
    # the plan actually has, which is what round-over-round deltas should
    # track
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue  # not yet implemented this round
        best = None
        for _ in range(2):
            t0 = time.time()
            force(spec.fn(spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # clear BETWEEN reps, not just between queries: a query
            # that persists internal tables would otherwise serve rep 2
            # from rep 1's cached blocks (CacheManager matches the
            # identical plan), making min-of-two measure the warm-cache
            # path for persisting queries and true re-runs for the
            # rest — two incomparable regimes in one headline number
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    sf_token = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_token)
    except ValueError:
        sf = None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    # Parse-resilience alias (r18, VERDICT r17 item 10): the driver's
    # BENCH artifact keeps only the last 2000 chars of stdout, and the
    # full per-query line is ~2.4 KB — BENCH_r16's line was lost to the
    # round-over-round comparison that way (PERF_r17 prev_bench_ok:
    # false). The full line above is UNCHANGED (same keys, printed
    # first); this second, totals-only line fits any truncation window
    # whole, so the headline total survives even when the per-query
    # map does not. Flagged "alias" so no consumer can double-count.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "alias": "totals_only_reprint_of_line_above",
            }
        )
    )


if __name__ == "__main__":
    main()
