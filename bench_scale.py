"""Distributed-regime scale bench — the 100x proof for gate-bounded operators.

Several heavy operators run a bounded DRIVER regime below a documented
size gate (pagerank, connected components, triangle counting, Lloyd
k-means, PQ codebook training) because at bench scale (sf0.1) the
iterative-join machinery is pure overhead. At 100 TB only the
DISTRIBUTED paths run — and through round 6 those paths were
correctness-tested (regime-parity tests force the gates) but never
TIMED. This harness closes that gap:

  * generates synthetic inputs ABOVE each gate with spark.range + hash
    arithmetic — fully distributed generation, no Python UDFs, no
    driver-side materialization, deterministic row-for-row;
  * times each distributed path at TWO sizes (1x and 2x rows) so the
    scaling exponent is measured, not argued;
  * records Spark job/stage counts per operator via the status tracker
    (shuffle_stages = stages - jobs: every stage beyond its job's
    result stage is a shuffle-boundary stage — the runtime counterpart
    of the Exchange counts audited statically in docs/PLANS.md).

Output: one JSON line on stdout (the bench.py convention) and
BENCH_SCALE.json next to this file.

Usage:  python bench_scale.py            # full suite, ~5-10 min local[32]
        python bench_scale.py pagerank   # one operator
Env:    SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SCALE_MULT (default 1
        — multiplies every size; the gates stay fixed, so >=1 keeps all
        runs in the distributed regime), SPARK_GRAFT_SCALE_OUT
        (artifact path; "-" prints only — sweeps must not clobber the
        curated best-of-N BENCH_SCALE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = float(os.environ.get("SPARK_GRAFT_SCALE_MULT", "1"))
HERE = os.path.dirname(os.path.abspath(__file__))


# --------------------------------------------------------------------------
# deterministic synthetic generators (distributed: spark.range + hash mixes)
# --------------------------------------------------------------------------


def gen_nodes(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(F.col("id"))


def gen_edges(spark: SparkSession, n_nodes: int, out_deg: int) -> DataFrame:
    """~n_nodes*out_deg directed edges: src = i div k, dst = a hash mix
    of (src, slot) mod n — self-loops dropped. Hash targets spread
    near-uniformly, so degree skew stays mild and wedge volume is a
    function of out_deg (the knob the sizes below are chosen with)."""
    return (
        spark.range(n_nodes * out_deg)
        .select(
            (F.col("id") / out_deg).cast("long").alias("src"),
            F.pmod(
                F.xxhash64(F.col("id"), F.lit(0x5CA1E)), F.lit(n_nodes)
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def gen_chain_edges(
    spark: SparkSession, n_nodes: int, comp_size: int
) -> DataFrame:
    """Path components of comp_size vertices each (diameter comp_size-1):
    the shape where min-label pays O(d) rounds and large/small-star
    pays O(log d) — the comparison the star variant exists for."""
    return (
        spark.range(n_nodes)
        .filter(F.pmod(F.col("id"), F.lit(comp_size)) != comp_size - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )


def gen_embeddings(spark: SparkSession, n: int, dim: int) -> DataFrame:
    """(vec_id, embedding array<double> in [0,1)^dim), hash-derived."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(
                        F.xxhash64(F.col("id"), F.lit(j)), F.lit(100_000)
                    )
                    / 100_000.0
                ).alias(f"x{j}")
                for j in range(dim)
            ]
        ).alias("embedding"),
    )


def gen_pair_edges(
    spark: SparkSession, n_nodes: int, out_deg: int
) -> DataFrame:
    """Undirected once-per-pair (a < b) edge list for triangle_counts,
    with a planted triangle motif (consecutive-id edges i—i+1, i—i+2)
    so the count is nonzero and the closing join does real work."""
    hashed = gen_edges(spark, n_nodes, out_deg - 2).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    planted = (
        spark.range(n_nodes * 2)
        .select(
            (F.col("id") / 2).cast("long").alias("i"),
            (F.pmod(F.col("id"), F.lit(2)) + 1).alias("step"),
        )
        .select(F.col("i").alias("a"), (F.col("i") + F.col("step")).alias("b"))
        .filter(F.col("b") < n_nodes)
    )
    return hashed.union(planted).distinct()


def gen_docs(spark: SparkSession, n: int, length: int = 30) -> DataFrame:
    """(doc_id, text) with planted near-dup structure: docs 2i and 2i+1
    share a base token sequence; the odd twin differs in exactly ONE
    position, so (even, odd) pairs sit at token-Jaccard ≈ (L-1)/(L+1)
    — above every 0.8 screening threshold — while unrelated docs share
    almost nothing. Token identities are hash-derived from a 100k-word
    space, so shingle/fingerprint tables carry realistic cardinality
    instead of collapsing onto a toy vocabulary."""
    base = (F.col("id") / 2).cast("long")
    alt = F.concat(
        F.lit("x"), F.pmod(F.xxhash64(base, F.lit(0xA17)), F.lit(100_000))
    )
    swap_pos = F.pmod(base, F.lit(length))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(length - 1)),
        lambda j: F.when(
            (F.pmod(F.col("id"), F.lit(2)) == 1) & (j == swap_pos), alt
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(base * 31 + j * 7, F.lit(0xD0C5)),
                    F.lit(100_000),
                ),
            )
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text")
    )


def gen_word_docs(spark: SparkSession, n: int, words_per_doc: int = 20,
                  vocab: int | None = None) -> DataFrame:
    """(doc_id, text) whose WORD vocabulary scales with the corpus
    (default n distinct words): the regime where BPE's distributed
    word_counts/pair_counts tables are real aggregates, not a toy
    constant. Words are base-36 renderings of hash values, so merge
    rounds see genuine character-pair statistics."""
    v = vocab or max(1000, n)
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda j: F.conv(
            F.pmod(
                F.xxhash64(F.col("id") * 131 + j * 17, F.lit(0xB9E)),
                F.lit(v),
            ).cast("string"),
            10,
            36,
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text")
    )


# --------------------------------------------------------------------------
# measurement
# --------------------------------------------------------------------------


_TIMED_SEQ = [0]


def timed(spark: SparkSession, label: str, fn) -> dict:
    """Run fn() under its own job group; wall clock + job/stage counts.

    The job-group id carries a per-invocation sequence suffix: repeated
    cells (the discarded steady-state warm-up rep runs the SAME label
    twice) must not pool their jobs into one group or the recorded
    jobs/stages double-count."""
    sc = spark.sparkContext
    spark.catalog.clearCache()
    _TIMED_SEQ[0] += 1
    label = f"{label}#{_TIMED_SEQ[0]}"
    sc.setJobGroup(label, label, interruptOnCancel=False)
    t0 = time.perf_counter()
    result = fn()
    wall = time.perf_counter() - t0
    sc.setJobGroup("idle", "idle", interruptOnCancel=False)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(label)
    n_stages = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is not None:
            n_stages += len(info.stageIds)
    rec = {
        "wall_sec": round(wall, 3),
        "jobs": len(job_ids),
        "stages": n_stages,
        "shuffle_stages": max(0, n_stages - len(job_ids)),
    }
    if isinstance(result, dict):
        rec.update(result)
    return rec


# --------------------------------------------------------------------------
# the distributed-regime workloads (sizes are ABOVE every gate at MULT=1)
# --------------------------------------------------------------------------


def bench_pagerank(spark: SparkSession, frac: float) -> dict:
    from map_v2_etl_spark.operators.graph import pagerank

    n = int(300_000 * MULT * frac)  # gate: 200k nodes / 2M edges
    k, iters = 6, 5
    nodes = gen_nodes(spark, n)
    edges = gen_edges(spark, n, k)

    def run():
        out = pagerank(nodes, edges, iters=iters)
        rows = out.count()
        mass = out.agg(F.sum("rank")).first()[0]
        return {
            "n_nodes": n,
            "n_edges": n * k,
            "iters": iters,
            "out_rows": rows,
            "rank_mass": round(float(mass), 6),
        }

    rec = timed(spark, f"pagerank_{frac}x", run)
    rec["per_iter_sec"] = round(rec["wall_sec"] / iters, 3)
    return rec


def bench_cc_minlabel(spark: SparkSession, frac: float) -> dict:
    from map_v2_etl_spark.operators.dedup import connected_components

    n = int(400_000 * MULT * frac)  # gate: 200k vertices
    comp = 8  # diameter 7 -> ~8 min-label rounds
    verts = gen_nodes(spark, n)
    edges = gen_chain_edges(spark, n, comp)

    def run():
        out = connected_components(
            verts, edges, max_iter=comp + 4
        )
        n_clusters = out.select("cluster").distinct().count()
        return {
            "n_vertices": n,
            "comp_size": comp,
            "clusters": n_clusters,
            "expected_clusters": (n + comp - 1) // comp,
        }

    return timed(spark, f"cc_minlabel_{frac}x", run)


def bench_cc_star(spark: SparkSession, frac: float) -> dict:
    from map_v2_etl_spark.operators.dedup import connected_components_star

    n = int(400_000 * MULT * frac)
    comp = 64  # diameter 63: min-label would need ~64 rounds, star ~log2
    verts = gen_nodes(spark, n)
    edges = gen_chain_edges(spark, n, comp)

    def run():
        out = connected_components_star(verts, edges, max_iter=20)
        n_clusters = out.select("cluster").distinct().count()
        return {
            "n_vertices": n,
            "comp_size": comp,
            "clusters": n_clusters,
            "expected_clusters": (n + comp - 1) // comp,
        }

    return timed(spark, f"cc_star_{frac}x", run)


def bench_lloyd(spark: SparkSession, frac: float) -> dict:
    from map_v2_etl_spark.operators.similarity import lloyd_centroids

    dim = 16  # gate: 16M/dim = 1M rows
    n = int(1_100_000 * MULT * frac)
    k, iters = 8, 3
    emb = gen_embeddings(spark, n, dim)

    def run():
        cents = lloyd_centroids(emb, k=k, iters=iters)
        return {
            "n_rows": n,
            "dim": dim,
            "k": k,
            "iters": iters,
            "centroid_checksum": round(
                sum(sum(c) for c in cents), 6
            ),
        }

    rec = timed(spark, f"lloyd_{frac}x", run)
    rec["per_iter_sec"] = round(rec["wall_sec"] / iters, 3)
    return rec


def bench_pq_train(spark: SparkSession, frac: float) -> dict:
    from map_v2_etl_spark.operators.similarity import pq_train

    dim = 16
    n = int(1_100_000 * MULT * frac)
    m, ksub, iters = 4, 16, 2
    emb = gen_embeddings(spark, n, dim)

    def run():
        books = pq_train(emb, m=m, ksub=ksub, iters=iters)
        return {
            "n_rows": n,
            "dim": dim,
            "m": m,
            "ksub": ksub,
            "iters": iters,
            "codebook_checksum": round(
                sum(sum(sum(c) for c in sub) for sub in books), 6
            ),
        }

    rec = timed(spark, f"pq_train_{frac}x", run)
    rec["per_iter_sec"] = round(rec["wall_sec"] / iters, 3)
    return rec


def bench_ivf_pq(spark: SparkSession, frac: float) -> dict:
    """IVF-routed PQ ANN (operators/similarity.ivf_pq_topk, r13): the
    cell fixes the number of coarse cells (the deployment practice —
    Faiss nlist is chosen for the index, not per-ingest), so BOTH
    corpus-sized passes scale linearly: coarse assignment is
    |corpus| x n_cells broadcast work and the routed ADC scan touches
    ~nprobe/n_cells of the coded corpus per query."""
    from map_v2_etl_spark.operators.similarity import ivf_pq_topk

    dim = 16
    n = int(150_000 * MULT * frac)
    n_cells = 512
    stride = max(1, n // n_cells)
    emb = gen_embeddings(spark, n, dim)
    qs = emb.filter(F.col("vec_id") % max(1, n // 32) == 0)

    def run():
        out = ivf_pq_topk(
            emb, qs, k=5, m=4, ksub=16, candidates=50,
            centroid_stride=stride, nprobe=8, dim=dim,
            train_sample_mod=max(1, n // 60_000),
        )
        agg = out.agg(
            F.count("*").alias("rows"), F.sum("rank").alias("ranksum")
        ).first()
        return {
            "n_rows": n,
            "dim": dim,
            "n_cells_target": n_cells,
            "stride": stride,
            "nprobe": 8,
            "result_rows": agg["rows"],
            "rank_sum": int(agg["ranksum"]),
        }

    return timed(spark, f"ivf_pq_{frac}x", run)


def bench_ivf_pq_residual(spark: SparkSession, frac: float) -> dict:
    """Residual IVF-PQ (operators/similarity.ivf_pq_residual_topk,
    r13): same fixed-nlist protocol as the ivf_pq cell plus the
    residual variant's intrinsic extra — one corpus-wide
    (id, dim-double) shuffle joining vectors with their checkpointed
    coarse assignment. Linear-per-pass like ivf_pq; the cell watches
    that the extra pass stays a constant factor, not a new curve."""
    from map_v2_etl_spark.operators.similarity import ivf_pq_residual_topk

    dim = 16
    n = int(150_000 * MULT * frac)
    n_cells = 512
    stride = max(1, n // n_cells)
    emb = gen_embeddings(spark, n, dim)
    qs = emb.filter(F.col("vec_id") % max(1, n // 32) == 0)

    def run():
        out = ivf_pq_residual_topk(
            emb, qs, k=5, m=4, ksub=16, candidates=50,
            centroid_stride=stride, nprobe=8, dim=dim,
            train_sample_mod=max(1, n // 60_000),
        )
        agg = out.agg(
            F.count("*").alias("rows"), F.sum("rank").alias("ranksum")
        ).first()
        return {
            "n_rows": n,
            "dim": dim,
            "n_cells_target": n_cells,
            "stride": stride,
            "nprobe": 8,
            "result_rows": agg["rows"],
            "rank_sum": int(agg["ranksum"]),
        }

    return timed(spark, f"ivf_pq_residual_{frac}x", run)


def bench_ivf_pq_residual_fused(spark: SparkSession, frac: float) -> dict:
    """Residual IVF-PQ through the FUSED corpus regime (fused=True):
    assignment + residual + encode as one Arrow-batched mapInPandas
    pass, centroids driver-held — zero corpus-side joins/shuffles.
    Same sizes as the unfused cell, so the pair measures exactly what
    the fusion buys at scale (bit-identical results, fuzz-pinned)."""
    from map_v2_etl_spark.operators.similarity import ivf_pq_residual_topk

    dim = 16
    n = int(150_000 * MULT * frac)
    n_cells = 512
    stride = max(1, n // n_cells)
    emb = gen_embeddings(spark, n, dim)
    qs = emb.filter(F.col("vec_id") % max(1, n // 32) == 0)

    def run():
        out = ivf_pq_residual_topk(
            emb, qs, k=5, m=4, ksub=16, candidates=50,
            centroid_stride=stride, nprobe=8, dim=dim,
            train_sample_mod=max(1, n // 60_000), fused=True,
        )
        agg = out.agg(
            F.count("*").alias("rows"), F.sum("rank").alias("ranksum")
        ).first()
        return {
            "n_rows": n,
            "dim": dim,
            "n_cells_target": n_cells,
            "stride": stride,
            "nprobe": 8,
            "result_rows": agg["rows"],
            "rank_sum": int(agg["ranksum"]),
        }

    return timed(spark, f"ivf_pq_residual_fused_{frac}x", run)


def bench_ivf_sq(spark: SparkSession, frac: float) -> dict:
    """IVF-SQ8 (operators/similarity.ivf_sq_topk, r14): same
    fixed-nlist protocol and sizes as the ivf_pq cells. The whole
    pipeline is JVM codegen (min/max train pass + indexed-transform
    encode — no Arrow, no Lloyd rounds), so this cell watches the
    scalar family stay at-or-under the PQ cells' walls while carrying
    16x the code payload (dim bytes vs m)."""
    from map_v2_etl_spark.operators.similarity import ivf_sq_topk

    dim = 16
    n = int(150_000 * MULT * frac)
    n_cells = 512
    stride = max(1, n // n_cells)
    emb = gen_embeddings(spark, n, dim)
    qs = emb.filter(F.col("vec_id") % max(1, n // 32) == 0)

    def run():
        out = ivf_sq_topk(
            emb, qs, k=5, candidates=50,
            centroid_stride=stride, nprobe=8, dim=dim,
            train_sample_mod=max(1, n // 60_000),
        )
        agg = out.agg(
            F.count("*").alias("rows"), F.sum("rank").alias("ranksum")
        ).first()
        return {
            "n_rows": n,
            "dim": dim,
            "n_cells_target": n_cells,
            "stride": stride,
            "nprobe": 8,
            "result_rows": agg["rows"],
            "rank_sum": int(agg["ranksum"]),
        }

    return timed(spark, f"ivf_sq_{frac}x", run)


def bench_ann_index_query(spark: SparkSession, frac: float) -> dict:
    """QUERY-ONLY cost against a PERSISTED residual IVF-PQ index
    (operators/similarity.ann_index_build/write/read/topk, r14): the
    build (fused train+encode, the two corpus passes) runs ONCE
    outside the timer and persists to parquet; the timed region is
    what every subsequent query batch pays — probe selection, LUT,
    the pruned coded-list scan, candidate re-rank. Same sizes/params
    as the ivf_pq_residual cells, so the trio measures exactly what
    the amortization buys (the r13 verdict's '100 TB ANN cost')."""
    import tempfile

    from map_v2_etl_spark.operators.similarity import (
        ann_index_build,
        ann_index_read,
        ann_index_topk,
        ann_index_write,
    )

    dim = 16
    n = int(150_000 * MULT * frac)
    n_cells = 512
    stride = max(1, n // n_cells)
    emb = gen_embeddings(spark, n, dim)
    qs = emb.filter(F.col("vec_id") % max(1, n // 32) == 0)
    t_build0 = time.perf_counter()
    index = ann_index_build(
        emb, m=4, ksub=16, centroid_stride=stride, dim=dim,
        train_sample_mod=max(1, n // 60_000),
    )
    path = tempfile.mkdtemp(prefix="ann_idx_bench_")
    ann_index_write(index, path)
    index = ann_index_read(spark, path)
    build_sec = round(time.perf_counter() - t_build0, 3)

    def run():
        out = ann_index_topk(
            index, qs, emb, k=5, candidates=50, nprobe=8
        )
        agg = out.agg(
            F.count("*").alias("rows"), F.sum("rank").alias("ranksum")
        ).first()
        return {
            "n_rows": n,
            "dim": dim,
            "n_cells_target": n_cells,
            "stride": stride,
            "nprobe": 8,
            "build_write_read_sec_untimed": build_sec,
            "result_rows": agg["rows"],
            "rank_sum": int(agg["ranksum"]),
        }

    return timed(spark, f"ann_index_query_{frac}x", run)


def bench_ann_index_maintenance(spark: SparkSession, frac: float) -> dict:
    """INDEX MAINTENANCE cost (r15): the timed region is what a
    deployment pays per maintenance cycle on an already-built index —
    a 3-micro-batch STREAMING add of 1/4 of the corpus (frozen
    quantizers, batchId-keyed exactly-once publish), a COMPACTION of
    the fragmented lists (read + clustered rewrite + atomic swap), and
    one post-compaction query batch. Build+write run once outside the
    timer (bench_ann_index_query's protocol). The cell watches that
    maintenance scales with |corpus| like the encode pass does
    (linear, no Lloyd, no training) and that the post-compact query
    matches the ann_index_query cell's near-flat profile — i.e. the
    lifecycle operators add no superlinear term on top of the
    certified paths they compose."""
    import tempfile

    from map_v2_etl_spark.operators.similarity import (
        ann_index_build,
        ann_index_compact,
        ann_index_topk,
        ann_index_write,
    )
    from map_v2_etl_spark.streaming.ann_maintenance import (
        ann_index_stream_add,
    )

    dim = 16
    n = int(150_000 * MULT * frac)
    n_cells = 512
    # ODD stride: the base excludes vec_id % 4 == 0, so an even stride
    # that is also a multiple of 4 would strand the coarse codebook
    # with zero members (every multiple would be a filtered-out id)
    stride = max(1, n // n_cells) | 1
    emb = gen_embeddings(spark, n, dim)
    base = emb.filter(F.col("vec_id") % 4 != 0)
    arrivals_df = emb.filter(F.col("vec_id") % 4 == 0)
    qs = emb.filter(F.col("vec_id") % max(1, n // 32) == 0)
    t_build0 = time.perf_counter()
    index = ann_index_build(
        base, m=4, ksub=16, centroid_stride=stride, dim=dim,
        train_sample_mod=max(1, n // 60_000),
    )
    path = tempfile.mkdtemp(prefix="ann_idx_maint_")
    ann_index_write(index, path)
    build_sec = round(time.perf_counter() - t_build0, 3)
    arrivals = path + "/_arrivals"
    arrivals_df.repartition(3).write.mode("overwrite").parquet(arrivals)

    def run():
        t0 = time.perf_counter()
        ann_index_stream_add(spark, path, arrivals)
        t1 = time.perf_counter()
        index2 = ann_index_compact(spark, path)
        t2 = time.perf_counter()
        out = ann_index_topk(index2, qs, emb, k=5, candidates=50, nprobe=8)
        agg = out.agg(
            F.count("*").alias("rows"), F.sum("rank").alias("ranksum")
        ).first()
        t3 = time.perf_counter()
        return {
            "n_rows": n,
            "dim": dim,
            "n_cells_target": n_cells,
            "stride": stride,
            "arrivals_rows_approx": n // 4,
            "build_write_sec_untimed": build_sec,
            "stream_add_sec": round(t1 - t0, 3),
            "compact_sec": round(t2 - t1, 3),
            "query_sec": round(t3 - t2, 3),
            "result_rows": agg["rows"],
            "rank_sum": int(agg["ranksum"]),
        }

    return timed(spark, f"ann_index_maintenance_{frac}x", run)


def bench_manifest_maintenance(spark: SparkSession, frac: float) -> dict:
    """ann_index_maintenance's twin on the MANIFEST layout (r16): the
    identical maintenance cycle — 3-micro-batch stream add, compaction,
    one query batch — with the coded table as a manifest-log table
    (each batch ONE batchId-tagged CAS commit; the compaction ONE
    replace-commit). Watches that the transactional layer's overhead is
    O(1) per operation — bytes of JSON plus a hardlink CAS — on top of
    the same encode/rewrite/query plans, i.e. the two cells' walls
    should track each other at every scale while this one buys
    compaction-vs-append safety and replay-across-compaction."""
    import tempfile

    from map_v2_etl_spark.operators.similarity import (
        ann_index_build,
        ann_index_compact,
        ann_index_topk,
        ann_index_write,
    )
    from map_v2_etl_spark.sources.manifest_log import log_current
    from map_v2_etl_spark.streaming.ann_maintenance import (
        ann_index_stream_add,
    )

    dim = 16
    n = int(150_000 * MULT * frac)
    n_cells = 512
    stride = max(1, n // n_cells) | 1
    emb = gen_embeddings(spark, n, dim)
    base = emb.filter(F.col("vec_id") % 4 != 0)
    arrivals_df = emb.filter(F.col("vec_id") % 4 == 0)
    qs = emb.filter(F.col("vec_id") % max(1, n // 32) == 0)
    t_build0 = time.perf_counter()
    index = ann_index_build(
        base, m=4, ksub=16, centroid_stride=stride, dim=dim,
        train_sample_mod=max(1, n // 60_000),
    )
    path = tempfile.mkdtemp(prefix="ann_idx_mlog_")
    ann_index_write(index, path, layout="manifest")
    build_sec = round(time.perf_counter() - t_build0, 3)
    arrivals = path + "/_arrivals"
    arrivals_df.repartition(3).write.mode("overwrite").parquet(arrivals)

    def run():
        t0 = time.perf_counter()
        ann_index_stream_add(spark, path, arrivals)
        t1 = time.perf_counter()
        index2 = ann_index_compact(spark, path)
        t2 = time.perf_counter()
        out = ann_index_topk(index2, qs, emb, k=5, candidates=50, nprobe=8)
        agg = out.agg(
            F.count("*").alias("rows"), F.sum("rank").alias("ranksum")
        ).first()
        t3 = time.perf_counter()
        cur = log_current(path + "/coded")
        return {
            "n_rows": n,
            "dim": dim,
            "n_cells_target": n_cells,
            "stride": stride,
            "arrivals_rows_approx": n // 4,
            "build_write_sec_untimed": build_sec,
            "stream_add_sec": round(t1 - t0, 3),
            "compact_sec": round(t2 - t1, 3),
            "query_sec": round(t3 - t2, 3),
            "log_version": cur["version"],
            "live_files": len(cur["files"]),
            "result_rows": agg["rows"],
            "rank_sum": int(agg["ranksum"]),
        }

    return timed(spark, f"manifest_maintenance_{frac}x", run)


def bench_manifest_pruned_read(spark: SparkSession, frac: float) -> dict:
    """Stats-based file skip on the commit log (r17): a range-clustered
    log table (64 files, footer stats recorded distributed at append —
    the mapInPandas fan-out path, since 64 >= the distribute
    threshold), then the same keyed aggregate through (a) a
    log_read(prune=) plan that opens ONLY the ~1/16-of-keyspace
    overlapping files and (b) the full-snapshot plan. Watches that the
    pruned wall stays near-flat as the table grows (the skip is
    manifest JSON, not IO) while the full-scan wall grows with the
    data — Iceberg's stats-skip value proposition, measured."""
    import tempfile

    from map_v2_etl_spark.sources import manifest_log as ML

    n = int(2_000_000 * MULT * frac)
    df = (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .repartitionByRange(64, "k")
        .sortWithinPartitions("k")
    )
    root = tempfile.mkdtemp(prefix="mlog_pruned_") + "/t"
    ML.log_init(root)
    t_append0 = time.perf_counter()
    ML.log_append(df, root, note="range append")
    append_sec = round(time.perf_counter() - t_append0, 3)
    cur = ML.log_current(root)
    lo, hi = n // 2, n // 2 + n // 16
    planned = ML.prune_files(cur, {"k": (lo, hi)})

    def run():
        cond = F.col("k").between(lo, hi)
        t0 = time.perf_counter()
        pruned = (
            ML.log_read(spark, root, prune={"k": (lo, hi)})
            .filter(cond)
            .agg(
                F.count("*").alias("rows"),
                F.sum("v").alias("vsum"),
            )
            .first()
        )
        t1 = time.perf_counter()
        full = (
            ML.log_read(spark, root)
            .filter(cond)
            .agg(
                F.count("*").alias("rows"),
                F.sum("v").alias("vsum"),
            )
            .first()
        )
        t2 = time.perf_counter()
        assert (pruned["rows"], pruned["vsum"]) == (
            full["rows"], full["vsum"],
        )
        return {
            "n_rows": n,
            "append_with_stats_sec_untimed": append_sec,
            "files_total": len(cur["files"]),
            "files_planned": len(planned),
            "pruned_read_sec": round(t1 - t0, 3),
            "full_read_sec": round(t2 - t1, 3),
            "result_rows": pruned["rows"],
        }

    return timed(spark, f"manifest_pruned_read_{frac}x", run)


def bench_span_dedup(spark: SparkSession, frac: float) -> dict:
    """Cross-doc exact substring dedup (operators/dedup.
    cross_doc_span_dedup, wave 42): gen_docs plants a shared base
    sequence in every (2i, 2i+1) twin pair, so ~half the corpus's
    k-gram volume is genuinely duplicated — the worst realistic case
    for the anchor table (duplicated volume scales WITH the corpus,
    not just the gram explode). Watches the one big shuffle (k-gram
    anchors) and the position-marking explode stay linear."""
    from map_v2_etl_spark.operators.dedup import cross_doc_span_dedup

    n = int(60_000 * MULT * frac)
    docs = gen_docs(spark, n, length=30)

    def run():
        out = cross_doc_span_dedup(docs, k=8)
        agg = out.agg(
            F.count("*").alias("rows"),
            F.sum("n_removed").alias("removed"),
            F.sum("n_tokens").alias("toks"),
        ).first()
        return {
            "n_docs": n,
            "k": 8,
            "result_rows": agg["rows"],
            "tokens_total": int(agg["toks"]),
            "tokens_removed": int(agg["removed"]),
        }

    return timed(spark, f"span_dedup_{frac}x", run)


def bench_span_dedup_skew(spark: SparkSession, frac: float) -> dict:
    """r14 skew cell — the SCALE.md boilerplate watch item as a
    measured cell: EVERY doc carries the same 8-token prefix (one gram
    with n occurrences plus its hot bridge grams — the pathological
    header/footer shape), run through max_occurrences=1000. The count
    pass collapses the hot grams map-side and the broadcast anti-join
    drops them BEFORE the ranking window, so wall should track the
    un-skewed span_dedup cell instead of one window partition sorting
    n rows."""
    from map_v2_etl_spark.operators.dedup import cross_doc_span_dedup

    n = int(60_000 * MULT * frac)
    docs = gen_docs(spark, n, length=30).select(
        "doc_id",
        F.concat(
            F.lit("b0 b1 b2 b3 b4 b5 b6 b7 "), F.col("text")
        ).alias("text"),
    )

    def run():
        out = cross_doc_span_dedup(docs, k=8, max_occurrences=1000)
        agg = out.agg(
            F.count("*").alias("rows"),
            F.sum("n_removed").alias("removed"),
            F.sum("n_tokens").alias("toks"),
        ).first()
        return {
            "n_docs": n,
            "k": 8,
            "max_occurrences": 1000,
            "planted_hot_gram_occurrences": n,
            "result_rows": agg["rows"],
            "tokens_total": int(agg["toks"]),
            "tokens_removed": int(agg["removed"]),
        }

    return timed(spark, f"span_dedup_skew_{frac}x", run)


def bench_triangles(spark: SparkSession, frac: float) -> dict:
    from map_v2_etl_spark.operators.graph import triangle_counts

    n = int(600_000 * MULT * frac)  # gate: 2M edges / 8k dense nodes
    k = 6  # ~n*(k-2) hashed + 2n planted ≈ 3.6M edges at 1x
    e = gen_pair_edges(spark, n, k)

    def run():
        out = triangle_counts(e)
        total = out.agg(
            F.count("*").alias("v"), F.sum("n_triangles").alias("t")
        ).first()
        return {
            "n_nodes": n,
            "vertices_in_triangles": total["v"],
            "triangle_incidences": int(total["t"]),
        }

    return timed(spark, f"triangles_{frac}x", run)


def bench_skew_join(spark: SparkSession, frac: float) -> dict:
    """Generated-skew join shoot-out: the SAME fact (80% of rows on ONE
    key, the rest hash-spread over a 100k-key dim) aggregated through
    (a) the plain shuffle join — AQE skew-join handling ON, as in every
    engine session — and (b) operators.joins.hot_cold_split_join. Both
    paths must agree exactly (asserted in-run); the wall gap is the
    measured value of keeping hot rows out of the key shuffle vs
    letting AQE re-split oversized shuffle partitions after the fact.
    """
    from map_v2_etl_spark.operators.joins import hot_cold_split_join

    dim_n = 100_000
    n = int(5_000_000 * MULT * frac)
    fact = spark.range(n).select(
        F.when(
            F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(10)) < 8,
            F.lit(0),
        )
        .otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(dim_n)))
        .alias("k"),
        F.pmod(F.col("id"), F.lit(1000)).alias("v"),
    )
    dim = spark.range(dim_n).select(
        F.col("id").alias("k"), F.pmod(F.col("id"), F.lit(50)).alias("grp")
    )

    def agg(joined):
        rows = (
            joined.groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
            .collect()
        )
        return {(r["grp"], r["n"], r["s"]) for r in rows}

    # model the 100 TB condition the operator exists for: a dim too big
    # to broadcast. At bench size the 100k-row dim auto-broadcasts
    # (~1.6 MB < the 10 MB threshold) and a broadcast join has no key
    # shuffle to skew — so disable AUTO broadcast for both strategies
    # (the split join's hot leg broadcasts its bounded hot SLICE
    # explicitly, which is exactly its contract; the cold leg and the
    # plain join go through the skew-exposed SortMergeJoin, with AQE
    # skew handling live as in every engine session).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # time each strategy under its own job group for attribution
        t_plain = timed(
            spark,
            f"skew_plain_join_{frac}x",
            lambda: {"rows": agg(fact.join(dim, "k"))},
        )
        t_split = timed(
            spark,
            f"skew_split_join_{frac}x",
            lambda: {
                "rows": agg(hot_cold_split_join(fact, dim, "k", n // 100))
            },
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert t_plain["rows"] == t_split["rows"], "strategies disagree"
    res = {
        "wall_sec": t_split["wall_sec"],
        "jobs": t_split["jobs"],
        "stages": t_split["stages"],
        "shuffle_stages": t_split["shuffle_stages"],
        "plain_join_sec": t_plain["wall_sec"],
        "split_join_sec": t_split["wall_sec"],
        "speedup_vs_plain": round(
            t_plain["wall_sec"] / t_split["wall_sec"], 2
        )
        if t_split["wall_sec"]
        else None,
        "n_fact_rows": n,
        "dim_rows": dim_n,
        "hot_share": 0.8,
        "groups": len(t_split["rows"]),
    }
    return res


def bench_dpp(spark: SparkSession, frac: float) -> dict:
    """Dynamic-partition-pruning shoot-out: the SAME date-partitioned
    fact (60 partitions on disk, padded payload so scan cost is real)
    joined to a filtered 60-row dim keeping 10 keys, aggregated with
    the DPP optimizer rule OFF vs ON. Results must agree exactly; the
    wall gap is the measured value of runtime pruning — the fact scan
    lists 10/60 directories instead of all of them. The fixture write
    is setup, not measured.

    Two traps found (and dodged) while building this harness, both
    worth knowing when reasoning about DPP at 100 TB:
    * the dim MUST be opaque to constraint inference — a dim whose
      filter is a deterministic expression of the join key (e.g.
      ``range(60).filter(pmod(d,6)==0)``) lets Catalyst infer the
      predicate onto the fact STATICALLY (InferFiltersFromConstraints)
      and prune at plan time with the DPP rule off, collapsing the A/B
      to 1.0x. Here the dim is written to parquet and read back with
      an independent attribute column, so only runtime pruning can
      skip fact partitions — the same situation as a real dim table.
    * each timed run must build a FRESH reader — re-collecting over a
      reused DataFrame re-reads ~4x faster than a first read ever
      goes (session-level scan caching), burying the gap."""
    import shutil
    import tempfile

    # 30M rows x ~250B incompressible pad ≈ 7 GB on disk at 1x — full
    # scan ~2.8 s vs pruned ~0.8 s with a FRESH reader per run (see
    # below; a reused reader object re-scans 4x faster via session-
    # level scan caching and buries the gap under fixed overhead —
    # measured while building this bench)
    n = int(30_000_000 * MULT * frac)
    n_parts, kept = 60, 10
    path = tempfile.mkdtemp(prefix="m2e_scale_dpp_")
    try:
        fact = spark.range(n).select(
            F.pmod(F.col("id"), F.lit(n_parts)).alias("d"),
            F.pmod(F.col("id"), F.lit(1000)).alias("v"),
            # payload pad: makes the pruned bytes a real cost, as the
            # wide fact rows of a production table would be (sha output
            # is incompressible, so parquet cannot encode it away)
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.sha2(F.col("id").cast("string"), 224),
                F.sha2((F.col("id") + 1).cast("string"), 256),
                F.sha2((F.col("id") + 1).cast("string"), 224),
            ).alias("pad"),
        )
        fact.write.mode("overwrite").partitionBy("d").parquet(path)
        # dim as a REAL table: written to disk and read back so its
        # `region` column is opaque to the optimizer (no static
        # inference onto the fact — see docstring trap #1)
        dim_path = os.path.join(path, "_dim")
        spark.range(n_parts).select(
            F.col("id").alias("d"),
            F.pmod(F.col("id"), F.lit(5)).alias("grp"),
            F.pmod(F.col("id"), F.lit(n_parts // kept)).alias("region"),
        ).coalesce(1).write.mode("overwrite").parquet(dim_path)

        def joined():
            # FRESH reader + dim per run (docstring trap #2)
            on_disk = spark.read.parquet(path)
            dim = (
                spark.read.parquet(dim_path)
                .filter(F.col("region") == 0)
                .select("d", "grp")
            )
            return on_disk.join(dim, "d")

        def agg():
            rows = (
                joined()
                .groupBy("grp")
                .agg(
                    F.count("*").alias("n"),
                    F.sum("v").alias("s"),
                    F.sum(F.length("pad")).alias("b"),
                )
                .collect()
            )
            return {"rows": {(r["grp"], r["n"], r["s"], r["b"]) for r in rows}}

        conf = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
        prev = spark.conf.get(conf)

        def best_of_2(label):
            a = timed(spark, label + "_r1", agg)
            b = timed(spark, label + "_r2", agg)
            return a if a["wall_sec"] <= b["wall_sec"] else b

        try:
            spark.conf.set(conf, "false")
            t_off = best_of_2(f"dpp_off_{frac}x")
            spark.conf.set(conf, "true")
            t_on = best_of_2(f"dpp_on_{frac}x")
        finally:
            spark.conf.set(conf, prev)
        assert t_off["rows"] == t_on["rows"], "DPP changed the result"
        # the cluster-transferable metric: with the optimizer rule on,
        # the fact scan's PartitionFilters carry the dynamicpruning
        # subquery — assert it actually fired, then the 6x rows/bytes
        # reduction is arithmetic, not hope. (Wall clock on a page-
        # cache-warm local NVMe under 32 decode threads understates the
        # gap a bandwidth-bound cluster scan would see; both numbers
        # are recorded, the byte ratio is the one that transfers.)
        plan = (
            joined()
            .groupBy("grp")
            .agg(F.count("*").alias("n"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "dynamicpruning" in plan.lower(), "DPP did not fire"
        return {
            "wall_sec": t_on["wall_sec"],
            "jobs": t_on["jobs"],
            "stages": t_on["stages"],
            "shuffle_stages": t_on["shuffle_stages"],
            "dpp_off_sec": t_off["wall_sec"],
            "dpp_on_sec": t_on["wall_sec"],
            "speedup_vs_full_scan": round(
                t_off["wall_sec"] / t_on["wall_sec"], 2
            )
            if t_on["wall_sec"]
            else None,
            "n_fact_rows": n,
            "partitions_total": n_parts,
            "partitions_kept": kept,
            "rows_read_ratio": round(n_parts / kept, 2),
            "groups": len(t_on["rows"]),
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)


def bench_bloom_join(spark: SparkSession, frac: float) -> dict:
    """Runtime bloom-filter join A/B: a wide fact SMJ-joined to a
    SELECTIVE dim (1% of the key space survives its filter). With the
    rule off, every fact row is shuffled and discarded at the join;
    with it on, Catalyst builds a bloom filter from the dim side at
    runtime and injects `might_contain` into the fact SCAN, so ~99% of
    rows never enter the shuffle. This is the row-level sibling of the
    dpp op's partition-level runtime pruning — the pair covers both
    granularities of runtime filtering.

    Local-scale modeling, stated explicitly: the rule's application-
    side threshold defaults to 10 GB (it exists FOR the 100 TB
    condition), so the op lowers it to fire at bench size — the same
    move as skew_join's auto-broadcast disable, modeling the regime
    the operator exists for. Auto-broadcast is off so the join is the
    shuffle join the bloom filter actually protects. Results must
    agree exactly; the plan with the rule on is asserted to carry
    might_contain.

    Boundary measured while building this op (and why the fact is
    parquet-backed): with a RAM-resident spark.range fact the bloom
    arm was 0.75x — the per-row might_contain probe cost MORE than
    the shuffle it saved, because a generated fact has no scan cost
    to skip and a local shuffle runs at RAM speed. Against a real
    parquet scan the same filter wins 2-5x. That asymmetry is the
     10 GB default threshold's whole rationale: runtime row filters
    pay exactly when the application side is scan-bound."""
    import shutil
    import tempfile

    n = int(20_000_000 * MULT * frac)
    keyspace = 1_000_000
    path = tempfile.mkdtemp(prefix="m2e_scale_bloom_")
    spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(keyspace)).alias("k"),
        F.pmod(F.col("id"), F.lit(1000)).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).write.mode("overwrite").parquet(path)
    dim_path = os.path.join(path, "_dim")
    spark.range(keyspace).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(7)).alias("grp"),
        # opaque selectivity attr (read back from disk, like dpp's dim)
        F.pmod(F.xxhash64(F.col("id"), F.lit(9)), F.lit(100)).alias("sel"),
    ).coalesce(1).write.mode("overwrite").parquet(dim_path)

    def joined():
        # FRESH readers per run (the dpp op's trap #2)
        fact = spark.read.parquet(path)
        dim = (
            spark.read.parquet(dim_path)
            .filter(F.col("sel") == 0)
            .select("k", "grp")
        )
        return fact.join(dim, "k")

    def agg():
        rows = (
            joined()
            .groupBy("grp")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("s"),
                F.sum(F.length("pad")).alias("b"),
            )
            .collect()
        )
        return {"rows": {(r["grp"], r["n"], r["s"], r["b"]) for r in rows}}

    bloom_conf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    app_conf = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    # creation side: the 1M-key dim's plan stats exceed the default
    # 10 MB creation threshold (the rule would silently skip); at
    # 100 TB the equivalent dim is exactly the thing you RAISE this
    # for, so the op raises it — same modeling move as app_conf below
    create_conf = (
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    )
    def evict_fact() -> None:
        # Drop the fact parquet from the OS page cache (targeted
        # posix_fadvise DONTNEED per file, no global drop_caches) so
        # the cold arms measure the SCAN-BOUND regime the 10 GB
        # application-side threshold encodes — the r10 cell showed the
        # warm arms stop modeling it past ~20M rows because a
        # just-written fact is fully page-cached and the scan runs at
        # RAM speed.
        os.sync()  # fadvise only drops CLEAN pages
        for root_, _dirs, files in os.walk(path):
            if root_.startswith(dim_path):
                continue  # dim stays warm: it is broadcast-small
            for fname in files:
                fp = os.path.join(root_, fname)
                try:
                    fd = os.open(fp, os.O_RDONLY)
                except OSError:
                    continue
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                finally:
                    os.close(fd)

    prev_bloom = spark.conf.get(bloom_conf)
    prev_app = spark.conf.get(app_conf)
    prev_create = spark.conf.get(create_conf)
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set(bloom_conf, "false")
        evict_fact()
        t_off_cold = timed(spark, f"bloom_off_cold_{frac}x", agg)
        t_off = timed(spark, f"bloom_off_{frac}x", agg)
        spark.conf.set(bloom_conf, "true")
        spark.conf.set(app_conf, "0")
        spark.conf.set(create_conf, "1GB")
        plan = (
            joined()
            .groupBy("grp")
            .agg(F.count("*").alias("n"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "might_contain" in plan, "bloom filter did not inject"
        evict_fact()
        t_on_cold = timed(spark, f"bloom_on_cold_{frac}x", agg)
        t_on = timed(spark, f"bloom_on_{frac}x", agg)
    finally:
        spark.conf.set(bloom_conf, prev_bloom)
        spark.conf.set(app_conf, prev_app)
        spark.conf.set(create_conf, prev_create)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    assert t_off["rows"] == t_on["rows"], "bloom filter changed the result"
    shutil.rmtree(path, ignore_errors=True)
    return {
        "wall_sec": t_on["wall_sec"],
        "jobs": t_on["jobs"],
        "stages": t_on["stages"],
        "shuffle_stages": t_on["shuffle_stages"],
        "bloom_off_sec": t_off["wall_sec"],
        "bloom_on_sec": t_on["wall_sec"],
        "speedup_vs_no_bloom": round(t_off["wall_sec"] / t_on["wall_sec"], 2)
        if t_on["wall_sec"]
        else None,
        "bloom_off_cold_sec": t_off_cold["wall_sec"],
        "bloom_on_cold_sec": t_on_cold["wall_sec"],
        "speedup_vs_no_bloom_cold": round(
            t_off_cold["wall_sec"] / t_on_cold["wall_sec"], 2
        )
        if t_on_cold["wall_sec"]
        else None,
        "n_fact_rows": n,
        "dim_keyspace": keyspace,
        "dim_selectivity": 0.01,
        "groups": len(t_on["rows"]),
    }


def bench_kmv(spark: SparkSession, frac: float) -> dict:
    """KMV sketch build at high per-group cardinality: the plain path
    ranks EVERY distinct hash inside each group's window sort; the
    prefilter path bounds the sort input to ~8k survivors per group
    via the approx-threshold pass (operators/sketches.py). Same sketch
    rows out both ways — the A/B measures what the prefilter buys when
    a group holds millions of distincts (the 100 TB regime), and the
    estimate is checked against the generator's exact cardinality."""
    from map_v2_etl_spark.operators.sketches import kmv_sketch, kmv_stats

    k, groups = 256, 8
    n = int(16_000_000 * MULT * frac)
    per_group = n // groups
    df = spark.range(n).select(
        (F.col("id") % groups).alias("g"), F.col("id").alias("v")
    )

    def run_variant(prefilter: bool):
        sk = kmv_sketch(df, "g", "v", k, prefilter=prefilter)
        stats = kmv_stats(sk, "g", k).collect()
        worst = max(
            abs(r["est"] - per_group) / per_group for r in stats
        )
        return {"groups_out": len(stats), "worst_rel_err": round(worst, 4)}

    t_plain = timed(spark, f"kmv_plain_{frac}x", lambda: run_variant(False))
    t_pre = timed(spark, f"kmv_pre_{frac}x", lambda: run_variant(True))
    return {
        "wall_sec": t_pre["wall_sec"],
        "jobs": t_pre["jobs"],
        "stages": t_pre["stages"],
        "shuffle_stages": t_pre["shuffle_stages"],
        "plain_sec": t_plain["wall_sec"],
        "prefilter_sec": t_pre["wall_sec"],
        "speedup_vs_plain": round(
            t_plain["wall_sec"] / t_pre["wall_sec"], 2
        )
        if t_pre["wall_sec"]
        else None,
        "n_rows": n,
        "distinct_per_group": per_group,
        "k": k,
        "worst_rel_err_plain": t_plain["worst_rel_err"],
        "worst_rel_err_prefilter": t_pre["worst_rel_err"],
    }


def bench_merkle(spark: SparkSession, frac: float) -> dict:
    """Segment-checksum replica reconciliation at replica scale
    (plans/queries_wave31-era wave-30 operator): two n-key replicas
    with ~1/50k divergence, 4096 segments. Measures the protocol's
    scan economics — the summary stage touches all rows once per
    replica (map-combining bit_xor agg), the drill-down rescans ONLY
    mismatched segments; prune_rate is the fraction of segments proven
    equal by checksum and never rescanned at key granularity."""
    from map_v2_etl_spark.plans.queries_wave30 import _row_hash

    n = int(20_000_000 * MULT * frac)
    n_seg = 4096
    base = spark.range(n).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") % 1000) / F.lit(10.0)).alias("value"),
    )
    b = base.filter(F.col("user_id") % 99991 != 0).withColumn(
        "event_type",
        F.when(
            F.col("user_id") % 100003 == 0, F.lit("corrupted")
        ).otherwise(F.col("event_type")),
    )

    def seg_rows(state):
        return state.select(
            "user_id",
            (F.col("user_id") % n_seg).alias("seg"),
            _row_hash().alias("rh"),
        )

    def run():
        a_rows, b_rows = seg_rows(base), seg_rows(b)

        def summary(rows):
            return rows.groupBy("seg").agg(
                F.bit_xor("rh").alias("cks"), F.count("*").alias("n")
            )

        sa, sb = summary(a_rows).alias("sa"), summary(b_rows).alias("sb")
        bad = (
            sa.join(sb, F.col("sa.seg") == F.col("sb.seg"), "full_outer")
            .filter(
                F.col("sa.seg").isNull()
                | F.col("sb.seg").isNull()
                | (F.col("sa.cks") != F.col("sb.cks"))
                | (F.col("sa.n") != F.col("sb.n"))
            )
            .select(F.coalesce("sa.seg", "sb.seg").alias("bad_seg"))
            .localCheckpoint(eager=True)
        )
        n_bad = bad.count()
        a_bad = a_rows.join(
            F.broadcast(bad), a_rows["seg"] == bad["bad_seg"], "left_semi"
        ).alias("a")
        b_bad = b_rows.join(
            F.broadcast(bad), b_rows["seg"] == bad["bad_seg"], "left_semi"
        ).alias("b")
        rescanned = a_bad.count()
        diff = (
            a_bad.join(
                b_bad,
                F.col("a.user_id") == F.col("b.user_id"),
                "full_outer",
            )
            .filter(
                F.col("a.user_id").isNull()
                | F.col("b.user_id").isNull()
                | (F.col("a.rh") != F.col("b.rh"))
            )
            .count()
        )
        return {
            "n_keys": n,
            "n_segments": n_seg,
            "mismatched_segments": n_bad,
            "prune_rate": round(1.0 - n_bad / n_seg, 4),
            "keys_rescanned": rescanned,
            "rescan_fraction": round(rescanned / n, 6),
            "diff_rows": diff,
            # deletes: ids ≡0 (mod 99991) incl. id 0; changes: ids ≡0
            # (mod 100003) except id 0 (deleted first — delete wins)
            "expected_diff": 1 + (n - 1) // 99991 + (n - 1) // 100003,
        }

    rec = timed(spark, f"merkle_{frac}x", run)
    return rec


def bench_bpe(spark: SparkSession, frac: float) -> dict:
    """Distributed BPE training (operators/bpe.py): the driver merge
    loop is the audited serialization point (one bounded collect of the
    winning pair per round) — this cell measures how that loop's
    per-round cost moves as the corpus AND the distinct-word table
    scale together (vocab ≈ n_docs·0.8, so pair_counts aggregates a
    genuinely growing symbol table, the 100 TB-shaped regime)."""
    from map_v2_etl_spark.operators.bpe import learn_bpe

    n = int(60_000 * MULT * frac)
    merges = 12
    docs = gen_word_docs(spark, n, words_per_doc=20, vocab=int(n * 0.8))

    def run():
        stats: dict = {}
        learned, final = learn_bpe(docs, k=merges, stats=stats)
        vocab_rows = final.count()
        return {
            "n_docs": n,
            "merges_learned": len(learned),
            "merge_rounds": stats["rounds"],
            "distinct_words": vocab_rows,
            "top_pair_count": learned[0][3] if learned else 0,
        }

    rec = timed(spark, f"bpe_{frac}x", run)
    rounds = max(1, rec["merge_rounds"])
    rec["per_round_sec"] = round(rec["wall_sec"] / rounds, 3)
    # jobs ≈ one top-pairs collect per DRIVER ROUND + the final count:
    # the driver-loop overhead the r9 verdict asked to see recorded —
    # batched merge selection (operators/bpe.py) now packs up to 16
    # symbol-disjoint merges per round, so rounds << merges
    rec["driver_jobs_per_round"] = round(rec["jobs"] / rounds, 2)
    rec["driver_jobs_total"] = rec["jobs"]
    return rec


def bench_dedup_incremental(spark: SparkSession, frac: float) -> dict:
    """Incremental MinHash-LSH screening (new increment vs existing
    corpus) on generated docs with planted (even, odd) near-dup twins.
    doc_id % 5 == 0 plays the new crawl — 2 of every 5 planted twin
    pairs straddle the increment boundary (pair (2i, 2i+1) straddles
    iff i % 10 ∈ {0, 4}) and must surface. Banding recall is ASSERTED,
    not just recorded: a candidate-generation regression that drops
    cross-side pairs fails the cell instead of quietly shipping a
    smaller pairs_found number."""
    from map_v2_etl_spark.operators.dedup import minhash_lsh_pairs

    n = int(120_000 * MULT * frac)
    docs = gen_docs(spark, n, length=30)

    def run():
        pairs = minhash_lsh_pairs(
            docs, threshold=0.8, new_side=F.col("doc_id") % 5 == 0
        )
        found = pairs.count()
        # planted twin pairs (2i, 2i+1) with exactly one side in the
        # increment: 2i % 5 == 0 XOR (2i+1) % 5 == 0
        expected = sum(
            1
            for i in range(0, n - 1, 2)
            if (i % 5 == 0) != ((i + 1) % 5 == 0)
        )
        # exact-Jaccard verification bounds found above by the planted
        # set; banding (probabilistic candidates) bounds it below at
        # ~e^(-n_bands·s^rows) misses — 99.9% leaves honest headroom
        assert found <= expected, (found, expected)
        assert found >= 0.999 * expected, (
            f"banding recall regression: {found}/{expected}"
        )
        return {"n_docs": n, "pairs_found": found, "planted_cross": expected}

    return timed(spark, f"dedup_incremental_{frac}x", run)


def bench_winnow(spark: SparkSession, frac: float) -> dict:
    """Winnowing fingerprint pair detection (operators/text.winnow_pairs)
    on the same planted-twin corpus: per-doc fingerprint selection is a
    map-side pass, the pair stage is a bucket equi-join on selected
    hashes — the sum-of-bucket-sizes² shape whose scaling this cell
    pins (all-pairs would be n²)."""
    from map_v2_etl_spark.operators.text import winnow_pairs

    n = int(60_000 * MULT * frac)
    docs = gen_docs(spark, n, length=30)

    def run():
        pairs = winnow_pairs(docs, min_shared=2, k=4, w=5)
        found = pairs.count()
        return {"n_docs": n, "pairs_found": found}

    return timed(spark, f"winnow_{frac}x", run)


BENCHES = {
    "pagerank": bench_pagerank,
    "cc_minlabel": bench_cc_minlabel,
    "cc_star": bench_cc_star,
    "lloyd": bench_lloyd,
    "pq_train": bench_pq_train,
    "ivf_pq": bench_ivf_pq,
    "ivf_pq_residual": bench_ivf_pq_residual,
    "ivf_pq_residual_fused": bench_ivf_pq_residual_fused,
    "ivf_sq": bench_ivf_sq,
    "ann_index_query": bench_ann_index_query,
    "ann_index_maintenance": bench_ann_index_maintenance,
    "manifest_maintenance": bench_manifest_maintenance,
    "manifest_pruned_read": bench_manifest_pruned_read,
    "span_dedup": bench_span_dedup,
    "span_dedup_skew": bench_span_dedup_skew,
    "triangles": bench_triangles,
    "skew_join": bench_skew_join,
    "dpp": bench_dpp,
    "bloom_join": bench_bloom_join,
    "kmv": bench_kmv,
    "merkle": bench_merkle,
    "bpe": bench_bpe,
    "dedup_incremental": bench_dedup_incremental,
    "winnow": bench_winnow,
}


# Cells exempt from the discard-first-1x-rep protocol: bloom_join
# regenerates its parquet fact EVERY call, so a second rep measures the
# arms right after a multi-GB writeback (page-cache churn dominates) and
# its compile cost is trivial next to the arms it times. Measured: the
# double-run protocol made its arms swing 0.5-12x run-to-run.
NO_STEADY_REP = {"bloom_join"}


def main() -> None:
    from map_v2_etl_spark.session import get_spark

    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    scales = [1, 2]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):  # e.g. --scales=1,2,4
            scales = [int(s) for s in a.split("=", 1)[1].split(",")]
    spark = get_spark("bench_scale", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    total = 0.0
    for name, fn in BENCHES.items():
        if only and name not in only:
            continue
        entry: dict[str, dict] = {}
        # discarded tiny warm-up: JVM/codegen/Arrow warm-up otherwise
        # lands entirely on the 1x run and skews the 2x/1x ratio (it
        # runs BELOW the gates, so it times nothing we report)
        fn(spark, 0.02)
        for scale in scales:
            rec = fn(spark, float(scale))
            if name not in NO_STEADY_REP:
                # the tiny warm-up runs BELOW the distributed-regime
                # gates, so each recorded cell's FIRST rep may still
                # pay the distributed path's whole-stage-codegen/janino
                # compile — literal sizes fold into the generated code,
                # so even a size CHANGE can recompile (measured r11:
                # pq_train 33.5s first rep vs 8.97s steady at identical
                # size — it manufactured two "superlinear" false
                # alarms). Discard the first rep per size and record
                # the steady-state second; keep the first as a
                # diagnostic.
                first = rec["wall_sec"]
                rec = fn(spark, float(scale))
                rec["discarded_first_rep_sec"] = first
            entry[f"{scale}x"] = rec
            total += rec["wall_sec"]
            print(
                f"# {name} {scale}x: {rec['wall_sec']}s "
                f"jobs={rec['jobs']} stages={rec['stages']}",
                file=sys.stderr,
            )
        # historical semantics: scaling_ratio_Nx = Nx wall / 1x wall.
        # A run like --scales=2,4 would otherwise silently record the
        # 4x/2x ratio under the key downstream notes read as 4x-vs-1x
        # (r12 advice) — encode the base in the key when it is not 1.
        base = entry[f"{scales[0]}x"]["wall_sec"]
        for hi in scales[1:]:
            key = (
                f"scaling_ratio_{hi}x"
                if scales[0] == 1
                else f"scaling_ratio_{hi}x_vs_{scales[0]}x"
            )
            entry[key] = (
                round(entry[f"{hi}x"]["wall_sec"] / base, 2)
                if base
                else None
            )
        results[name] = entry
    out = {
        "metric": "distributed_regime_total",
        "value": round(total, 3),
        "unit": "sec",
        "cpus": CPUS,
        "mult": MULT,
        "ops": results,
    }
    line = json.dumps(out)
    print(line)
    # SPARK_GRAFT_SCALE_OUT redirects the artifact (or "-" to skip the
    # file entirely) — a MULT-sweep run must not clobber the curated
    # best-of-N BENCH_SCALE.json (which merges cells across runs)
    dest = os.environ.get(
        "SPARK_GRAFT_SCALE_OUT", os.path.join(HERE, "BENCH_SCALE.json")
    )
    if not only and dest != "-":
        with open(dest, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
