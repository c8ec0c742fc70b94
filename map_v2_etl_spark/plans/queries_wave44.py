"""Wave-44 surface: IVF-SQ8 — the scalar-quantization index family.

* ivf_sq8_topk — Faiss ``IndexIVFScalarQuantizer`` (QT_8bit) shape:
  IVF routing over per-dimension 8-bit linearly-quantized unit
  vectors. Training is ONE exact min/max pass (no codebooks, no Lloyd,
  no decimal machinery); encode is a pure codegen transform; the scan
  is the same routed BroadcastHashJoin as IVF-PQ with the
  reconstruction folded into the in-row distance term. SQ8 spends
  dim bytes/vector (64 B at dim 64) where PQ spends m (4 B) — the
  memory/fidelity rung BETWEEN brute force and PQ on the standard
  deployment ladder, now all three registered.

* ivf_sq8_recall_report — recall@5 at the same TIGHT candidate budget
  (12) the PQ reports use: SQ8's near-lossless codes should hold
  recall well above 4x16 PQ at identical routing; this pins that gap
  as a regression signal (and completes the per-family recall matrix:
  lsh / ivf / pq / ivf_pq / residual / persisted-index / sq8).

Scale notes: identical routing shape to ivf_pq_topk (two narrow corpus
passes + pruned BHJ scan + output-bounded re-rank); the encode
projection is JVM-side whole-stage codegen (2*dim driver doubles of
"codebook" — no Arrow pass, no broadcast beyond the probe frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query


def _ivf_sq_oracle(candidates: int = 50, k: int = 5) -> str:
    from .duck_vec import ivf_sq_ctes

    return ivf_sq_ctes(
        dim=64, candidates=candidates, k=k, sample_mod=5, q_mod=50,
        centroid_stride=10, nprobe=4,
    )


@query(
    "ivf_sq8_topk",
    _ivf_sq_oracle(),
    tags=["similarity", "ann", "ivf", "sq8", "scalar-quantization"],
)
def q_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 approximate top-k with exact re-rank
    (operators/similarity.ivf_sq_topk): coarse cells from every 10th
    vector, queries probe their 4 nearest cells, per-dimension 8-bit
    scalar codes (min/max trained on the xxhash64 sample) ranked
    inside probed cells only, top-50 re-ranked exactly. Reference
    parity: the reference engine (build.sh:75-233) has no ANN surface;
    §2.11 extension."""
    from ..operators.similarity import ivf_sq_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_sq_topk(
        emb, qs, k=5, candidates=50, centroid_stride=10, nprobe=4,
        train_sample_mod=5,
    )


def _ivf_sq_recall_oracle() -> str:
    from .queries_wave39 import _recall_report_sql

    return _recall_report_sql(_ivf_sq_oracle(candidates=12))


@query(
    "ivf_sq8_recall_report",
    _ivf_sq_recall_oracle(),
    tags=["embedding", "ann", "sq8", "observability"],
)
def q_ivf_sq8_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of IVF-SQ8 at the TIGHT candidate budget (12) vs exact
    cosine top-k — the scalar family's entry in the per-family recall
    matrix. SQ8's 8-bit-per-dimension codes are near-lossless on unit
    vectors, so recall at identical routing should sit well above the
    4x16 PQ variants'; this report pins that fidelity as a regression
    signal. Reference parity: no ANN surface in the reference
    (build.sh:75-233); §2.11 extension."""
    from ..operators.similarity import ivf_sq_topk
    from .queries_wave39 import _recall_report_df

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    approx = ivf_sq_topk(
        emb, qs, k=5, candidates=12, centroid_stride=10, nprobe=4,
        train_sample_mod=5,
    )
    return _recall_report_df(spark, sf_dir, approx)


def _ann_stream_add_oracle() -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
        sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
        residual=True,
        base_table="(SELECT * FROM embeddings WHERE vec_id % 2 = 0) base_t",
    )


@query(
    "ann_index_stream_add_topk",
    _ann_stream_add_oracle(),
    tags=["similarity", "ann", "index", "streaming", "incremental"],
)
def q_ann_index_stream_add_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-MAINTAINED vector index
    (streaming/ann_maintenance.ann_index_stream_add): the index builds
    on the even half and persists; the odd half arrives as a parquet
    file stream (3 files -> 3 micro-batches, maxFilesPerTrigger=1),
    each micro-batch encoded with the FROZEN artifacts in one fused
    Arrow pass and appended to the coded lists; the query runs against
    the reloaded grown index. Per-row encode makes the result
    independent of batch boundaries, so this REAL streaming pipeline
    certifies against the same full value-hash oracle as
    ann_index_add_topk (base_table = even half). Reference parity: no
    ANN or streaming surface in the reference (build.sh:75-233); §2.10
    x §2.11 extension."""
    import os

    from ..operators.similarity import (
        ann_index_build,
        ann_index_topk,
        ann_index_write,
    )
    from ..streaming.ann_maintenance import ann_index_stream_add

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    from .queries_wave43 import _scratch_index_path

    path = _scratch_index_path()
    ann_index_write(
        ann_index_build(
            base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
        ),
        path,
    )
    arrivals = os.path.join(path, "_arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)
    index = ann_index_stream_add(spark, path, arrivals)
    return ann_index_topk(index, qs, emb, k=5, candidates=50, nprobe=4)
