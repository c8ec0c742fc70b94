"""Wave-41 surface: RESIDUAL IVF-PQ — Faiss's default ANN index shape.

* ivf_pq_residual_topk — the ``by_residual=True`` composition (Jegou et
  al. TPAMI'11 §V.B; the r13 hand-off's one missing ANN variant): the
  PQ quantizes each vector's residual from its coarse centroid,
  u(x) - u(c), instead of the vector itself. Residuals concentrate near
  the origin, so the same m×ksub code budget resolves the within-cell
  detail the coarse quantizer left behind. Deterministic end to end
  (same tie rules / xxhash64 sample / decimal-grid Lloyd as
  ivf_pq_topk), so it carries a FULL value-hash oracle:
  plans/duck_vec.pq_topk_ctes(residual=True) — the proven routing CTEs
  feed a `res` residual CTE, training/encode run un-normalized, and the
  LUT is per (query, probed cell) because the ADC target is
  u(cent) + codeword.

* ivf_pq_residual_recall_report — recall@5 with a TIGHT candidate
  budget (candidates=12), where ADC fidelity — not the exact re-rank —
  decides the result. Measured at sf0.01: residual 0.84 vs
  non-residual 0.64 at the same budget, the Faiss by_residual claim
  reproduced; this report is the regression pin for that fidelity gap.

* ivf_pq_residual_fused — the same search through the FUSED corpus
  regime (assignment + residual + encode as one Arrow-batched
  mapInPandas pass, centroids driver-held; Faiss's add()
  architecture). Bit-identical to the unfused plan (fuzz-pinned), so
  it shares the oracle — the driver witness certifies the
  zero-corpus-shuffle execution path end to end.

Scale notes: identical shape to ivf_pq_topk (two narrow corpus passes +
pruned BHJ ADC scan + output-bounded re-rank) plus the residual
variant's intrinsic extra — ONE corpus-wide (id, dim-double) shuffle to
join vectors with their coarse assignment (Faiss pays the analogous
cost at add() time). The coarse assignment itself is computed once and
localCheckpoint-truncated as a NARROW (id, int32) frame; the probe
frame grows to |Q|·nprobe LUT rows (one per probed cell), still
broadcast-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query


def _ivf_pq_residual_oracle(candidates: int = 50, k: int = 5) -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=candidates, k=k,
        sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
        residual=True,
    )


@query(
    "ivf_pq_residual_topk",
    _ivf_pq_residual_oracle(),
    tags=["similarity", "ann", "ivf", "pq", "residual"],
)
def q_ivf_pq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ approximate top-k with exact re-rank
    (operators/similarity.ivf_pq_residual_topk): coarse cells from
    every 10th vector, queries probe their 4 nearest cells, 4x16 PQ
    codes over COARSE RESIDUALS ADC-ranked inside probed cells only,
    top-50 candidates re-ranked exactly. Reference parity: the
    reference engine (build.sh:75-233) has no ANN surface; §2.11
    extension."""
    from ..operators.similarity import ivf_pq_residual_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_pq_residual_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50,
        centroid_stride=10, nprobe=4, train_sample_mod=5,
    )


def _ivf_pq_kmeans_oracle() -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
        sample_mod=5, q_mod=50, nprobe=4, residual=True,
        kmeans_cells=10, kmeans_iters=2,
    )


@query(
    "ivf_pq_kmeans_topk",
    _ivf_pq_kmeans_oracle(),
    tags=["similarity", "ann", "ivf", "pq", "residual", "kmeans"],
)
def q_ivf_pq_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE Faiss IVF-PQ default: k-means-refined coarse
    codebook (10 cells, 2 Lloyd rounds — lloyd_centroids, the certified
    k-means machinery) + residual PQ + per-cell LUTs + exact re-rank
    (operators/similarity.ivf_pq_residual_topk(kmeans_cells=10)). The
    oracle composes plans/duck_vec.lloyd_ctes into the routing CTEs —
    every stage of the chain is a previously-certified twin. Closes the
    last ANN refinement from the r13 hand-off (the stride sample was
    the deterministic stand-in for exactly this)."""
    from ..operators.similarity import ivf_pq_residual_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_pq_residual_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50, nprobe=4,
        train_sample_mod=5, kmeans_cells=10, kmeans_iters=2,
    )


@query(
    "ivf_pq_residual_fused",
    _ivf_pq_residual_oracle(),
    tags=["similarity", "ann", "ivf", "pq", "residual", "fused"],
)
def q_ivf_pq_residual_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME residual IVF-PQ search through the fused corpus regime
    (operators/similarity.ivf_pq_residual_topk(fused=True)): coarse +
    unit centroids held driver-side, assignment + residual + encode as
    ONE Arrow-batched mapInPandas pass — zero corpus-side joins or
    shuffles (Faiss's add() architecture; plan-contract-pinned in
    tests/test_wave41.py). Bit-identical to ivf_pq_residual_topk
    (fuzz-pinned), so it certifies against the SAME DuckDB oracle —
    the driver witness covers the fused execution path end to end."""
    from ..operators.similarity import ivf_pq_residual_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_pq_residual_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50,
        centroid_stride=10, nprobe=4, train_sample_mod=5, fused=True,
    )


def _ivf_pq_residual_recall_oracle() -> str:
    from .queries_wave39 import _recall_report_sql

    return _recall_report_sql(_ivf_pq_residual_oracle(candidates=12))


@query(
    "ivf_pq_residual_recall_report",
    _ivf_pq_residual_recall_oracle(),
    tags=["embedding", "ann", "ivf", "pq", "residual", "observability"],
)
def q_ivf_pq_residual_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """recall@5 of residual IVF-PQ at a TIGHT candidate budget (12) vs
    the exact cosine top-k, per query: (q_id, k, n_hit). At budget 12
    the exact re-rank can no longer mask quantization error, so this
    pins the residual coding's ADC-fidelity advantage (0.84 vs the
    non-residual 0.64 at sf0.01). Output-bounded join of two |Q|·k
    result sets; integer report value-hashes (ann_recall_report's
    shape, queries_wave10.py)."""
    from ..operators.similarity import ivf_pq_residual_topk
    from .queries_wave39 import _recall_report_df

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    approx = ivf_pq_residual_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=12,
        centroid_stride=10, nprobe=4, train_sample_mod=5,
    )
    return _recall_report_df(spark, sf_dir, approx)
