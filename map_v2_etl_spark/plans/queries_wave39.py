"""Wave-39 surface: IVF×PQ composed ANN (the 100 TB retrieval shape).

* ivf_pq_topk — the standard Faiss IVF-PQ composition (r12 verdict
  "Next round" #3): a coarse quantizer routes each query to nprobe
  inverted lists and ONLY those lists are ADC-scanned against the
  query's PQ lookup table, closing the one scale-shape gap the r12
  audit named — pq_cosine_topk's full-corpus ADC pass. At |corpus| =
  10^9+ the scanned fraction drops from 100% to ~nprobe/n_cells.
  Deterministic end to end (strided coarse codebook, max_by/lowest-id
  tie rules, xxhash64 training sample, decimal-grid Lloyd means,
  fold-order ADC sums), so despite being approximate it carries a FULL
  value-hash oracle: plans/duck_vec.pq_topk_ctes with routing CTEs —
  the proven `asg`/`probes` twins from embedding_ivf_topk composed with
  the proven PQ training/encode/LUT chain from embedding_pq_topk.

* ivf_pq_recall_report — recall@k of the routed IVF-PQ result against
  the exact cosine top-k, per query: (q_id, k, n_hit) — the health
  metric that decides nprobe/candidates tuning in production
  (ann_recall_report's shape, wave-10). Output-bounded join of two
  |Q|·k result sets; integer report value-hashes.

Scale notes (the whole point of this wave): corpus-sized work in
ivf_pq_topk is two narrow passes — the coarse-assign aggregation and
the codes⨝assignment equi-join, both over (id, small-payload) rows,
never raw vectors — plus the PRUNED ADC scan (equi-join on cent_id
against a broadcast (q_id, cent_id, lut) probe frame; a broadcast hash
join drops non-probed cells map-side). Exact re-rank touches
candidates × |Q| vectors. No full-corpus crossJoin anywhere
(plan-contract-tested in tests/test_wave39.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query


def _ivf_pq_oracle() -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
        sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
    )


@query("ivf_pq_topk", _ivf_pq_oracle(), tags=["similarity", "ann", "ivf", "pq"])
def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed PQ/ADC approximate top-k with exact re-rank
    (operators/similarity.ivf_pq_topk): coarse cells from every 10th
    vector, queries probe their 4 nearest cells, 4x16 PQ codes ADC-ranked
    inside probed cells only, top-50 candidates re-ranked exactly.
    Reference parity: the reference engine (build.sh:75-233) has no ANN
    surface; §2.11 extension."""
    from ..operators.similarity import ivf_pq_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_pq_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50,
        centroid_stride=10, nprobe=4, train_sample_mod=5,
    )


def _recall_report_sql(approx_sql: str) -> str:
    """recall@5 oracle shape shared by the IVF-PQ recall reports
    (wave 39 + wave 41): any `approx` result oracle vs the brute-force
    exact top-5 window over the q_mod=50 query set. ONE copy of the
    exact/hits/report SQL — a null-handling or shape fix lands on every
    report at once (r13 review finding)."""
    from .duck_vec import cosine as C

    return (
        "WITH approx AS (" + approx_sql + "), "
        "q AS (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0 "
        "AND embedding IS NOT NULL), "
        "exact AS (SELECT q_id, nn_id FROM ("
        "SELECT q.vec_id AS q_id, e.vec_id AS nn_id, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {C('qq.embedding', 'e.embedding')} "
        "DESC, e.vec_id ASC) AS rk "
        "FROM q JOIN embeddings qq ON qq.vec_id = q.vec_id "
        "CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id"
        ") WHERE rk <= 5), "
        "hits AS (SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n_hit "
        "FROM exact e JOIN approx a ON a.q_id = e.q_id "
        "AND a.nn_id = e.nn_id GROUP BY e.q_id) "
        "SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS k, "
        "coalesce(ANY_VALUE(h.n_hit), 0) AS n_hit "
        "FROM exact e LEFT JOIN hits h ON h.q_id = e.q_id "
        "GROUP BY e.q_id"
    )


def _recall_report_df(
    spark: SparkSession, sf_dir: str, approx: DataFrame
) -> DataFrame:
    """Spark side of the shared recall-report shape: (q_id, k, n_hit)
    for any approx DataFrame with (q_id, nn_id) columns, vs the exact
    cosine top-5 of the q_mod=50 query set."""
    from ..operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(emb, qs, k=5).select(
        F.col("q_id"), F.col("nn_id").alias("e_nn")
    )
    approx = approx.select(F.col("q_id"), F.col("nn_id").alias("a_nn"))
    hits = exact.join(
        approx,
        (exact["q_id"] == approx["q_id"])
        & (exact["e_nn"] == approx["a_nn"]),
    ).groupBy(exact["q_id"].alias("q_id")).agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return (
        exact.groupBy("q_id")
        .agg(F.count("*").cast("long").alias("k"))
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "k",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
    )


def _ivf_pq_recall_oracle() -> str:
    # reuse the full routed-IVF-PQ oracle as the approx side; the exact
    # side is the brute-force window (ann_recall_report's `exact` CTE)
    return _recall_report_sql(_ivf_pq_oracle())


@query(
    "ivf_pq_recall_report",
    _ivf_pq_recall_oracle(),
    tags=["embedding", "ann", "ivf", "pq", "observability"],
)
def q_ivf_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of IVF-PQ vs the exact cosine top-k, per query:
    (q_id, k, n_hit) — the tuning signal for nprobe/candidates. Joins
    two |Q|·k result sets (output-bounded); deterministic, so the
    integer report value-hashes (the ann_recall_report pattern,
    queries_wave10.py)."""
    from ..operators.similarity import ivf_pq_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    approx = ivf_pq_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50,
        centroid_stride=10, nprobe=4, train_sample_mod=5,
    )
    return _recall_report_df(spark, sf_dir, approx)
