"""Similarity search: exact brute force vs LSH recall."""

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources.registry import load_table


def test_cosine_topk_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S_mat = En @ En.T
    np.fill_diagonal(S_mat, -2)

    qs = emb.filter(F.col("vec_id") % 100 == 0)
    out = S.cosine_topk(emb, qs, k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["q_id"], []).append((r["rank"], r["nn_id"]))
    for q_id, ranked in got.items():
        qi = int(np.where(ids == q_id)[0][0])
        want = ids[np.argsort(-S_mat[qi], kind="stable")[:5]]
        assert [nn for _, nn in sorted(ranked)] == list(want)


def test_lsh_topk_recall(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    exact = S.cosine_topk(emb, qs, k=5).collect()
    approx = S.lsh_cosine_topk(emb, qs, k=5, planes=4, tables=8).collect()
    exact_set = {(r["q_id"], r["nn_id"]) for r in exact}
    approx_set = {(r["q_id"], r["nn_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # uniform-random embeddings are the worst case for sign-LSH (top
    # neighbors at cosine ~0.5); 4x8 targets ~0.75 expected recall here
    assert recall >= 0.5
    assert len(approx_set) <= len(exact_set)


def test_ivf_topk_recall_and_probe_bound(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    exact = S.cosine_topk(emb, qs, k=5).collect()
    approx = S.ivf_cosine_topk(
        emb, qs, k=5, centroid_stride=10, nprobe=8
    ).collect()
    exact_set = {(r["q_id"], r["nn_id"]) for r in exact}
    approx_set = {(r["q_id"], r["nn_id"]) for r in approx}
    # uniform-random data is the IVF worst case too (cells barely
    # correlate with the true neighbors); nprobe=8 of ~N/10 cells must
    # still recover a meaningful share and never exceed k per query
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3
    per_q = {}
    for q_id, nn in approx_set:
        per_q[q_id] = per_q.get(q_id, 0) + 1
    assert max(per_q.values()) <= 5


def test_near_dup_pairs_empty_below_threshold(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    out = S.embedding_near_dup_pairs(emb, threshold=0.95)
    assert out.count() == 0  # testdata max cosine ~0.51
