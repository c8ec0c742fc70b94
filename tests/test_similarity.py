"""Similarity search: exact brute force vs LSH recall."""

import pytest
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


def test_lsh_single_corpus_scan(spark, sf_dir):
    """All hash-table signatures come from one projection + explode: the
    physical plan must contain exactly ONE FileScan of embeddings.parquet
    (the old per-table loop unioned `tables` scans)."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    plan = (
        S.lsh_cosine_topk(emb, qs, k=5, planes=4, tables=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # query side reads the same file (filtered), so expect exactly 2 scans
    # total: 1 corpus + 1 queries — never tables+tables.
    assert plan.count("Scan parquet") == 2


def test_near_dup_single_corpus_scan(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    plan = (
        S.embedding_near_dup_pairs(emb, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # self-join: both sides scan the corpus once -> exactly 2 scans
    assert plan.count("Scan parquet") == 2


def test_lsh_empty_corpus(spark):
    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    assert S.lsh_cosine_topk(empty, empty, k=3).count() == 0
    assert S.embedding_near_dup_pairs(empty, threshold=0.9).count() == 0


def test_assign_clusters_broadcast_path_k256(spark, sf_dir):
    """k above BROADCAST_K_THRESHOLD takes the broadcast-join path: the
    plan stays O(1) in k (no k x dim literal blowup) and assignments
    agree with the literal path on the same centroids."""
    emb = load_table(spark, "embeddings", sf_dir).limit(200)
    rows = emb.orderBy("vec_id").limit(256).collect()
    cents = [list(map(float, r["embedding"])) for r in rows]

    big = S.assign_clusters(emb, cents)  # 256 > threshold -> broadcast
    lit = S.assign_clusters(emb, cents[:64])  # literal path

    got_big = {r["vec_id"]: r["cluster"] for r in big.collect()}
    assert len(got_big) == 200

    # agreement check on the shared prefix: restrict both paths to the
    # same 64 centroids and compare assignments exactly
    import numpy as np

    E = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    ids = [r["vec_id"] for r in emb.orderBy("vec_id").collect()]
    C = np.array(cents[:64], dtype=np.float64)
    d2 = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = {i: int(c) for i, c in zip(ids, d2.argmin(axis=1))}
    got_lit = {r["vec_id"]: r["cluster"] for r in lit.collect()}
    assert got_lit == want

    # and the broadcast path on those same 64 centroids must agree too
    import map_v2_etl_spark.operators.similarity as sim

    old = sim.BROADCAST_K_THRESHOLD
    sim.BROADCAST_K_THRESHOLD = 1
    try:
        got_bc64 = {
            r["vec_id"]: r["cluster"]
            for r in S.assign_clusters(emb, cents[:64]).collect()
        }
    finally:
        sim.BROADCAST_K_THRESHOLD = old
    assert got_bc64 == want


def test_pq_topk_recall_vs_exact(spark, sf_dir):
    """PQ/ADC with exact re-rank reaches high recall@5 vs brute force,
    and its cosine values are exact (re-rank uses raw vectors)."""
    from map_v2_etl_spark.operators.similarity import (
        cosine_topk,
        pq_cosine_topk,
    )
    from map_v2_etl_spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r.q_id, r.nn_id) for r in cosine_topk(emb, qs, k=5).collect()
    }
    pq_rows = pq_cosine_topk(emb, qs, k=5, candidates=100).collect()
    approx = {(r.q_id, r.nn_id) for r in pq_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall@5 {recall:.2f}"
    # returned cosines must be exact (computed on raw vectors)
    exact_cos = {
        (r.q_id, r.nn_id): r.cosine
        for r in cosine_topk(emb, qs, k=50).collect()
    }
    for r in pq_rows:
        if (r.q_id, r.nn_id) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.q_id, r.nn_id)]) < 1e-12


def test_pq_encode_deterministic(spark, sf_dir):
    """Same corpus -> bit-identical codes across runs (no RNG anywhere)."""
    from map_v2_etl_spark.operators.similarity import pq_encode, pq_train
    from map_v2_etl_spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    books1 = pq_train(emb, m=4, ksub=8, iters=1)
    books2 = pq_train(emb, m=4, ksub=8, iters=1)
    assert books1 == books2
    c1 = {(r.vec_id, tuple(r.codes)) for r in pq_encode(emb, books1).collect()}
    c2 = {(r.vec_id, tuple(r.codes)) for r in pq_encode(emb, books2).collect()}
    assert c1 == c2


def test_pq_train_regimes_fuzz_bit_identical(spark):
    """Randomized bit-equality net over BOTH pq_train regimes (gated
    NumPy twin vs distributed decimal loop): random m/ksub/dim/iters,
    duplicates, n down to ksub+1. PQ normalizes its training vectors,
    so component means sit far inside the dec_mean16 exactness envelope
    and strict equality is the contract at every draw (unlike raw
    k-means, whose envelope the Lloyd fuzz respects explicitly)."""
    import random

    from map_v2_etl_spark.operators.similarity import pq_train

    rng = random.Random(17)
    for trial in range(3):
        m = rng.choice([1, 2, 4])
        dim = m * rng.choice([1, 2, 3])
        ksub = rng.choice([2, 4, 8])
        n = rng.randint(ksub + 1, 30)
        iters = rng.randint(1, 3)
        rows = []
        for i in range(n):
            if rng.random() < 0.2 and rows:
                rows.append((i, rows[rng.randrange(len(rows))][1]))
            else:
                rows.append(
                    (
                        i,
                        [
                            round(rng.uniform(-0.85, 0.85), 3)
                            for _ in range(dim)
                        ],
                    )
                )
        df = spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
        )
        local = pq_train(df, m=m, ksub=ksub, iters=iters)
        dist = pq_train(df, m=m, ksub=ksub, iters=iters, gate_rows=1)
        assert local == dist, (
            f"trial {trial} m={m} ksub={ksub} n={n} iters={iters}:\n"
            f" local={local}\n dist={dist}"
        )


def test_pq_train_regimes_bit_identical(spark, sf_dir):
    """The NumPy fast path and the distributed Lloyd loop publish the
    SAME codebook (r3 advice): both snap centroid means onto the
    decimal(27,12) grid, so crossing the size gate as data grows cannot
    flip a near-tie pq_encode argmin."""
    from map_v2_etl_spark.operators.similarity import pq_train
    from map_v2_etl_spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < 400
    )
    local = pq_train(emb, m=4, ksub=8, iters=2)
    dist = pq_train(emb, m=4, ksub=8, iters=2, gate_rows=10)
    assert local == dist


def test_pq_oracle_assumptions(spark, sf_dir):
    """The PQ value-hash oracle (plans/duck_vec.pq_topk_ctes) replays
    the xxhash64 training sample unconditionally; the engine falls back
    to the full corpus when the sample is degenerate (< ksub). Pin the
    assumption that the sample passes the gate at oracle scale, and
    that the SQL xxhash64 twin matches Spark's."""
    import duckdb

    from map_v2_etl_spark.plans.duck_vec import xxhash64_ctes
    from map_v2_etl_spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    n_sample = emb.filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(5)) == 0
    ).count()
    assert n_sample >= 16, "oracle would diverge from the engine's fallback"

    spark_h = {
        r["vec_id"]: r["h"]
        for r in emb.select(
            "vec_id", F.xxhash64("vec_id").alias("h")
        ).collect()
    }
    con = duckdb.connect()
    import os

    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet('"
        + os.path.join(sf_dir, "embeddings.parquet")
        + "')"
    )
    duck_h = dict(
        con.sql(
            f"WITH {xxhash64_ctes('hx', 'embeddings')} "
            "SELECT vec_id, h FROM hx"
        ).fetchall()
    )
    assert spark_h == duck_h


def test_lloyd_regimes_fuzz_bit_identical_in_envelope(spark):
    """Randomized bit-equality net over BOTH Lloyd regimes (gated NumPy
    twin vs distributed decimal loop) inside the documented exactness
    envelope: component means must stay under 2^53/1e16 ~ 0.9007, above
    which the local path's int->double step can legitimately
    double-round 1 ulp away from the distributed float(decimal(31,16))
    single rounding (the bound stated at similarity.py's dec_mean16 —
    fuzzing at uniform(-2, 2) reproduces exactly that documented 1-ulp
    case, so the generator draws from ±0.85). Covers duplicates, k up
    to 8, empty-cluster carry-over, varying dims/iters."""
    import random

    from map_v2_etl_spark.operators.similarity import lloyd_centroids

    rng = random.Random(3)
    for trial in range(4):
        n = rng.randint(6, 30)
        dim = rng.choice([2, 3, 5])
        k = rng.randint(2, min(8, n))
        iters = rng.randint(1, 3)
        rows = []
        for i in range(n):
            if rng.random() < 0.2 and rows:
                rows.append((i, rows[rng.randrange(len(rows))][1]))
            else:
                rows.append(
                    (
                        i,
                        [
                            round(rng.uniform(-0.85, 0.85), 3)
                            for _ in range(dim)
                        ],
                    )
                )
        df = spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
        )
        local = lloyd_centroids(df, k=k, iters=iters)
        dist = lloyd_centroids(df, k=k, iters=iters, gate_rows=1)
        assert local == dist, (
            f"trial {trial} n={n} dim={dim} k={k} iters={iters}:\n"
            f" local={local}\n dist={dist}"
        )


def test_lloyd_regimes_bit_identical(spark, sf_dir):
    """kmeans' gate-bounded NumPy Lloyd and the distributed loop publish
    identical centroids (same contract as the PQ regimes)."""
    from map_v2_etl_spark.operators.similarity import lloyd_centroids
    from map_v2_etl_spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < 300
    )
    local = lloyd_centroids(emb, k=6, iters=3)
    dist = lloyd_centroids(emb, k=6, iters=3, gate_rows=10)
    assert local == dist


def test_vec_dim_skips_null_embeddings(spark):
    """A NULL first row must not masquerade as an empty corpus."""
    from map_v2_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [1.0, 0.001])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    ).coalesce(1).orderBy("vec_id")
    pairs = embedding_near_dup_pairs(df, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(2, 3)}


def test_ivf_empty_codebook_raises(spark):
    from map_v2_etl_spark.operators.similarity import ivf_cosine_topk

    # ids 1..9 with stride 10 -> no centroid rows
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 10)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="codebook is empty"):
        ivf_cosine_topk(df, df.limit(2), centroid_stride=10)


def test_kmeans_fewer_rows_than_k_raises(spark):
    from map_v2_etl_spark.operators.similarity import lloyd_centroids

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="at least k=8"):
        lloyd_centroids(df, k=8, iters=1)


def test_lsh_planes_over_64_raises(spark):
    from map_v2_etl_spark.operators.similarity import lsh_cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="planes <= 64"):
        lsh_cosine_topk(df, df, planes=65, tables=1).collect()


def test_kmeans_large_magnitude_uses_distributed_exact_loop(spark):
    """Raw vectors outside the int64 quantization envelope must not
    silently corrupt centroids: the gate falls through to the decimal
    distributed loop, whose result is exact at any magnitude."""
    from map_v2_etl_spark.operators.similarity import lloyd_centroids

    rows = [(i, [5.0e6 + i, float(i % 3)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = lloyd_centroids(df, k=2, iters=1)
    # distributed loop ran (no int64 wrap garbage): centroids stay in
    # the data's range
    for c in cents:
        assert 4.9e6 < c[0] < 5.1e6


def test_pq_train_gate_override_on_large_corpus(spark):
    """gate_rows < ksub (the documented distributed-regime override)
    must not spuriously reject a corpus with plenty of vectors."""
    from map_v2_etl_spark.operators.similarity import pq_train

    import random

    rng = random.Random(1)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    books = pq_train(df, m=2, ksub=16, iters=1, gate_rows=5)
    assert len(books) == 2 and len(books[0]) == 16


def test_pq_encode_null_embedding_dropped_not_crash(spark):
    from map_v2_etl_spark.operators.similarity import pq_encode, pq_train

    import random

    rng = random.Random(2)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    books = pq_train(df, m=2, ksub=4, iters=1)
    withnull = df.union(
        spark.createDataFrame([(99, None)], df.schema)
    )
    codes = {r["vec_id"] for r in pq_encode(withnull, books).collect()}
    assert codes == set(range(20))  # null row absent, no crash


def test_cosine_degenerate_vectors_null_not_crash_or_rank(spark):
    """r6 review fixes: a zero-norm embedding must not raise
    DIVIDE_BY_ZERO under ANSI, and a NaN component must not rank first
    (Spark sorts NaN above every number) — both become NULL cosine,
    which sorts last and fails thresholds."""
    from map_v2_etl_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),          # zero norm
            (3, [float("nan"), 1.0]),  # NaN component
            (4, [0.6, 0.8]),
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    rows = cosine_topk(corpus, queries, k=4).collect()
    by_rank = {r["rank"]: r for r in rows}
    # real vectors first, degenerate ones last with NULL cosine
    assert by_rank[1]["nn_id"] == 1
    assert by_rank[2]["nn_id"] == 4
    assert {by_rank[3]["nn_id"], by_rank[4]["nn_id"]} == {2, 3}
    assert by_rank[3]["cosine"] is None and by_rank[4]["cosine"] is None


def test_kmeans_local_regime_tolerates_null_embedding(spark):
    from map_v2_etl_spark.operators.similarity import kmeans_assignments

    rows = [(i, [float(i % 3), float((i * 7) % 5)]) for i in range(30)]
    rows.append((99, None))
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    out = kmeans_assignments(df, k=3, iters=2)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert len(got) == 31  # null row kept (NULL distance -> NULL-safe)
    assert all(v is not None for k_, v in got.items() if k_ != 99)


def test_assign_clusters_null_id_consistent_across_regimes(spark):
    """NULL-id rows surface with NULL cluster in BOTH physical
    strategies (literal k<=64 and broadcast k>64) — the broadcast inner
    join used to silently drop them."""
    from map_v2_etl_spark.operators.similarity import assign_clusters

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (None, [5.0, 5.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    small = [[0.0, 0.0], [10.0, 10.0]]
    big = [[float(i), float(i)] for i in range(70)]
    for cents in (small, big):
        out = {
            r["vec_id"]: r["cluster"]
            for r in assign_clusters(df, cents).collect()
        }
        assert len(out) == 3, f"row dropped with k={len(cents)}"
        assert out[None] is None, f"null id assigned with k={len(cents)}"
        assert out[1] is not None and out[2] is not None
