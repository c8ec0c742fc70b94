"""Wave-43 tests: the PERSISTED ANN index (train/encode once, query
many) + the r14 pq_train NULL-gate hardening + the r13 ADVICE #1
residual-oracle NULL fix.

Reference parity: the reference engine (build.sh:75-233) has no ANN
surface; §2.11 training-pipeline extension.
"""

import re

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources.registry import load_table


def _rows(df):
    return sorted(
        (r["q_id"], r["nn_id"], r["rank"], r["cosine"])
        for r in df.collect()
    )


def test_ann_index_roundtrip_bit_identical_to_in_query(
    spark, sf_dir, tmp_path
):
    """ann_index_topk(read(write(build()))) must reproduce
    ivf_pq_residual_topk BIT-FOR-BIT on the same inputs (including the
    float cosines): the build engine is the fused pass (itself
    fuzz-pinned bit-identical to the audited unfused plan), and parquet
    round-trips doubles/ints exactly — so the persisted split shares
    the in-query operators' DuckDB oracle."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    want = _rows(
        S.ivf_pq_residual_topk(
            emb, qs, k=5, m=4, ksub=16, candidates=50,
            centroid_stride=10, nprobe=4, train_sample_mod=5,
        )
    )
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = str(tmp_path / "annidx")
    S.ann_index_write(index, path)
    reloaded = S.ann_index_read(spark, path)
    got = _rows(
        S.ann_index_topk(
            reloaded, qs, emb, k=5, candidates=50, nprobe=4
        )
    )
    assert got == want


def test_ann_index_query_plan_zero_train_encode_stages(
    spark, sf_dir, tmp_path
):
    """Plan contract for the QUERY-ONLY path: the executed plan reads
    the persisted parquet tables and contains ZERO training or encode
    stages — no MapInPandas (the fused encode pass), no checkpoint
    scan of a coarse assignment, no CartesianProduct; the routed ADC
    is a BroadcastHashJoin on cent_id over the stored inverted
    lists."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = str(tmp_path / "annidx")
    S.ann_index_write(index, path)
    reloaded = S.ann_index_read(spark, path)
    df = S.ann_index_topk(reloaded, qs, emb, k=5, candidates=50, nprobe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert not re.search(r"ExistingRDD\[nn_id", plan), plan
    assert re.search(r"BroadcastHashJoin \[cent_id", plan), plan
    # the coded inverted lists and centroids come from the persisted
    # parquet tables, not from a recompute of the corpus: their scans
    # read the index tables' own schemas
    assert re.search(r"FileScan parquet \[nn_id[^\]]*codes", plan), plan
    assert re.search(r"FileScan parquet \[cent_id[^\]]*cent_vec", plan), plan


def test_ann_index_build_coded_matches_fused_pass(spark, sf_dir):
    """The build's coded inverted lists equal the fused in-query
    pass's (nn_id, cent_id, codes) rows exactly — the registered
    ann_index_build query certifies this frame (exploded) against the
    residual chain's CTEs cut at the coded seam."""
    emb = load_table(spark, "embeddings", sf_dir)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    got = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in index["coded"].collect()
    )
    cents, cid_type = S._coarse_cents(
        emb, 10, None, 2, "vec_id", "embedding", "test"
    )
    _, coded, _ = S._fused_residual_index(
        emb, cents, 4, 16, 2, "vec_id", "embedding", 64, 5, cid_type
    )
    want = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in coded.collect()
    )
    assert got == want and len(got) > 0


def test_ann_index_read_incomplete_codebooks_raises(
    spark, sf_dir, tmp_path
):
    """A codebooks table missing (sub, code) rows must fail loudly at
    read time, not slice short LUTs silently at query time."""
    emb = load_table(spark, "embeddings", sf_dir)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = str(tmp_path / "annidx")
    S.ann_index_write(index, path)
    spark.read.parquet(path + "/codebooks").filter(
        F.col("code") < 15
    ).write.mode("overwrite").parquet(path + "/codebooks2")
    import shutil

    shutil.rmtree(path + "/codebooks")
    shutil.move(path + "/codebooks2", path + "/codebooks")
    with pytest.raises(ValueError, match="incomplete"):
        S.ann_index_read(spark, path)


def test_pq_train_null_gate_raises_both_regimes(spark):
    """The r13 hand-off subtlety as a pinned raise: a corpus whose RAW
    count passes the regime probe but whose NON-NULL count is below
    ksub must raise loudly in BOTH regimes (previously it reached
    _pq_train_local with < ksub rows and sliced SHORT codebooks
    silently)."""
    rows = [
        (i, [float(i % 3), 1.0, 0.5, -0.25] if i < 3 else None)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    for gate_rows in (None, 1):  # local regime, forced-distributed
        with pytest.raises(ValueError, match="non-null.*ksub"):
            S.pq_train(df, m=2, ksub=8, iters=1, gate_rows=gate_rows)


def test_pq_train_sample_gate_counts_non_null(spark):
    """The xxhash64 sample gate must count NON-NULL vectors: a sample
    with >= ksub raw rows but < ksub non-null ones falls back to the
    full corpus (same as the fused regime's gate) instead of
    mistraining on the degenerate sample."""
    import random

    rng = random.Random(43)
    base = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(4)])
        for i in range(120)
    ]
    df0 = spark.createDataFrame(
        base, "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    sample_ids = {
        r["vec_id"]
        for r in df0.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(3)) == 0
        ).collect()
    }
    assert len(sample_ids) >= 8, "need a big enough hash sample"
    keep_non_null = set(list(sorted(sample_ids))[:3])  # < ksub survive
    rows = [
        (i, None if (i in sample_ids and i not in keep_non_null) else v)
        for i, v in base
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    books_sampled = S.pq_train(
        df, m=2, ksub=8, iters=1, train_sample_mod=3
    )
    books_full = S.pq_train(df, m=2, ksub=8, iters=1)
    assert books_sampled == books_full  # fallback took the full corpus


def test_pq_train_residual_regimes_bit_identical_with_nulls(spark):
    """r14 extension of the two-regime residual fuzz: NULL rvec rows
    mixed in (the unfused resid frame carries them when a coarse
    centroid has a NULL embedding) — both regimes must drop them
    identically and publish the same codebook bits."""
    import random

    rng = random.Random(20260816)
    for trial in range(4):
        m = rng.choice([2, 4])
        sublen = rng.choice([2, 4])
        dim = m * sublen
        ksub = rng.choice([4, 8])
        n = rng.randint(ksub + 4, 50)
        rows = []
        for i in range(n):
            if rng.random() < 0.25 and i >= ksub + 1:
                rows.append((i, None))
            else:
                rows.append(
                    (i, [round(rng.uniform(-1.9, 1.9), 3)
                         for _ in range(dim)])
                )
        non_null = sum(1 for _, v in rows if v is not None)
        if non_null < ksub:
            continue
        df = spark.createDataFrame(rows, "vec_id LONG, rvec ARRAY<DOUBLE>")
        local = S.pq_train(
            df, m=m, ksub=ksub, iters=2, vec_col="rvec", normalize=False
        )
        dist = S.pq_train(
            df, m=m, ksub=ksub, iters=2, vec_col="rvec",
            normalize=False, gate_rows=1,
        )
        assert local == dist, f"trial {trial}"


def _write_null_centroid_corpus(spark, tmp_path):
    """30 rows, dim 8: id 20 (the HIGHEST strided centroid id) has a
    NULL embedding; ids 7 and 13 are ZERO vectors — their cosine to
    every centroid is invalid, so the max_by tie rule assigns them to
    cent 20, whose NULL unit form nulls their residuals: both engines
    (and the fixed oracle) must DROP them from training and encode."""
    import random

    rng = random.Random(14)
    rows = []
    for i in range(30):
        if i == 20:
            rows.append((i, None))
        elif i in (7, 13):
            rows.append((i, [0.0] * 8))
        else:
            rows.append(
                (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            )
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    pq = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    return df, pq


def test_residual_oracle_null_strided_centroid_parity(spark, tmp_path):
    """r13 ADVICE #1 regression net: on a corpus with a NULL embedding
    at a strided centroid id plus zero-vector rows (which the tie rule
    assigns to that centroid), the DuckDB residual oracle must agree
    with BOTH Spark regimes — pre-fix the oracle kept NULL-rvec rows,
    coded them [0,0,...] and let them compete in the ADC scan."""
    import duckdb

    from map_v2_etl_spark.plans.duck_vec import pq_topk_ctes

    df, pq = _write_null_centroid_corpus(spark, tmp_path)
    got_unfused = _rows(
        S.ivf_pq_residual_topk(
            df, df.filter(F.col("vec_id") % 9 == 0), k=3, m=2, ksub=4,
            candidates=10, centroid_stride=10, nprobe=2,
        )
    )
    got_fused = _rows(
        S.ivf_pq_residual_topk(
            df, df.filter(F.col("vec_id") % 9 == 0), k=3, m=2, ksub=4,
            candidates=10, centroid_stride=10, nprobe=2, fused=True,
        )
    )
    sql = pq_topk_ctes(
        m=2, ksub=4, iters=2, dim=8, candidates=10, k=3,
        sample_mod=1, q_mod=9, centroid_stride=10, nprobe=2,
        residual=True,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{pq}/*.parquet')"
    )
    want = sorted(
        (q, n, r, c) for q, n, r, c in con.sql(sql).fetchall()
    )
    assert got_unfused == want
    assert got_fused == want
    # the zero-vector rows must not appear as neighbors: their
    # residuals are NULL and they carry no codes in any engine
    assert all(n not in (7, 13) for _, n, _, _ in want)


def test_residual_null_centroid_gate_alignment(spark, tmp_path):
    """r13 ADVICE #2: near the >= ksub boundary, the fused and unfused
    regimes must agree on WHETHER training is possible. Here the resid
    frame's non-null count (6) is below ksub=8 while its raw row count
    (11) would have passed the old gate — BOTH regimes now raise the
    loud non-null ValueError instead of diverging."""
    rows = []
    import random

    rng = random.Random(7)
    for i in range(12):
        if i == 10:
            rows.append((i, None))  # NULL strided centroid
        elif i in (1, 3, 5, 7, 9):
            rows.append((i, [0.0] * 4))  # -> cent 10 -> NULL residual
        else:
            rows.append(
                (i, [round(rng.uniform(-1, 1), 3) for _ in range(4)])
            )
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    for fused in (False, True):
        with pytest.raises(ValueError, match="non-null.*ksub"):
            S.ivf_pq_residual_topk(
                df, df.filter(F.col("vec_id") % 6 == 0), k=2, m=2,
                ksub=8, candidates=5, centroid_stride=10, nprobe=2,
                fused=fused,
            ).collect()


def test_ann_index_partitioned_layout_dpp_and_bit_parity(
    spark, sf_dir, tmp_path
):
    """partition_by_cell=True (the literal Faiss inverted-list file
    layout): results stay BIT-IDENTICAL to the flat layout, and the
    routed ADC join triggers dynamic partition pruning on the coded
    scan — only probed cells' FILES are read (the map-side row drop
    becomes a file-level skip; at 10^9 vectors that is the difference
    between reading nprobe/nlist of the bytes and all of them)."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    flat, parted = str(tmp_path / "flat"), str(tmp_path / "parted")
    S.ann_index_write(index, flat)
    S.ann_index_write(index, parted, partition_by_cell=True)
    r_flat = S.ann_index_read(spark, flat)
    r_part = S.ann_index_read(spark, parted)
    # the type-inference cast restored the exact cent_id type
    assert (
        r_part["coded"].schema["cent_id"].dataType
        == r_flat["coded"].schema["cent_id"].dataType
    )
    got_flat = _rows(
        S.ann_index_topk(r_flat, qs, emb, k=5, candidates=50, nprobe=4)
    )
    df_part = S.ann_index_topk(
        r_part, qs, emb, k=5, candidates=50, nprobe=4
    )
    assert _rows(df_part) == got_flat
    plan = df_part._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan


def test_ann_index_add_equals_full_encode(spark, sf_dir):
    """Faiss add() contract: building on the even half and adding the
    odd half must produce coded lists BIT-IDENTICAL to encoding the
    combined corpus against the same frozen artifacts (encode is
    per-row) — and therefore identical query results."""
    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    index = S.ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    grown = S.ann_index_add(index, extra)
    # same frozen artifacts, full-corpus encode in one pass
    cents = index["cents"]
    full_coded = S._fused_residual_pass(
        emb,
        S._collect_cent_rows(cents),
        index["books"],
        "vec_id",
        "embedding",
        cent_id_type=index["coded"].schema["cent_id"].dataType,
    )
    got = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in grown["coded"].collect()
    )
    want = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in full_coded.collect()
    )
    assert got == want and len(got) > len(
        index["coded"].collect()
    ) > 0
    # the input handle is not mutated
    assert index["coded"] is not grown["coded"]


def test_ann_index_add_dim_mismatch_raises(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    bad = spark.createDataFrame(
        [(10_001, [0.1, 0.2])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="dim"):
        S.ann_index_add(index, bad)


def test_ann_index_filtered_topk_pre_filter_semantics(spark, sf_dir):
    """Pre-filtering contract: every neighbor satisfies the predicate,
    AND the result equals brute-force cosine top-k restricted to the
    allowed subset wherever the unfiltered index already agreed with
    brute force on that subset — concretely, filtered search still
    returns k rows per query (post-filtering an already-cut candidate
    list would not)."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    out = S.ann_index_topk(
        index, qs, emb, k=5, candidates=50, nprobe=4,
        corpus_filter=F.col("nn_id") % 3 != 0,
    ).collect()
    assert all(r["nn_id"] % 3 != 0 for r in out)
    n_q = qs.count()
    per_q = {}
    for r in out:
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert len(per_q) == n_q and all(v == 5 for v in per_q.values())


def test_pq_oracle_null_corpus_rows_parity(spark, tmp_path):
    """r14 fix, ADVICE-#1 class, NON-residual PQ chain: NULL-embedding
    corpus rows must drop from the oracle's training sample (a NULL at
    a LOW id previously seeded a NULL b0 init centroid) and from its
    encode side (NULL codes previously competed in adc) exactly as the
    Spark side always dropped them. Runs the DuckDB oracle against
    BOTH registered plan shapes (full-scan pq_cosine_topk and routed
    ivf_pq_topk) on a corpus with NULLs at low and strided ids."""
    import random

    import duckdb

    from map_v2_etl_spark.plans.duck_vec import pq_topk_ctes

    rng = random.Random(41)
    rows = []
    for i in range(30):
        if i in (1, 13):  # low id -> inside the first-ksub init window
            rows.append((i, None))
        else:
            rows.append(
                (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            )
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    pq = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{pq}/*.parquet')"
    )
    qs = df.filter(F.col("vec_id") % 9 == 0)

    got_full = _rows(
        S.pq_cosine_topk(df, qs, k=3, m=2, ksub=4, candidates=10)
    )
    sql_full = pq_topk_ctes(
        m=2, ksub=4, iters=2, dim=8, candidates=10, k=3,
        sample_mod=1, q_mod=9,
    )
    want_full = sorted(
        (q, n, r, c) for q, n, r, c in con.sql(sql_full).fetchall()
    )
    assert got_full == want_full
    assert all(n not in (1, 13) for _, n, _, _ in want_full)

    got_routed = _rows(
        S.ivf_pq_topk(
            df, qs, k=3, m=2, ksub=4, candidates=10,
            centroid_stride=10, nprobe=2,
        )
    )
    sql_routed = pq_topk_ctes(
        m=2, ksub=4, iters=2, dim=8, candidates=10, k=3,
        sample_mod=1, q_mod=9, centroid_stride=10, nprobe=2,
    )
    want_routed = sorted(
        (q, n, r, c) for q, n, r, c in con.sql(sql_routed).fetchall()
    )
    assert got_routed == want_routed
