"""Wave-41: residual IVF-PQ (Faiss by_residual=True) — recall, plan
contract, guards, and a randomized bit-equality fuzz vs a pure-Python
twin.

The residual coding's point is ADC fidelity: at a tight candidate
budget the exact re-rank can no longer mask quantization error, and the
residual variant must recover more of the exact top-k than the plain
one (measured 0.84 vs 0.64 at sf0.01, candidates=12).
"""

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources.registry import load_table


def test_ivf_pq_residual_recall_and_exact_cosines(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact_rows = S.cosine_topk(emb, qs, k=5).collect()
    exact = {(r.q_id, r.nn_id) for r in exact_rows}
    got_rows = S.ivf_pq_residual_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50,
        centroid_stride=10, nprobe=8,
    ).collect()
    got = {(r.q_id, r.nn_id) for r in got_rows}
    # uniform-random embeddings are the IVF worst case; same floor as
    # the wave-39 test. Measured at sf0.001/nprobe=8: well above.
    recall = len(exact & got) / len(exact)
    assert recall >= 0.3, f"recall@5 {recall:.2f}"
    per_q = {}
    for q_id, _ in got:
        per_q[q_id] = per_q.get(q_id, 0) + 1
    assert max(per_q.values()) <= 5
    # cosines are exact (re-rank on raw vectors)
    exact_cos = {
        (r.q_id, r.nn_id): r.cosine
        for r in S.cosine_topk(emb, qs, k=100).collect()
    }
    for r in got_rows:
        if (r.q_id, r.nn_id) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.q_id, r.nn_id)]) < 1e-12


def test_residual_beats_plain_adc_at_tight_budget(spark, sf_dir):
    """The reason this variant exists: at candidates=12 the residual
    coding recovers at least as much of the exact top-5 as the plain
    coding (Faiss's by_residual fidelity claim; measured 0.84 vs 0.64
    at sf0.01 and a comparable gap at sf0.001)."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {(r.q_id, r.nn_id) for r in S.cosine_topk(emb, qs, k=5).collect()}
    kw = dict(
        k=5, m=4, ksub=16, candidates=12,
        centroid_stride=10, nprobe=4, train_sample_mod=5,
    )
    res = {
        (r.q_id, r.nn_id)
        for r in S.ivf_pq_residual_topk(emb, qs, **kw).collect()
    }
    pla = {
        (r.q_id, r.nn_id)
        for r in S.ivf_pq_topk(emb, qs, **kw).collect()
    }
    r_res = len(exact & res) / len(exact)
    r_pla = len(exact & pla) / len(exact)
    assert r_res >= r_pla, f"residual {r_res:.2f} < plain {r_pla:.2f}"


def test_ivf_pq_residual_plan_routed_not_full_scan(spark, sf_dir):
    """Physical-plan contract: the ADC scan is an equi-join on cent_id
    (broadcast per-cell LUT frame — non-probed cells drop map-side);
    the coarse-assignment crossJoin is localCheckpoint-truncated OUT of
    the result plan, leaving exactly two broadcast-bounded
    nested-loop joins (queries x centroids for the probes, probe frame
    x codewords for the LUT). No CartesianProduct anywhere."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    df = S.ivf_pq_residual_topk(emb, qs, k=5, centroid_stride=10, nprobe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin \[cent_id", plan), plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan


def test_ivf_pq_residual_subset_of_probed_cells(spark, sf_dir):
    """Every returned neighbor lives in one of its query's probed cells
    — the per-cell LUT join is the routing, not decoration."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    got = S.ivf_pq_residual_topk(
        emb, qs, k=5, centroid_stride=10, nprobe=4
    ).collect()
    ivf = S.ivf_cosine_topk(
        emb, qs, k=10**9, centroid_stride=10, nprobe=4
    )
    allowed = {(r.q_id, r.nn_id) for r in ivf.collect()}
    for r in got:
        assert (r.q_id, r.nn_id) in allowed


def test_ivf_pq_residual_empty_corpus(spark):
    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    out = S.ivf_pq_residual_topk(empty, empty, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["q_id", "nn_id", "rank", "cosine"]


def test_ivf_pq_residual_empty_codebook_raises(spark):
    df = spark.createDataFrame(
        [(10 * i + 1, [float(i), 1.0]) for i in range(20)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    with pytest.raises(ValueError, match="coarse codebook is empty"):
        S.ivf_pq_residual_topk(df, df, k=2, m=2, centroid_stride=10)


# ---------------------------------------------------------------------------
# property: bit-exact pure-Python twin across the parameter space
# ---------------------------------------------------------------------------

def _fold_cos(a, b):
    dot = 0.0; na = 0.0; nb = 0.0
    for j in range(len(a)):
        dot = dot + a[j] * b[j]
    for j in range(len(a)):
        na = na + a[j] * a[j]
    for j in range(len(b)):
        nb = nb + b[j] * b[j]
    den = math.sqrt(na) * math.sqrt(nb)
    if den == 0:
        return None
    c = dot / den
    return None if math.isnan(c) else c


def _unit_py(v):
    n = 0.0
    for x in v:
        n = n + x * x
    n = math.sqrt(n)
    if n == 0:
        return [0.0] * len(v)
    return [x / n for x in v]


def _assign_py(ids, id2v, cents):
    """max cosine, ties -> max cent_id (the operator's max_by rule)."""
    assign = {}
    for i in ids:
        best = None
        for cid, cv in cents:
            cs = _fold_cos(id2v[i], cv)
            key = (cs is not None, cs if cs is not None else 0.0, cid)
            if best is None or key > best[0]:
                best = (key, cid)
        assign[i] = best[1]
    return assign


def _ref_ivf_pq_residual(
    ids, vecs, qids, books, k, m, ksub, candidates, stride, nprobe,
    cents=None,
):
    """Independent residual IVF-PQ: residuals u(x) - u(c) via the same
    left folds, fold-order encode on the residuals (no normalization),
    per-(query, probed-cell) LUT part = ||(u(q) - u(cent))_s - cw||^2,
    routed ADC, exact re-rank. ``cents`` overrides the strided coarse
    codebook (the kmeans_cells regime passes lloyd_centroids output)."""
    dim = len(vecs[0]); sublen = dim // m
    id2v = dict(zip(ids, vecs))
    if cents is None:
        cents = [(i, id2v[i]) for i in ids if i % stride == 0]
    ucent = {cid: _unit_py(cv) for cid, cv in cents}
    assign = _assign_py(ids, id2v, cents)
    resid = {
        i: [a - b for a, b in zip(_unit_py(id2v[i]), ucent[assign[i]])]
        for i in ids
    }
    codes = {}
    for i in ids:
        rv = resid[i]
        cs_ = []
        for s in range(m):
            X = rv[s * sublen:(s + 1) * sublen]
            dists = []
            for code in range(ksub):
                C = books[s][code]
                d = 0.0
                for j in range(sublen):
                    diff = X[j] - C[j]
                    d = d + diff * diff
                dists.append(d)
            cs_.append(min(range(ksub), key=lambda c: (dists[c], c)))
        codes[i] = cs_
    out = []
    for q in qids:
        qv = id2v[q]
        scored = []
        for cid, cv in cents:
            cs = _fold_cos(qv, cv)
            scored.append((cid, cs))
        # probes: desc cs, asc cent_id
        scored.sort(key=lambda t: (
            t[1] is None, -(t[1] if t[1] is not None else 0.0), t[0]
        ))
        probe = [cid for cid, _ in scored[:nprobe]]
        qu = _unit_py(qv)
        luts = {}
        for cid in probe:
            lut = []
            for s in range(m):
                dsl = [
                    qu[s * sublen + j] - ucent[cid][s * sublen + j]
                    for j in range(sublen)
                ]
                for code in range(ksub):
                    C = books[s][code]
                    d = 0.0
                    for j in range(sublen):
                        diff = dsl[j] - C[j]
                        d = d + diff * diff
                    lut.append(d)
            luts[cid] = lut
        adc = []
        for i in ids:
            if i == q or assign[i] not in luts:
                continue
            lut = luts[assign[i]]
            a = 0.0
            for s in range(m):
                a = a + lut[s * ksub + codes[i][s]]
            adc.append((i, a))
        adc.sort(key=lambda t: (t[1], t[0]))
        cand = [i for i, _ in adc[:candidates]]
        rer = []
        for i in cand:
            c = _fold_cos(qv, id2v[i])
            rer.append((i, c))
        rer.sort(key=lambda t: (
            t[1] is None, -(t[1] if t[1] is not None else 0.0), t[0]
        ))
        for rank, (i, c) in enumerate(rer[:k], 1):
            out.append((q, i, rank, c))
    return set(out)


def test_ivf_pq_residual_fuzz_vs_python_twin(spark):
    """Randomized bit-equality of the residual operator against the
    independent pure-Python twin across the parameter space — m, ksub,
    dim, stride, nprobe, candidates, k, |corpus| all randomized. Books
    come from pq_train(normalize=False) over a residual frame whose
    rvec values the twin recomputes with the same left folds (so the
    codebooks are shared and the comparison isolates the operator's
    assignment/LUT/ADC/re-rank plumbing; pq_train's two-regime
    bit-equality has separate nets — normalize=True in
    test_similarity.py, normalize=False in
    test_pq_train_residual_regimes_bit_identical below). 60 volume
    trials passed
    before this 10-trial permanent cut (r12 fuzz-before-ship protocol).
    Exact tuple-set equality INCLUDING the float cosines."""
    import numpy as np

    rng = random.Random(20260816)
    for t in range(10):
        m = rng.choice([2, 4])
        sublen = rng.choice([2, 4])
        dim = m * sublen
        ksub = rng.choice([4, 8])
        n = rng.randint(max(20, ksub + 2), 90)
        stride = rng.choice([3, 5, 10])
        nprobe = rng.choice([1, 2, 4])
        candidates = rng.choice([5, 20])
        k = rng.choice([3, 5])
        qmod = rng.choice([7, 10])
        ids = list(range(n))
        vecs = [
            [float(np.float32(rng.uniform(-1, 1))) for _ in range(dim)]
            for _ in ids
        ]
        qids = [i for i in ids if i % qmod == 0]
        df = spark.createDataFrame(
            list(zip(ids, vecs)), "vec_id BIGINT, embedding ARRAY<FLOAT>"
        )
        qdf = df.filter(f"vec_id % {qmod} = 0")
        # books over the PYTHON-computed residual frame: the fold-exact
        # residuals equal the operator's JVM zip_with output bit for
        # bit, so both sides train on identical inputs
        id2v = dict(zip(ids, vecs))
        cents = [(i, id2v[i]) for i in ids if i % stride == 0]
        ucent = {cid: _unit_py(cv) for cid, cv in cents}
        assign = _assign_py(ids, id2v, cents)
        rvecs = [
            (i, [a - b for a, b in
                 zip(_unit_py(id2v[i]), ucent[assign[i]])])
            for i in ids
        ]
        rdf = spark.createDataFrame(
            rvecs, "vec_id BIGINT, rvec ARRAY<DOUBLE>"
        )
        books = S.pq_train(
            rdf, m=m, ksub=ksub, iters=2, vec_col="rvec", normalize=False
        )
        got = {
            (r.q_id, r.nn_id, r.rank, r.cosine)
            for r in S.ivf_pq_residual_topk(
                df, qdf, k=k, m=m, ksub=ksub, candidates=candidates,
                centroid_stride=stride, nprobe=nprobe,
            ).collect()
        }
        exp = _ref_ivf_pq_residual(
            ids, vecs, qids, books, k, m, ksub, candidates, stride, nprobe
        )
        assert got == exp, (
            f"trial {t}: n={n} dim={dim} m={m} ksub={ksub} "
            f"stride={stride} nprobe={nprobe} cand={candidates} k={k}\n"
            f" only got: {sorted(got - exp)[:6]}\n"
            f" only exp: {sorted(exp - got)[:6]}"
        )


def test_pq_train_residual_regimes_bit_identical(spark):
    """normalize=False two-regime contract (review finding, r13): the
    NumPy fast path and the distributed loop must publish the SAME
    codebook for RESIDUAL-space inputs too — components in [-2, 2],
    no unit rescale, decimal(27,12) means. Randomized across
    m/ksub/n/iters with duplicate rows and near-tie values; gate_rows=1
    forces the distributed regime (the documented test override)."""
    import random

    from map_v2_etl_spark.operators.similarity import pq_train

    rng = random.Random(20260817)
    for trial in range(6):
        m = rng.choice([2, 4])
        sublen = rng.choice([2, 4])
        dim = m * sublen
        ksub = rng.choice([4, 8])
        n = rng.randint(ksub + 2, 60)
        iters = rng.choice([1, 2])
        rows = []
        for i in range(n):
            if rng.random() < 0.2 and rows:
                rows.append((i, rows[rng.randrange(len(rows))][1]))
            else:
                # residual-like values: differences of unit components,
                # magnitude up to ~2, including exact-grid near-ties
                rows.append(
                    (
                        i,
                        [
                            round(rng.uniform(-1.9, 1.9), 3)
                            for _ in range(dim)
                        ],
                    )
                )
        df = spark.createDataFrame(
            rows, "vec_id LONG, rvec ARRAY<DOUBLE>"
        )
        local = pq_train(
            df, m=m, ksub=ksub, iters=iters, vec_col="rvec",
            normalize=False,
        )
        dist = pq_train(
            df, m=m, ksub=ksub, iters=iters, vec_col="rvec",
            normalize=False, gate_rows=1,
        )
        assert local == dist, (
            f"trial {trial} m={m} ksub={ksub} n={n} iters={iters}:\n"
            f" local={local}\n dist={dist}"
        )


def test_ivf_pq_residual_fused_plan_zero_corpus_shuffles(spark, sf_dir):
    """fused=True plan contract: the corpus side is scan -> ONE
    MapInPandas -> BroadcastHashJoin on cent_id. No checkpoint scan, no
    corpus-side equi-join, no cartesian; the only BNLJ left is the
    queries x centroids probe scoring (the per-cell LUT frame joins
    cents_u equi-style). The unfused plan's 2-BNLJ / checkpoint shape
    must NOT reappear."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    df = S.ivf_pq_residual_topk(
        emb, qs, k=5, centroid_stride=10, nprobe=4, fused=True
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin \[cent_id", plan), plan
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan, plan
    # no localCheckpoint RDD scan in the fused plan: the unfused
    # assignment checkpoint scans as ExistingRDD[nn_id..., cent_id...];
    # the only ExistingRDD allowed here is the constant-size codeword
    # table (sub, code, cent)
    assert not re.search(r"ExistingRDD\[nn_id", plan), plan


def test_ivf_pq_residual_fused_fuzz_vs_unfused(spark):
    """Randomized bit-equality of the fused single-pass regime against
    the unfused join plan — zero vectors, exact duplicates, and
    colinear (cosine-tie) rows planted to exercise every tie rule, the
    degenerate-cosine NULL path, and the training-sample fallback.
    50 volume trials passed before this 8-trial permanent cut (r12
    fuzz-before-ship protocol). Exact tuple-set equality INCLUDING the
    float cosines."""
    import numpy as np

    rng = random.Random(424214)
    for t in range(8):
        m = rng.choice([2, 4])
        sublen = rng.choice([2, 4])
        dim = m * sublen
        ksub = rng.choice([4, 8])
        n = rng.randint(max(24, ksub + 4), 80)
        stride = rng.choice([3, 5, 10])
        nprobe = rng.choice([1, 2, 4])
        candidates = rng.choice([5, 20])
        k = rng.choice([3, 5])
        qmod = rng.choice([7, 10])
        tsm = rng.choice([None, 2, 3])
        ids = list(range(n))
        vecs = []
        for _i in ids:
            r = rng.random()
            if r < 0.06:
                vecs.append([0.0] * dim)
            elif r < 0.18 and vecs:
                vecs.append(list(vecs[rng.randrange(len(vecs))]))
            elif r < 0.26 and vecs:
                vecs.append([2.0 * x for x in vecs[-1]])
            else:
                vecs.append(
                    [float(np.float32(rng.uniform(-1, 1)))
                     for _ in range(dim)]
                )
        df = spark.createDataFrame(
            list(zip(ids, vecs)), "vec_id BIGINT, embedding ARRAY<FLOAT>"
        )
        qdf = df.filter(f"vec_id % {qmod} = 0")
        kw = dict(
            k=k, m=m, ksub=ksub, candidates=candidates,
            centroid_stride=stride, nprobe=nprobe, train_sample_mod=tsm,
        )
        a = {
            (r.q_id, r.nn_id, r.rank, r.cosine)
            for r in S.ivf_pq_residual_topk(df, qdf, **kw).collect()
        }
        b = {
            (r.q_id, r.nn_id, r.rank, r.cosine)
            for r in S.ivf_pq_residual_topk(
                df, qdf, fused=True, **kw
            ).collect()
        }
        assert a == b, (
            f"trial {t}: n={n} dim={dim} m={m} ksub={ksub} "
            f"stride={stride} nprobe={nprobe} cand={candidates} k={k} "
            f"tsm={tsm}\n unfused-only: {sorted(a - b)[:6]}\n"
            f" fused-only: {sorted(b - a)[:6]}"
        )


def test_ivf_pq_kmeans_fuzz_vs_python_twin(spark):
    """kmeans_cells regime: randomized bit-equality of the full Faiss
    default (Lloyd-refined coarse codebook + residual PQ) against the
    pure-Python twin, with the coarse centroids taken from
    lloyd_centroids (its own two-regime bit-equality has a separate
    net) and handed to the twin verbatim — isolating the composition
    plumbing. The FUSED regime is asserted equal in the same trial.
    40 volume trials passed before this 6-trial permanent cut."""
    import numpy as np

    from map_v2_etl_spark.operators.similarity import lloyd_centroids

    rng = random.Random(20260818)
    for t in range(6):
        m = rng.choice([2, 4])
        sublen = rng.choice([2, 4])
        dim = m * sublen
        ksub = rng.choice([4, 8])
        n = rng.randint(max(24, ksub + 4), 80)
        cells = rng.choice([3, 5, 8])
        kiters = rng.choice([1, 2])
        nprobe = rng.choice([1, 2])
        candidates = rng.choice([5, 20])
        k = rng.choice([3, 5])
        qmod = rng.choice([7, 10])
        ids = list(range(n))
        vecs = [
            [float(np.float32(rng.uniform(-1, 1))) for _ in range(dim)]
            for _ in ids
        ]
        qids = [i for i in ids if i % qmod == 0]
        df = spark.createDataFrame(
            list(zip(ids, vecs)), "vec_id BIGINT, embedding ARRAY<FLOAT>"
        )
        qdf = df.filter(f"vec_id % {qmod} = 0")
        cent_list = lloyd_centroids(df, k=cells, iters=kiters)
        cents = list(enumerate(cent_list))
        id2v = dict(zip(ids, vecs))
        ucent = {cid: _unit_py(cv) for cid, cv in cents}
        assign = _assign_py(ids, id2v, cents)
        rvecs = [
            (i, [a - b for a, b in
                 zip(_unit_py(id2v[i]), ucent[assign[i]])])
            for i in ids
        ]
        rdf = spark.createDataFrame(
            rvecs, "vec_id BIGINT, rvec ARRAY<DOUBLE>"
        )
        books = S.pq_train(
            rdf, m=m, ksub=ksub, iters=2, vec_col="rvec", normalize=False
        )
        kw = dict(
            k=k, m=m, ksub=ksub, candidates=candidates, nprobe=nprobe,
            kmeans_cells=cells, kmeans_iters=kiters,
        )
        got = {
            (r.q_id, r.nn_id, r.rank, r.cosine)
            for r in S.ivf_pq_residual_topk(df, qdf, **kw).collect()
        }
        exp = _ref_ivf_pq_residual(
            ids, vecs, qids, books, k, m, ksub, candidates,
            None, nprobe, cents=cents,
        )
        assert got == exp, (
            f"trial {t}: n={n} dim={dim} m={m} ksub={ksub} cells={cells} "
            f"kiters={kiters} nprobe={nprobe} cand={candidates} k={k}\n"
            f" only got: {sorted(got - exp)[:6]}\n"
            f" only exp: {sorted(exp - got)[:6]}"
        )
        fus = {
            (r.q_id, r.nn_id, r.rank, r.cosine)
            for r in S.ivf_pq_residual_topk(
                df, qdf, fused=True, **kw
            ).collect()
        }
        assert fus == got, f"trial {t}: fused != unfused under kmeans"


def test_fused_null_centroid_and_zero_vector_parity(spark):
    """Review fixes (r13): a NULL-embedding strided centroid must not
    crash the fused regime; rows whose every cosine is invalid (zero
    vectors) assign to the HIGHEST cent_id — here the NULL one — and
    DROP in both regimes (the unfused NULL-rvec path); outputs stay
    bit-equal."""
    import numpy as np

    rng = random.Random(7)
    rows = []
    for i in range(40):
        if i == 30:
            rows.append((i, None))  # NULL centroid at the highest id
        elif i in (5, 17):
            rows.append((i, [0.0] * 8))  # all-invalid -> NULL cent
        else:
            rows.append(
                (i, [float(np.float32(rng.uniform(-1, 1)))
                     for _ in range(8)])
            )
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    qs = emb.filter("vec_id % 10 = 3")
    kw = dict(k=3, m=2, ksub=4, candidates=10,
              centroid_stride=10, nprobe=2)
    a = {
        (r.q_id, r.nn_id, r.rank, r.cosine)
        for r in S.ivf_pq_residual_topk(emb, qs, **kw).collect()
    }
    b = {
        (r.q_id, r.nn_id, r.rank, r.cosine)
        for r in S.ivf_pq_residual_topk(emb, qs, fused=True, **kw).collect()
    }
    assert a == b and len(a) > 0
    nns = {nn for _, nn, _, _ in a}
    assert 5 not in nns and 17 not in nns  # dropped, not mis-coded


def test_fused_kmeans_string_ids(spark):
    """Review fix (r13): kmeans_cells emits LONG cluster cent_ids even
    when the corpus id column is a STRING — the fused regime's output
    schema must follow the cell-id type, not the id type."""
    rows = [
        (f"doc{i:03d}",
         [float((i * 3 + j) % 7 - 3) for j in range(8)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id STRING, embedding ARRAY<FLOAT>")
    qs = emb.filter("vec_id in ('doc003','doc011')")
    kw = dict(k=3, m=2, ksub=4, candidates=10, nprobe=2,
              kmeans_cells=4, kmeans_iters=1)
    a = {
        (r.q_id, r.nn_id, r.rank, r.cosine)
        for r in S.ivf_pq_residual_topk(emb, qs, **kw).collect()
    }
    b = {
        (r.q_id, r.nn_id, r.rank, r.cosine)
        for r in S.ivf_pq_residual_topk(emb, qs, fused=True, **kw).collect()
    }
    assert a == b and len(a) > 0


def test_fused_training_gate_ignores_null_embeddings(spark):
    """Review fix (r13): with train_sample_mod set, the fused sample
    gate must count NON-NULL-embedding rows only (the unfused pq_train
    gates on the resid frame, already null-purged) — a hash sample
    whose non-null count dips below ksub falls back to full-corpus
    training in BOTH regimes instead of crashing one of them."""
    import numpy as np

    rng = random.Random(11)
    # most hash-sampled rows carry NULL embeddings: the raw sample
    # passes >= ksub while the non-null sample does not
    rows = []
    for i in range(60):
        null = rng.random() < 0.8
        rows.append(
            (i, None if null else
             [float(np.float32(rng.uniform(-1, 1))) for _ in range(4)])
        )
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    qs = emb.filter("vec_id % 9 = 1")
    kw = dict(k=3, m=2, ksub=8, candidates=10,
              centroid_stride=7, nprobe=2, train_sample_mod=3)
    a = {
        (r.q_id, r.nn_id, r.rank, r.cosine)
        for r in S.ivf_pq_residual_topk(emb, qs, **kw).collect()
    }
    b = {
        (r.q_id, r.nn_id, r.rank, r.cosine)
        for r in S.ivf_pq_residual_topk(emb, qs, fused=True, **kw).collect()
    }
    assert a == b
