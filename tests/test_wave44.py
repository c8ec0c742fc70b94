"""Wave-44: IVF-SQ8 (scalar-quantization ANN) — pure-Python twin fuzz,
plan contract, recall-vs-PQ fidelity pin.

Reference parity: the reference engine (build.sh:75-233) has no ANN
surface; §2.11 training-pipeline extension.
"""

import math
import random
import re

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources.registry import load_table


def _unit_py(v):
    acc = 0.0
    for x in v:
        acc = acc + x * x
    n = math.sqrt(acc)
    if n == 0.0:
        return [0.0 for _ in v]
    return [x / n for x in v]


def _fold_cos(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    sa = 0.0
    for x in a:
        sa = sa + x * x
    sb = 0.0
    for y in b:
        sb = sb + y * y
    den = math.sqrt(sa) * math.sqrt(sb)
    if den == 0.0 or math.isnan(dot / den):
        return None
    return dot / den


def _ref_ivf_sq(ids, vecs, q_ids, stride, nprobe, candidates, k,
                sample_ids):
    """Independent pure-Python IVF-SQ8: same folds, tie rules, and
    quantization terms as the Spark plan / DuckDB oracle."""
    id2v = dict(zip(ids, vecs))
    cents = [(i, id2v[i]) for i in ids if i % stride == 0]
    # corpus assignment: (valid, cs, cent_id) max — ties to HIGHEST id
    assign = {}
    for i in ids:
        v = id2v[i]
        if v is None:
            continue  # never coded (no unit form)
        best = None
        for cid, cv in cents:
            cs = None if cv is None else _fold_cos(v, cv)
            key = (cs is not None, cs if cs is not None else 0.0, cid)
            if best is None or (
                key[0] > best[0]
                or (key[0] == best[0] and key[0] and key[1] > best[1])
                or (key[0] == best[0]
                    and (not key[0] or key[1] == best[1])
                    and cid > best[2])
            ):
                best = key
        assign[i] = best[2]
    units = {i: _unit_py(v) for i, v in id2v.items() if v is not None}
    # train: exact per-dim min/max over the sampled unit vectors
    tr = [units[i] for i in sample_ids if i in units]
    if not tr:
        tr = list(units.values())
    dim = len(tr[0])
    vmin = [min(u[j] for u in tr) for j in range(dim)]
    vmax = [max(u[j] for u in tr) for j in range(dim)]

    def encode(u):
        cs = []
        for j in range(dim):
            rng = vmax[j] - vmin[j]
            if rng == 0.0:
                cs.append(0)
                continue
            t = (u[j] - vmin[j]) / rng
            t = min(max(t, 0.0), 1.0)
            cs.append(int(math.floor(t * 255.0 + 0.5)))
        return cs

    codes = {i: encode(u) for i, u in units.items()}
    out = []
    for q in q_ids:
        qv = id2v[q]
        scored = []
        for cid, cv in cents:
            cs = None if (qv is None or cv is None) else _fold_cos(qv, cv)
            scored.append((0 if cs is None else 1,
                           cs if cs is not None else 0.0, cid))
        # probes: cs desc (invalid last), ties to LOWEST cent_id
        scored.sort(key=lambda t: (-t[0], -t[1], t[2]))
        probes = [cid for _, _, cid in scored[:nprobe]]
        uq = units.get(q)
        cand = []
        for i, cs_codes in codes.items():
            if i == q or assign.get(i) not in probes:
                continue
            acc = 0.0
            for j in range(dim):
                dec = vmin[j] + (
                    float(cs_codes[j]) * (vmax[j] - vmin[j])
                ) / 255.0
                d = uq[j] - dec
                acc = acc + d * d
            cand.append((acc, i))
        cand.sort()
        reranked = []
        for _, i in cand[:candidates]:
            c = _fold_cos(qv, id2v[i])
            reranked.append((-(c if c is not None else -9e99), i, c))
        reranked.sort()
        for r, (_, i, c) in enumerate(reranked[:k], 1):
            out.append((q, i, r, c))
    return sorted(out)


def test_ivf_sq_fuzz_vs_python_twin(spark):
    """Randomized bit-equality vs the independent twin across
    stride/nprobe/candidates/k/|corpus|/dim, with planted duplicates
    and zero vectors. 60 volume trials passed before this 6-trial
    permanent cut (fuzz-before-ship protocol)."""
    rng = random.Random(20260814)
    for t in range(6):
        dim = rng.choice([4, 8])
        n = rng.randint(14, 48)
        stride = rng.choice([4, 7, 10])
        nprobe = rng.choice([2, 3])
        candidates = rng.choice([6, 12])
        k = rng.choice([2, 3])
        mod = rng.choice([1, 3])
        vecs = []
        for i in range(n):
            r = rng.random()
            if r < 0.08:
                vecs.append([0.0] * dim)
            elif r < 0.2 and vecs:
                vecs.append(vecs[rng.randrange(len(vecs))])
            else:
                vecs.append(
                    [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
                )
        ids = list(range(n))
        df = spark.createDataFrame(
            list(zip(ids, vecs)), "vec_id LONG, embedding ARRAY<DOUBLE>"
        )
        q_ids = [i for i in ids if i % 6 == 0]
        qs = df.filter(F.col("vec_id") % 6 == 0)
        if mod > 1:
            sample_ids = sorted(
                r["vec_id"]
                for r in df.filter(
                    F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0
                ).collect()
            )
            if not sample_ids:
                sample_ids = ids
        else:
            sample_ids = ids
        got = sorted(
            (r["q_id"], r["nn_id"], r["rank"], r["cosine"])
            for r in S.ivf_sq_topk(
                df, qs, k=k, candidates=candidates,
                centroid_stride=stride, nprobe=nprobe,
                train_sample_mod=mod,
            ).collect()
        )
        want = _ref_ivf_sq(
            ids, vecs, q_ids, stride, nprobe, candidates, k, sample_ids
        )
        assert got == want, (
            f"trial {t} dim={dim} n={n} stride={stride} "
            f"nprobe={nprobe} cand={candidates} k={k} mod={mod}\n"
            f" got={got}\n want={want}"
        )


def test_ivf_sq_plan_routed_all_jvm(spark, sf_dir):
    """Plan contract: the scan is a BroadcastHashJoin on cent_id
    (non-probed cells drop map-side); the WHOLE pipeline is JVM
    expressions — no MapInPandas, no Arrow pass, no CartesianProduct;
    the only BNLJs are the two bounded centroid cross-scorings."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    df = S.ivf_sq_topk(
        emb, qs, k=5, candidates=50, centroid_stride=10, nprobe=4,
        train_sample_mod=5,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin \[cent_id", plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "MapInPandas" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan


def test_ivf_sq_recall_dominates_pq_at_tight_budget(spark, sf_dir):
    """Fidelity pin: at the same routing and the same tight candidate
    budget (12), SQ8's 8-bit-per-dimension codes (64 B/vec) must hold
    recall at least as high as 4x16 PQ's 4 B/vec — the memory/fidelity
    tradeoff the deployment ladder is built on."""
    from map_v2_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_topk,
        ivf_sq_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["q_id"], r["nn_id"])
        for r in cosine_topk(emb, qs, k=5).collect()
    }

    def recall(df):
        got = {(r["q_id"], r["nn_id"]) for r in df.collect()}
        return len(got & exact) / len(exact)

    r_sq = recall(ivf_sq_topk(
        emb, qs, k=5, candidates=12, centroid_stride=10, nprobe=4,
        train_sample_mod=5,
    ))
    r_pq = recall(ivf_pq_topk(
        emb, qs, k=5, candidates=12, centroid_stride=10, nprobe=4,
        train_sample_mod=5,
    ))
    assert r_sq >= r_pq, (r_sq, r_pq)
    assert r_sq >= 0.75, r_sq


def test_ann_index_stream_add_equals_batch_add(spark, sf_dir, tmp_path):
    """Streaming maintenance contract: 3 micro-batches of arrivals
    encoded with frozen artifacts and appended must leave the index
    BIT-IDENTICAL to one batch ann_index_add of the same rows — and
    the run must actually micro-batch (one batch per arrival file)."""
    from map_v2_etl_spark.streaming.ann_maintenance import (
        ann_index_stream_add,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    index = S.ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = str(tmp_path / "annidx")
    S.ann_index_write(index, path)
    arrivals = str(tmp_path / "arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)
    grown = ann_index_stream_add(spark, path, arrivals)
    assert grown["n_stream_batches"] == 3

    want = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in S.ann_index_add(index, extra)["coded"].collect()
    )
    got = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in grown["coded"].collect()
    )
    assert got == want and len(got) > 0


def test_ann_index_stream_add_incremental_checkpoint(
    spark, sf_dir, tmp_path
):
    """Long-running-deployment semantics: a SECOND ann_index_stream_add
    over the same arrivals directory + checkpoint processes ONLY the
    files that landed since the first run (the file-source offset log
    makes re-runs incremental, not duplicating), and the grown index
    equals one batch add of all arrivals."""
    from map_v2_etl_spark.streaming.ann_maintenance import (
        ann_index_stream_add,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 4 == 0)
    w1 = emb.filter(F.col("vec_id") % 4 == 1)
    w2 = emb.filter(F.col("vec_id") % 4 == 2)
    index = S.ann_index_build(
        base, m=4, ksub=16, centroid_stride=20, train_sample_mod=5,
    )
    path = str(tmp_path / "annidx")
    S.ann_index_write(index, path)
    arrivals = str(tmp_path / "arrivals")
    w1.repartition(2).write.mode("overwrite").parquet(arrivals)
    grown1 = ann_index_stream_add(spark, path, arrivals)
    assert grown1["n_stream_batches"] == 2
    # second wave lands in the SAME directory; same checkpoint
    w2.repartition(2).write.mode("append").parquet(arrivals)
    grown2 = ann_index_stream_add(spark, path, arrivals)
    assert grown2["n_stream_batches"] == 2  # only the NEW files
    want = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in S.ann_index_add(
            index, w1.unionByName(w2)
        )["coded"].collect()
    )
    got = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in grown2["coded"].collect()
    )
    assert got == want and len(got) > 0
