"""Wave-4 contracts: decontamination semantics, salience/repetition
invariants, the bucketed join's no-shuffle plan guarantee, and merge
branch correctness."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()


def run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    rows = run("decontaminate_docs", spark, sf_dir).collect()
    assert rows, "corpus side must be non-empty"
    assert all(r.doc_id % 10 != 0 for r in rows)
    n_docs = (
        REGISTRY["text_token_count"].fn(spark, sf_dir).count()
    )  # all docs
    # every non-benchmark doc is scored exactly once, clean or not
    assert len(rows) == n_docs - sum(1 for _ in range(0, n_docs, 10))
    assert all(r.n_hits >= 0 for r in rows)


def test_top_terms_ordering_and_arity(spark, sf_dir):
    df = run("text_top_terms", spark, sf_dir)
    per_doc = df.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 3 for r in per_doc)
    # within a doc the kept terms' tf must dominate: re-derive rank 1
    top1 = {
        r.doc_id: r.tf
        for r in df.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("tf"), F.asc("df"), F.asc("term")
                )
            ),
        )
        .filter("rk = 1")
        .collect()
    }
    for r in df.collect():
        assert r.tf <= top1[r.doc_id]


def test_repetition_invariants(spark, sf_dir):
    for r in run("text_repetition", spark, sf_dir).collect():
        assert 1 <= r.n_distinct_bigrams <= r.n_bigrams
        assert 1 <= r.top_bigram_n <= r.n_bigrams


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave4 import _bucketed_table

    o = _bucketed_table(spark, "orders", "o_orderkey", sf_dir)
    li = _bucketed_table(spark, "lineitem", "l_orderkey", sf_dir)
    joined = o.hint("merge").join(li, o["o_orderkey"] == li["l_orderkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # the full query only shuffles for the final small aggregation
    full = run("bucketed_join", spark, sf_dir)
    full_plan = full._jdf.queryExecution().executedPlan().toString()
    assert full_plan.count("Exchange") <= 1, full_plan


def test_merge_upsert_branches(spark, sf_dir):
    rows = run("merge_upsert", spark, sf_dir).collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r.op, []).append(r)
    assert "keep" in by_op and set(by_op) <= {"keep", "update", "insert"}
    from map_v2_etl_spark.sources.registry import load_table

    base_keys = {
        r.c_custkey
        for r in load_table(spark, "customer", sf_dir)
        .select("c_custkey")
        .collect()
    }
    # inserts are exactly the merge keys outside the base snapshot
    assert all(r.custkey not in base_keys for r in by_op.get("insert", []))
    assert all(
        r.custkey in base_keys
        for op in ("keep", "update")
        for r in by_op.get(op, [])
    )
    # the demo keying must exercise at least one non-keep branch
    assert by_op.get("update") or by_op.get("insert")
    # every custkey appears exactly once (merge is a keyed upsert)
    keys = [r.custkey for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r.balance is not None for r in rows)


def test_kmeans_matches_numpy_twin(spark, sf_dir):
    import numpy as np

    from map_v2_etl_spark.sources.registry import load_table

    rows = load_table(spark, "embeddings", sf_dir).orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    k, iters = 8, 3
    C = X[:k].copy()
    for _ in range(iters):
        a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
    a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    expect = dict(zip(ids, a.tolist()))
    got = {
        r.vec_id: r.cluster
        for r in run("embedding_kmeans", spark, sf_dir).collect()
    }
    assert got == expect


def test_semdedup_matches_numpy_twin(spark, sf_dir):
    import numpy as np

    from map_v2_etl_spark.sources.registry import load_table

    rows = load_table(spark, "embeddings", sf_dir).orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    asg = {
        r.vec_id: r.cluster
        for r in run("embedding_kmeans", spark, sf_dir).collect()
    }
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    expect = {}
    for j, idb in enumerate(ids):
        dups = [
            ids[i]
            for i in range(j)
            if asg[ids[i]] == asg[idb] and cos[i, j] >= 0.3
        ]
        if dups:
            expect[idb] = (min(dups), len(dups))
    got = {
        r.vec_id: (r.kept_id, r.n_dups)
        for r in run("embedding_semdedup", spark, sf_dir).collect()
    }
    assert got == expect
