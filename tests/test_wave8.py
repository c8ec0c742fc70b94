"""Wave-8 semantics: PageRank NumPy-twin parity and curation-pipeline
gate logic (oracle parity at sf0.01 is the driver gate)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators.graph import pagerank


def _np_pagerank(n, edge_list, d=0.85, iters=10):
    deg = np.zeros(n)
    for s, _ in edge_list:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, t in edge_list:
            inflow[t] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (inflow + dangling / n)
    return r


@pytest.mark.parametrize(
    "edge_list,n",
    [
        # chain with a dangling tail and an isolated vertex
        ([(0, 1), (1, 2), (2, 3)], 5),
        # undirected triangle plus a satellite
        (
            [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (3, 0)],
            4,
        ),
    ],
)
@pytest.mark.parametrize("small_gate", [0, 10**6])
def test_pagerank_matches_numpy_twin(spark, edge_list, n, small_gate):
    # small_gate=0 forces the distributed join loop; 10**6 the NumPy
    # local path — both must match the textbook twin
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["id"]: r["rank"]
        for r in pagerank(
            nodes, edges, iters=10, small_graph_nodes=small_gate
        ).collect()
    }
    want = _np_pagerank(n, edge_list)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    # mass conservation (dangling redistribution keeps Σrank = 1)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_two_paths_fuzz_equivalence(spark):
    """Randomized equivalence net over BOTH pagerank paths (driver
    NumPy power iteration and the distributed join+agg loop) against
    the textbook twin, on adversarial shapes: dangling vertices,
    isolated vertices, self-loops, dense hubs. Same discipline as the
    r12 BPE selection fuzzer, which found holes every example-based
    test had missed."""
    import random

    rng = random.Random(21)
    for trial in range(4):
        n = rng.randint(2, 12)
        edge_set = set()
        for _ in range(rng.randint(0, 3 * n)):
            s, t = rng.randrange(n), rng.randrange(n)
            if s != t or rng.random() < 0.3:  # keep some self-loops
                edge_set.add((s, t))
        edge_list = sorted(edge_set)
        if not edge_list:
            edge_list = [(0, min(1, n - 1))]
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(edge_list, ["src", "dst"])
        want = _np_pagerank(n, edge_list, iters=8)
        for label, gate in (("local", 10**6), ("distributed", 0)):
            got = {
                r["id"]: r["rank"]
                for r in pagerank(
                    nodes, edges, iters=8, small_graph_nodes=gate
                ).collect()
            }
            assert set(got) == set(range(n))
            for i in range(n):
                assert got[i] == pytest.approx(want[i], abs=1e-10), (
                    f"trial {trial} path={label} vertex {i}: "
                    f"edges={edge_list}\n got={got}\n want={list(want)}"
                )
            assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_doc_pagerank_ranks_dup_centers_higher(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave8 import q_doc_pagerank

    ranks = {r["id"]: r["rank"] for r in q_doc_pagerank(spark, sf_dir).collect()}
    docs_n = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(ranks) == docs_n
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    # docs inside near-dup neighborhoods outrank isolated docs
    from map_v2_etl_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = simhash_pairs(docs, max_hamming=3)
    linked = {
        r["id_a"] for r in pairs.collect()
    } | {r["id_b"] for r in pairs.collect()}
    if linked and len(linked) < docs_n:
        isolated_rank = max(
            v for k, v in ranks.items() if k not in linked
        )
        assert max(v for k, v in ranks.items() if k in linked) > isolated_rank


def test_curation_pipeline_gate_consistency(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave8 import q_curation_pipeline

    rows = q_curation_pipeline(spark, sf_dir).collect()
    assert rows
    for r in rows:
        flags = (
            r["keep_quality"],
            r["keep_dup"],
            r["keep_lm"],
            r["keep_domain"],
        )
        assert all(f in (0, 1) for f in flags)
        assert r["keep"] == int(all(f == 1 for f in flags))


def test_np_add_at_is_sequential_fold():
    """_pagerank_local's determinism rests on np.add.at applying its
    updates SEQUENTIALLY in array order (unbuffered). Pin that with
    magnitudes spanning 40 orders: any pairwise/reordered accumulation
    diverges from the Python left fold with overwhelming probability."""
    import random

    import numpy as np

    rng = random.Random(11)
    vals = np.array(
        [rng.uniform(-1, 1) * 10 ** rng.randint(-20, 20) for _ in range(5000)]
    )
    idx = np.array([rng.randrange(7) for _ in range(5000)])
    acc = np.zeros(7)
    np.add.at(acc, idx, vals)
    ref = [0.0] * 7
    for i, v in zip(idx, vals):
        ref[i] += float(v)
    assert acc.tolist() == ref
