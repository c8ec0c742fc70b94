"""Wave-35 tests: k-core decomposition and quantile binning.

Claims pinned:
* kcore_members equals a brute-force python peeling over the same
  SimHash edge set, and satisfies the defining k-core invariants:
  every member's core degree ≥ k, the core is the MAXIMAL such
  subgraph (no peeled vertex keeps ≥ k core neighbors), and peeling
  actually removed something (the fixture exercises real pruning).
* The round-budget tripwire fires loudly on a graph engineered to
  need more rounds than the oracle unrolls (a long chain peels one
  layer per round).
* quantile_binning is equi-depth on the fixture (all 10 buckets within
  2% of n/10), covers every row, and bucket value-ranges tile in
  order (max of bucket i ≤ min of bucket i+1).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_kcore_python_twin_and_invariants(spark):
    from map_v2_etl_spark.operators.dedup import simhash_pairs
    from map_v2_etl_spark.plans.queries_wave35 import _K_CORE

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    edges = [
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, max_hamming=3).collect()
    ]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = {v for v in adj}
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if len(adj[v] & alive) < _K_CORE:
                alive.discard(v)
                changed = True
    want = {v: len(adj[v] & alive) for v in alive}
    got = {
        r["doc_id"]: r["core_degree"]
        for r in REGISTRY["kcore_members"].fn(spark, SF).collect()
    }
    assert got == want
    assert got, "fixture has no 3-core"
    assert len(alive) < len(adj), "peeling removed nothing — inert fixture"
    assert all(d >= _K_CORE for d in got.values())
    for v in set(adj) - alive:  # maximality
        assert len(adj[v] & alive) < _K_CORE


def test_kcore_round_budget_tripwire(spark, monkeypatch):
    """A 20-vertex path graph with k=2 peels exactly one endpoint
    layer per round — convergence needs ~10 rounds, far past the
    6-round oracle unroll; the engine must raise, not silently stop
    early."""
    import pytest

    import map_v2_etl_spark.plans.queries_wave35 as w35

    # drive the same peeling loop body on a hand-built edge frame by
    # monkeypatching the source graph
    chain = [(i, i + 1) for i in range(20)]
    edf = spark.createDataFrame(chain, "id_a long, id_b long")
    monkeypatch.setattr(
        w35, "load_table", lambda spark, name, sf_dir: None
    )
    import map_v2_etl_spark.operators.dedup as D

    monkeypatch.setattr(
        D, "simhash_pairs", lambda docs, max_hamming: edf
    )
    monkeypatch.setattr(w35, "_K_CORE", 2)
    with pytest.raises(RuntimeError, match="did not converge"):
        w35.q_kcore_members.__wrapped__(spark, SF) if hasattr(
            w35.q_kcore_members, "__wrapped__"
        ) else w35.q_kcore_members(spark, SF)


def test_quantile_binning_equidepth_and_tiling(spark):
    rows = sorted(
        REGISTRY["quantile_binning"].fn(spark, SF).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    total = sum(r["n"] for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert total == li.count()
    for r in rows:
        assert abs(r["n"] - total / 10) <= max(2, 0.02 * total)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_price"] <= hi["min_price"]
