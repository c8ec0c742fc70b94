"""Wave-15: graph analytics + function breadth."""

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_triangle_counts_on_known_graph(spark):
    """4-clique + pendant vertex: clique members sit in C(3,2)=3
    triangles each, the pendant in none."""
    import map_v2_etl_spark.operators.dedup as D

    # build the count directly from an edge list through the same joins
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        ["a", "b"],
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    assert tri.count() == 4  # C(4,3) triangles in the clique
    out = REGISTRY["triangle_count"].fn(spark, SF)
    assert out.filter(F.col("n_triangles") <= 0).count() == 0


def test_triangle_counts_regimes_agree(spark):
    """The dense adjacency-matmul regime and the distributed
    compact-forward join must produce IDENTICAL counts — the gate is a
    performance switch, never a semantics switch (the contract
    bench_scale.py leans on when it times the distributed path on
    synthetic above-gate graphs)."""
    from map_v2_etl_spark.operators.graph import triangle_counts

    # two overlapping cliques {1..4} and {4..7} plus a pendant: vertex 4
    # sits in both cliques' triangles
    edges = [
        (a, b)
        for clique in ([1, 2, 3, 4], [4, 5, 6, 7])
        for i, a in enumerate(clique)
        for b in clique[i + 1:]
    ] + [(7, 8)]
    e = spark.createDataFrame(sorted(set(edges)), ["a", "b"])
    dense = {
        (r["id"], r["n_triangles"])
        for r in triangle_counts(e).collect()
    }
    dist = {
        (r["id"], r["n_triangles"])
        for r in triangle_counts(e, dense_max_edges=0).collect()
    }
    assert dense == dist
    assert (1, 3) in dense and (4, 6) in dense and 8 not in dict(dense)


def test_bfs_levels_monotone_and_rooted(spark):
    rows = REGISTRY["bfs_levels"].fn(spark, SF).collect()
    assert rows
    lv = {r["doc_id"]: r["level"] for r in rows}
    root = min(lv, key=lambda d: lv[d])
    assert lv[root] == 0
    # levels form a contiguous range from 0
    assert sorted(set(lv.values())) == list(range(max(lv.values()) + 1))


def test_window_funcs_full_invariants(spark):
    rows = REGISTRY["window_funcs_full"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["tile4"] <= 4
        assert 0.0 <= r["pct_rank"] <= 1.0
        assert 0.0 < r["cume"] <= 1.0


def test_null_safety_try_divide_no_error(spark):
    rows = REGISTRY["null_safety_funcs"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r["l_linenumber"] == 1:
            assert r["line_or_null"] is None
            assert r["nvl_line"] == -1
            assert r["nvl2_line"] == 20
            assert r["is_line1"] is True


def test_bfs_fast_path_edgeless_matches_oracle_shape(spark, tmp_path):
    """An edgeless corpus must yield the iterative path's (NULL, 0) seed
    row, not an empty frame (fast-path parity, code-review regression)."""
    import os

    import map_v2_etl_spark.plans.queries_wave15 as w15

    d = str(tmp_path)
    # three wildly different docs -> no simhash pair within hamming 3
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s", 30),
            (2, "one two three four five six seven", "en", "s", 30),
            (3, "red green blue yellow purple orange", "en", "s", 30),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = w15.q_bfs_levels(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] is None and rows[0]["level"] == 0


def test_pagerank_foreign_endpoints_same_on_both_regimes(spark):
    """Edges to ids outside `nodes` must not exist on EITHER path: they
    previously counted toward out-degree and the non-dangling flag in
    the distributed loop (leaking rank mass) while the local path
    filtered them — same graph, different ranks across the gate."""
    from map_v2_etl_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(0,), (1,)], "id LONG")
    edges = spark.createDataFrame(
        [(0, 1), (0, 99)], "src LONG, dst LONG"  # 99 is foreign
    )
    local = {
        r["id"]: r["rank"]
        for r in pagerank(nodes, edges, iters=3).collect()
    }
    dist = {
        r["id"]: r["rank"]
        for r in pagerank(
            nodes, edges, iters=3, small_graph_nodes=0
        ).collect()
    }
    assert local == dist
    # mass conservation holds (docstring invariant)
    assert abs(sum(dist.values()) - 1.0) < 1e-9


def test_pagerank_duplicate_nodes_raise(spark):
    import pytest

    from map_v2_etl_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(1,), (1,), (2,)], "id LONG")
    edges = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    with pytest.raises(ValueError, match="must be unique"):
        pagerank(nodes, edges, iters=1)
