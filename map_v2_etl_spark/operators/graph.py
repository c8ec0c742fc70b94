"""Iterative graph algorithms over edge DataFrames (SURVEY.md §2.11
extension; complements dedup.connected_components' min-label/star
algorithms with a weighted-importance one).

PageRank here ranks documents inside a near-duplicate / similarity
graph: high-rank docs are the "canonical centers" of dup neighborhoods
— a principled survivor-selection signal for cluster-level dedup
(pick the highest-rank member instead of the lowest id).

Scale posture: each iteration is one equi-join (ranks → out-edges) and
one hash aggregation keyed on dst — the standard shuffle pair every
distributed PageRank pays (Pregel included). Rank state is one row per
vertex, never collected to the driver; ``localCheckpoint`` truncates
the growing lineage every iteration (the dedup.connected_components
discipline). Convergence is fixed-iteration (10 rounds ≈ 1e-4 L1 at
d = 0.85 on small-diameter dup graphs) — deterministic plan shape, no
driver-side delta polling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


#: below these bounds the whole graph fits one task comfortably and the
#: iterative-join machinery is pure overhead (each round = several
#: near-empty 4-partition stages); the driver holds at most
#: SMALL_GRAPH_EDGES index pairs (~32 MB) for the duration of the solve.
SMALL_GRAPH_NODES = 200_000
SMALL_GRAPH_EDGES = 2_000_000


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
) -> DataFrame:
    """(id, rank) after ``iters`` power iterations.

    ``nodes`` carries every vertex (isolated ones keep the teleport
    rank); ``edges`` is DIRECTED — pass both orientations for an
    undirected similarity graph. Dangling-vertex mass (vertices with no
    out-edges) is redistributed uniformly each round via a one-row
    broadcast aggregate, so total rank mass stays 1 (up to float) and
    the result matches the textbook power-iteration twin exactly.

    Regime switch (the tfidf-dense pattern): graphs under
    ``small_graph_nodes`` vertices AND SMALL_GRAPH_EDGES edges solve as
    one vectorized NumPy power iteration on the driver — identical
    arithmetic, bounded memory by the gates, and none of the ~0.5s/round
    stage overhead the join loop pays on near-empty partitions (measured
    ~5s of the 7s doc_pagerank at sf0.1). Big graphs take the
    distributed join+agg loop below, which is the 100 TB path.
    """
    from pyspark import StorageLevel

    # one materialization of the vertex table serves the size gate, the
    # duplicate check, and the verts/toPandas consumers below (callers
    # often pass a derived frame; without the persist each consumer
    # re-runs the derivation)
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    n_nodes = nodes.count()  # bounded driver scalar, also sizes teleport
    if n_nodes == 0:
        nodes.unpersist()
        return nodes.select(
            F.col(id_col).alias("id"), F.lit(0.0).alias("rank")
        )
    n_uniq = nodes.select(id_col).distinct().count()
    if n_uniq != n_nodes:
        # duplicates silently corrupt BOTH regimes (double-counted
        # teleport/dangling mass distributed; phantom dangling slots +
        # conflicting duplicate output rows locally) — fail loudly
        nodes.unpersist()
        raise ValueError(
            f"pagerank nodes must be unique: {n_nodes} rows, "
            f"{n_uniq} distinct ids"
        )
    if n_nodes <= small_graph_nodes:
        edges_c = edges.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # _pagerank_local consumes the edge list eagerly (toPandas),
            # so the finally-unpersist is safe on BOTH outcomes — the
            # old shape leaked the persisted edges for the session when
            # the node gate passed but the edge gate failed (the same
            # bug fixed in dedup.connected_components)
            if edges_c.count() <= SMALL_GRAPH_EDGES:
                try:
                    return _pagerank_local(
                        nodes, edges_c, id_col, src_col, dst_col,
                        damping, iters, n_nodes,
                    )
                finally:
                    nodes.unpersist()
        finally:
            edges_c.unpersist()
    teleport = (1.0 - damping) / n_nodes

    from .iteration import iteration_partitions

    # partitioning for the iteration state: the session's shuffle
    # parallelism, sized DOWN when the graph is small — a 5k-vertex
    # state over 32 partitions pays 10 rounds of near-empty-task
    # scheduling for nothing (shared policy: operators/iteration.py)
    n_part = iteration_partitions(nodes.sparkSession, n_nodes)
    node_ids = nodes.select(F.col(id_col).alias("id"))
    # SAME edge semantics as the local path: an edge whose endpoint is
    # not a known vertex (or is null) does not exist — it must not
    # count toward out-degree or the non-dangling flag, or rank mass
    # leaks at the verts join and the two regimes diverge on the same
    # graph. Persisted because the deg aggregation AND the out join
    # probe both scan it while building the persisted iteration table.
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .join(node_ids.select(F.col("id").alias("src")), "src", "left_semi")
        .join(node_ids.select(F.col("id").alias("dst")), "dst", "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # load-bearing persist: the edge table (and its degree join) feeds
    # EVERY iteration — without it the upstream edge derivation (e.g.
    # the banded SimHash candidate join in doc_pagerank) re-executes
    # per round (measured 10x the iteration cost at sf0.1).
    # Explicit repartition on src CO-PARTITIONS the persisted edges with
    # the per-iteration ranks⋈edges join key: the edge side's exchange
    # is paid once here, and every iteration shuffles only the
    # vertex-sized ranks (the fixed numPartitions keeps AQE from
    # coalescing the persisted side into a mismatched partitioning).
    out = (
        e.join(deg, "src")
        .select("src", "dst", "deg")
        .repartition(n_part, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # vertex table with a constant is-dangling flag, joined ONCE here and
    # carried through the rank state — the per-iteration dangling mass is
    # then a scalar aggregate over ranks (no left_anti join per round).
    # deg's src is already unique (groupBy output) — no distinct needed.
    has_out = deg.select(F.col("src").alias("id"))
    verts = (
        node_ids
        .join(has_out.withColumn("_ho", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("_ho").isNull(), 1.0).otherwise(0.0).alias("dang"),
        )
        .repartition(n_part, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = verts.select("id", "dang", F.lit(1.0 / n_nodes).alias("rank"))
    for it in range(iters):
        contribs = (
            ranks.join(out, ranks["id"] == out["src"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = ranks.agg(
            F.coalesce(F.sum(F.col("rank") * F.col("dang")), F.lit(0.0))
            .alias("dm")
        )
        ranks = (
            verts.join(contribs, verts["id"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "dang",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dm") / n_nodes
                    )
                ).alias("rank"),
            )
            # eager: ranks is referenced twice per iteration (contribs,
            # dangling mass); a lazy checkpoint would let the plan
            # re-expand 2^iters ways before the final action. (Tried:
            # checkpoint-every-2 — ReuseExchange does NOT dedupe the
            # repeated subplan across the broadcast boundary; measured
            # slower.)
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    out.unpersist()
    verts.unpersist()
    nodes.unpersist()
    return ranks.select("id", "rank")


def _pagerank_local(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    damping: float,
    iters: int,
    n_nodes: int,
) -> DataFrame:
    """Single-task NumPy power iteration for gate-bounded graphs —
    the same arithmetic as the distributed loop (teleport +
    d*(inflow + dangling/n), contributions rank/out-degree), so the
    textbook-twin parity tests hold on either path."""
    import numpy as np

    # Arrow toPandas, not collect(): the gate admits up to 2M edge rows,
    # and columnar transfer + a C-speed Series.map is ~5x the row-object
    # path at that size. ids are SORTED so index order == id order —
    # every float accumulation below is then a DETERMINISTIC fold in id
    # order, a pure function of the graph rather than of arrival order
    # (and therefore replicable bit-for-bit by the DuckDB oracle).
    ids = sorted(
        nodes.select(F.col(id_col).alias("id")).toPandas()["id"].tolist()
    )
    idx = {v: i for i, v in enumerate(ids)}
    e_pdf = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    ).toPandas()
    si = e_pdf["s"].map(idx)
    ti = e_pdf["t"].map(idx)
    keep = si.notna() & ti.notna()  # match the join semantics
    n = n_nodes
    s = si[keep].to_numpy(dtype=np.int64)
    t = ti[keep].to_numpy(dtype=np.int64)
    # sort edges by (target, source): np.add.at applies its updates
    # sequentially in array order (unbuffered; pinned by
    # tests/test_wave8.py::test_np_add_at_is_sequential_fold), so each
    # inflow[v] becomes a left fold over v's contributions in ascending
    # src order
    if len(s):
        order = np.lexsort((s, t))
        s, t = s[order], t[order]
    deg = np.zeros(n)
    if len(s):
        np.add.at(deg, s, 1.0)
    dang_ix = np.flatnonzero(deg == 0)  # ascending id order
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        if len(s):
            np.add.at(inflow, t, r[s] / deg[s])
        # dangling mass: the same sequential-fold trick into ONE cell,
        # id-ascending — never a pairwise .sum()
        acc = np.zeros(1)
        if len(dang_ix):
            np.add.at(
                acc, np.zeros(len(dang_ix), dtype=np.int64), r[dang_ix]
            )
        dm = float(acc[0])
        r = (1.0 - damping) / n + damping * (inflow + dm / n)
    spark = nodes.sparkSession
    return spark.createDataFrame(
        [(v, float(x)) for v, x in zip(ids, r)],
        nodes.select(F.col(id_col).alias("id")).schema.add(
            "rank", "double", False
        ),
    )


#: dense-regime gates for triangle_counts: the adjacency matrix is
#: n x n float64 (8000² = 512 MB ceiling) and the edge list transfers
#: once via Arrow — past either bound the distributed compact-forward
#: join below is the only path that runs.
DENSE_TRI_NODES = 8_000
DENSE_TRI_EDGES = 2_000_000


def triangle_counts(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    dense_max_nodes: int = DENSE_TRI_NODES,
    dense_max_edges: int = DENSE_TRI_EDGES,
) -> DataFrame:
    """(id, n_triangles) per vertex over an UNDIRECTED edge list given
    once per pair (a < b); vertices in no triangle are omitted.

    Extracted from the triangle_count query (r7) so the DISTRIBUTED
    regime is callable on synthetic above-gate graphs by bench_scale.py
    — before that the 100 TB path existed only inline behind the dense
    gate and had never been timed.

    Scale: DEGREE-ORDERED orientation (compact-forward — Latapy 2008,
    public literature): every edge points from its lower-(degree, id)
    endpoint to the higher, wedges form only at each edge's LOW-degree
    end, and a triangle is enumerated exactly once at its lowest-ranked
    vertex. Wedge volume drops from Σ deg² to Σ out-deg² (≤ √(2m)
    out-degree bound on skewed graphs). Both joins are vertex-keyed
    equi-joins; the degree table is vertex-sized and broadcast.

    Dense regime (the tfidf/pagerank pattern): a graph under the gates
    counts fastest as ONE adjacency matmul — per-vertex triangles =
    row-sums of (A·A)∘A / 2, BLAS instead of the wedge join. Identical
    counts either side of the gate (integer arithmetic both ways).
    """
    from pyspark import StorageLevel

    e = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = e.count()
    if n_edges <= dense_max_edges:
        # vertex universe = edge endpoints (an isolated vertex has no
        # triangles and the output omits zero rows anyway); sorted so
        # the matrix index order is a pure function of the graph
        ids = sorted(
            e.select(F.col("a").alias("v"))
            .union(e.select(F.col("b").alias("v")))
            .distinct()
            .toPandas()["v"]
            .tolist()
        )
        if len(ids) <= dense_max_nodes:
            import numpy as np

            idx = {v: i for i, v in enumerate(ids)}
            n = len(ids)
            A = np.zeros((n, n), dtype=np.float64)
            # Arrow toPandas + fancy indexing: columnar transfer of the
            # (≤2M-row) edge list beats row-object collect ~5x
            e_pdf = e.toPandas()
            ii = e_pdf["a"].map(idx).to_numpy(dtype=np.int64)
            jj = e_pdf["b"].map(idx).to_numpy(dtype=np.int64)
            A[ii, jj] = 1.0
            A[jj, ii] = 1.0
            e.unpersist()
            tri = ((A @ A) * A).sum(axis=1) / 2.0
            spark = edges.sparkSession
            rows = [(v, int(t)) for v, t in zip(ids, tri) if t > 0]
            schema = (
                e.select(F.col("a").alias("id")).schema
                .add("n_triangles", "long", False)
            )
            return spark.createDataFrame(rows, schema)
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("d"))
    # orient: lower (degree, id) -> higher; broadcast the vertex-degree
    # table onto both endpoints (vertex-sized, not edge-sized)
    da = deg.select(F.col("a"), F.col("d").alias("da"))
    db = deg.select(F.col("a").alias("b"), F.col("d").alias("db"))
    keyed = e.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        # dst's (degree, id) rank rides along for the wedge ordering
        F.when(a_first, F.struct("db", "b")).otherwise(
            F.struct(F.col("da").alias("db"), F.col("a").alias("b"))
        ).alias("dr"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    o1 = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("y"),
        F.col("dr").alias("ry"),
    )
    o2 = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("z"),
        F.col("dr").alias("rz"),
    )
    # wedge (y, z) ordered by rank so each pair forms once; close with
    # the oriented edge low-rank -> high-rank
    wedges = o1.join(o2, "x").filter(F.col("ry") < F.col("rz")).select(
        "x", "y", "z"
    )
    closing = oriented.select(
        F.col("src").alias("y"), F.col("dst").alias("z")
    )
    tri = wedges.join(closing, ["y", "z"])
    pv = (
        tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("n"))
    )
    return pv.select(
        F.col("v").alias("id"), F.col("n").alias("n_triangles")
    )
