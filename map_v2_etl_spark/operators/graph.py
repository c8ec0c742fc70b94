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


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """(id, rank) after ``iters`` power iterations.

    ``nodes`` carries every vertex (isolated ones keep the teleport
    rank); ``edges`` is DIRECTED — pass both orientations for an
    undirected similarity graph. Dangling-vertex mass (vertices with no
    out-edges) is redistributed uniformly each round via a one-row
    broadcast aggregate, so total rank mass stays 1 (up to float) and
    the result matches the textbook power-iteration twin exactly.
    """
    from pyspark import StorageLevel

    n_nodes = nodes.count()  # bounded driver scalar, also sizes teleport
    if n_nodes == 0:
        return nodes.select(
            F.col(id_col).alias("id"), F.lit(0.0).alias("rank")
        )
    teleport = (1.0 - damping) / n_nodes

    from .iteration import iteration_partitions

    # partitioning for the iteration state: the session's shuffle
    # parallelism, sized DOWN when the graph is small — a 5k-vertex
    # state over 32 partitions pays 10 rounds of near-empty-task
    # scheduling for nothing (shared policy: operators/iteration.py)
    n_part = iteration_partitions(nodes.sparkSession, n_nodes)
    deg = edges.groupBy(src_col).agg(F.count("*").alias("deg"))
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
        edges.join(deg, src_col)
        .select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), "deg"
        )
        .repartition(n_part, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # vertex table with a constant is-dangling flag, joined ONCE here and
    # carried through the rank state — the per-iteration dangling mass is
    # then a scalar aggregate over ranks (no left_anti join per round)
    has_out = deg.select(F.col(src_col).alias("id")).distinct()
    verts = (
        nodes.select(F.col(id_col).alias("id"))
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
    out.unpersist()
    verts.unpersist()
    return ranks.select("id", "rank")
