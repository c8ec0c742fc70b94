"""Wave-35 surface: k-core decomposition and learned quantile binning.

* kcore_members — the 3-core of the SimHash near-dup graph: vertices
  surviving iterated deletion of everything with degree < 3. The
  graph-pruning complement of triangle_count (same certified edge
  set): dense duplicate CLIQUES survive the peeling, drifting
  near-dup CHAINS dissolve — the standard pre-filter before expensive
  per-cluster survivor selection. k-cores are UNIQUE (the fixpoint of
  a monotone deletion), so the output is deterministic regardless of
  peeling order.

  Certification shape (the bpe_merges precedent for iterative
  algorithms): the engine iterates peeling to the TRUE fixpoint and
  RAISES if convergence takes more rounds than the oracle unrolls;
  the DuckDB oracle unrolls _PEEL_ROUNDS rounds as a CTE chain —
  sound because peeling is monotone (once stable, further rounds are
  identity), so fixpoint-in-≤-N equals the N-round unroll exactly.
  The fixture converges in 2 rounds; 6 are unrolled for headroom.

  Scale: each round is one degree aggregate + two vertex-keyed
  semi-joins over the CURRENT (shrinking) edge set, with
  localCheckpoint truncating the iterative lineage (the
  connected-components discipline). Rounds needed = core number
  spread, typically small; a pathological chain graph peels one layer
  per round — for those, batch-peeling variants exist in the
  literature; the loud round-budget assert names the regime.

* quantile_binning — learned equi-depth binning: decile edges from
  the engine's exact R-7 percentiles (the extents parity class) over
  l_extendedprice, every row bucketed against the learned edges
  (1 + #edges below the value — a higher-order-function fold over the
  broadcast edge array, no CASE-chain codegen blowup), and per-bucket
  occupancy + value range reported. The feature-engineering primitive
  behind GBDT-style binning and equi-depth histograms; the equi-depth
  property itself (buckets within ~1% of each other) is pinned in
  tests.

  Scale: ONE exact-percentile aggregate (sort-based per group — here
  global, the documented cost), then a map-side fold against the
  9-edge broadcast; the bucketing scan carries no shuffle beyond the
  final 10-group aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .queries_ext import _DUCK_SIMHASH_FPS
from .registry import query

# --------------------------------------------------------------------------
# kcore_members
# --------------------------------------------------------------------------

_K_CORE = 3
_PEEL_ROUNDS = 6


def _duck_kcore(k: int, rounds: int) -> str:
    chain = [
        f"""WITH fps AS MATERIALIZED ({_DUCK_SIMHASH_FPS}),
e0 AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b FROM fps a JOIN fps b
  ON a.doc_id < b.doc_id WHERE bit_count(xor(a.fp, b.fp)) <= 3),
s0 AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0)"""
    ]
    for i in range(rounds):
        chain.append(
            f"""v{i + 1} AS MATERIALIZED (
  SELECT a AS v FROM s{i} GROUP BY a HAVING count(*) >= {k}),
s{i + 1} AS MATERIALIZED (
  SELECT s.a, s.b FROM s{i} s
  JOIN v{i + 1} va ON va.v = s.a JOIN v{i + 1} vb ON vb.v = s.b)"""
        )
    return (
        ",\n".join(chain)
        + f"""
SELECT a AS doc_id, CAST(count(*) AS INTEGER) AS core_degree
FROM s{rounds} GROUP BY a"""
    )


@query(
    "kcore_members",
    _duck_kcore(_K_CORE, _PEEL_ROUNDS),
    tags=["graph", "kcore", "dedup", "iterative"],
)
def q_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core members of the SimHash near-dup graph with their
    core-subgraph degree (module docstring)."""
    from ..operators.dedup import simhash_pairs

    docs = load_table(spark, "documents", sf_dir)
    e = simhash_pairs(docs, max_hamming=3).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    cur = sym
    n_edges = cur.count()
    for rnd in range(_PEEL_ROUNDS + 1):
        deg = cur.groupBy("a").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= _K_CORE).select("a")
        nxt = (
            cur.join(keep, "a", "left_semi")
            .join(
                keep.select(F.col("a").alias("b")), "b", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            cur = nxt
            break
        if rnd == _PEEL_ROUNDS:
            # the oracle unrolls _PEEL_ROUNDS rounds; silently
            # stopping earlier than the fixpoint would certify a
            # wrong answer — fail loudly instead (module docstring)
            raise RuntimeError(
                f"kcore_members: peeling did not converge within "
                f"{_PEEL_ROUNDS} rounds ({n_edges} -> {n_next} edges); "
                f"raise _PEEL_ROUNDS (and the oracle unroll) or use a "
                f"batch-peeling variant for this graph"
            )
        cur, n_edges = nxt, n_next
    return cur.groupBy(F.col("a").alias("doc_id")).agg(
        F.count("*").cast("int").alias("core_degree")
    )


# --------------------------------------------------------------------------
# quantile_binning
# --------------------------------------------------------------------------

_DECILES = [i / 10 for i in range(1, 10)]

_DUCK_BINNING = f"""
WITH edges AS (
  SELECT quantile_cont(l_extendedprice,
                       {_DECILES!r}) AS e
  FROM lineitem),
b AS (
  SELECT 1 + len(list_filter(edges.e, x -> l.l_extendedprice > x))
           AS bucket,
         l.l_extendedprice AS p
  FROM lineitem l CROSS JOIN edges)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(p AS DECIMAL(20,4))) AS DOUBLE) AS min_price,
       CAST(max(CAST(p AS DECIMAL(20,4))) AS DOUBLE) AS max_price
FROM b GROUP BY bucket
"""


@query(
    "quantile_binning",
    _DUCK_BINNING,
    tags=["binning", "quantiles", "feature-engineering"],
)
def q_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning against learned percentile edges
    (module docstring)."""
    li = load_table(spark, "lineitem", sf_dir).select("l_extendedprice")
    edges = li.agg(
        F.expr(
            f"percentile(l_extendedprice, array({', '.join(map(str, _DECILES))}))"
        ).alias("e")
    )
    bucket = (
        F.size(
            F.filter(
                F.col("e"), lambda x: F.col("l_extendedprice") > x
            )
        )
        + 1
    )
    return (
        li.crossJoin(F.broadcast(edges))
        .select(
            bucket.cast("int").alias("bucket"),
            F.col("l_extendedprice").cast("decimal(20,4)").alias("p"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("p").cast("double").alias("min_price"),
            F.max("p").cast("double").alias("max_price"),
        )
    )
