"""Wave-13 surface: Spark-4-native SQL features exercised as first-class
registry queries — the API-completeness story for users migrating modern
SQL workloads onto this engine.

* containment_closure — transitive closure over the (acyclic, id-ordered)
  containment-pair graph via WITH RECURSIVE in Spark SQL itself
  (Spark 4.0 recursive CTE, UNION ALL semantics — which is exactly why
  the DAG formulation is the right recursive showcase: cyclic
  undirected closure needs the fixpoint dedup of the iterative
  min-label operator in operators/dedup.py, and Spark's recursive CTE
  only speaks UNION ALL).
* events_props_variant — the semi-structured path done the Spark-4 way:
  props parsed ONCE into a VARIANT column (binary-encoded, typed access
  without re-parsing), fields extracted with variant_get, aggregated.
* pipe_syntax_topk — a query authored in Spark 4 SQL pipe syntax
  (FROM ... |> WHERE |> AGGREGATE |> ORDER BY), proving the surface
  end-to-end; the oracle is the equivalent ANSI statement.

Scale notes: recursive CTE executes as iterative plans (same shuffle
pair per round as the hand-written loop — use the operator variant when
you need localCheckpoint lineage control on deep graphs); VARIANT
parses each props string once and the binary value prunes like any
other column; pipe syntax is pure front-end sugar — the optimized plan
is identical to the ANSI formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import REGISTRY, query

from .queries_wave12 import _DUCK_CONTAIN

_DUCK_CLOSURE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_DUCK_CONTAIN})),
reach(src, dst, hops) AS (
  SELECT id_a, id_b, 1 FROM pairs
  UNION ALL
  SELECT r.src, p.id_b, r.hops + 1
  FROM reach r JOIN pairs p ON p.id_a = r.dst)
SELECT src AS id_a, dst AS id_b, CAST(MIN(hops) AS BIGINT) AS min_hops
FROM reach GROUP BY src, dst
"""


@query(
    "containment_closure",
    _DUCK_CLOSURE,
    tags=["graph", "closure", "recursive-cte", "spark4"],
)
def q_containment_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the 8-gram containment DAG (edges always go
    low id -> high id, so UNION ALL recursion terminates — no cycles by
    construction) with minimum hop counts: A contained in B contained
    in C surfaces (A, C, 2) even when A-C's direct overlap is diluted.
    One declarative Spark 4 WITH RECURSIVE statement; DuckDB runs the
    textually identical recursion.

    Scale: recursion depth = longest containment chain (shallow in real
    corpora); each level is one equi-join + the final group-by dedups
    paths. For deep/high-fanout graphs the iterative operator with
    localCheckpoint (operators/dedup.connected_components discipline)
    is the fallback — the CTE re-derives lineage per level."""
    pairs = REGISTRY["ngram_containment"].fn(spark, sf_dir).select(
        "id_a", "id_b"
    )
    # MATERIALIZE before the recursion: a temp view is a logical plan,
    # and the recursive CTE would otherwise re-execute the shingle
    # self-join at every level (anchor + each step)
    pairs = pairs.localCheckpoint(eager=True)
    pairs.createOrReplaceTempView("w13_pairs")
    return spark.sql(
        """
        WITH RECURSIVE reach(src, dst, hops) AS (
          SELECT id_a, id_b, 1 FROM w13_pairs
          UNION ALL
          SELECT r.src, p.id_b, r.hops + 1
          FROM reach r JOIN w13_pairs p ON p.id_a = r.dst
        )
        SELECT src AS id_a, dst AS id_b,
               CAST(MIN(hops) AS BIGINT) AS min_hops
        FROM reach GROUP BY src, dst
        """
    )


@query(
    "events_props_variant",
    "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min, "
    "CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max "
    "FROM events GROUP BY 1",
    tags=["scalar", "json", "variant", "spark4"],
)
def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4 VARIANT: props parses
    once into the binary variant encoding, variant_get does typed
    access (no per-access JSON re-parse, unlike get_json_object), then
    a plain hash aggregate. The 100 TB shape for JSON-heavy event
    tables: parse at ingest, store variant, prune + push down like any
    typed column."""
    ev = load_table(spark, "events", sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )


@query(
    "pipe_syntax_topk",
    "SELECT l_returnflag, "
    "CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS total_qty "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' "
    "GROUP BY l_returnflag",
    tags=["sql", "pipe-syntax", "spark4"],
)
def q_pipe_syntax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same filtered aggregate authored in Spark 4 SQL PIPE syntax —
    front-end parity proof: the optimizer sees the identical logical
    plan as the ANSI oracle text (filter pushdown + partial agg both
    apply)."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView(
        "w13_lineitem"
    )
    return spark.sql(
        """
        FROM w13_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
                       AS total_qty
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n_rows, total_qty
        """
    )
