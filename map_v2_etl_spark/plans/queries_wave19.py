"""Wave-19 surface: sketch-based top-k (SURVEY.md §2.11 breadth).

* approx_topk_returnflag — Spark 4's ``approx_top_k`` frequent-items
  sketch over lineitem.l_returnflag, exploded to (item, cnt) rows.

The r4 verdict's other optional item — a ``bloom_filter_agg`` variant
of decontaminate_bloom — is NOT buildable on this Spark: the function
exists in the optimizer (runtime bloom join filters) but is not
registered in the public FunctionRegistry here (UNRESOLVED_ROUTINE),
so the engine keeps its own exact-bitmap bloom (queries_wave12), which
is driver-certified and has the same no-false-negative contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# approx_topk_returnflag
# --------------------------------------------------------------------------

_DUCK_TOPK = """
SELECT l_returnflag AS item, CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem GROUP BY 1
"""


@query(
    "approx_topk_returnflag",
    _DUCK_TOPK,
    tags=["agg", "approx", "sketch", "topk"],
)
def q_approx_topk_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items top-k via Spark 4's ``approx_top_k`` sketch,
    exploded to (item, cnt) rows.

    Exactness contract: a frequent-items sketch whose capacity
    (maxItemsTracked=16) exceeds the column's distinct count (3 TPC-H
    return flags) degrades to EXACT counts and is merge-order-invariant,
    so the result value-hashes against a plain GROUP BY oracle. At
    100 TB the same one-line query answers "top sources / langs /
    domains" in a single map-side-combined pass with a few-KB sketch
    per partition instead of a full-width groupBy shuffle — you give up
    exactness only when NDV exceeds the tracked capacity, which is the
    sketch's documented trade. k is set to NDV here so no tie at the
    k-boundary can make the kept set engine-dependent."""
    li = load_table(spark, "lineitem", sf_dir)
    sk = li.select(
        F.expr("approx_top_k(l_returnflag, 3, 16)").alias("tk")
    )
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").cast("long").alias("cnt"),
    )
