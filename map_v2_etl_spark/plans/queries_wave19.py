"""Wave-19 surface: sketch-based top-k + positional fingerprints
(SURVEY.md §2.11 breadth).

* approx_topk_returnflag — Spark 4's ``approx_top_k`` frequent-items
  sketch over lineitem.l_returnflag, exploded to (item, cnt) rows.
* winnow_fingerprints  — Winnowing/MOSS positional document
  fingerprints (rightmost minimal k-gram hash per w-window), all-integer
  and value-hash certified against a window-function DuckDB twin.

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


# --------------------------------------------------------------------------
# winnow_fingerprints
# --------------------------------------------------------------------------

# the ONE canonical tokenizer's oracle fragment (wave12's shared copy of
# the queries_ext tokenizer: full-whitespace strip + empty filter)
from .queries_wave12 import _DUCK_TOKS_F  # noqa: E402

from ..operators.text import (  # noqa: E402
    WINNOW_HASH_HEX as _HASH_HEX,
    WINNOW_POS_W as _POS,
)

_WINNOW_K = 4
_WINNOW_W = 5
_WINNOW_MIN_SHARED = 2


def _winnow_selection_ctes(k: int = _WINNOW_K, w: int = _WINNOW_W) -> str:
    """The ONE DuckDB copy of the winnowing selection chain (tokens ->
    k-gram md5 hashes -> packed keys -> per-window rightmost-min ->
    valid full windows), parameterized exactly like
    operators/text.winnow_selected. Both winnow oracles build on it, so
    the algorithm exists once per engine and the gram arity can never
    drift from the generate_series bound."""
    gram = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(k))
    return f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS_F} AS w FROM documents),
g AS (
  SELECT doc_id,
         unnest([{{'pos': i,
                   'h': CAST(('0x' || substr(md5({gram}), 1, {_HASH_HEX}))
                             AS BIGINT)}}
                 for i in generate_series(1, len(w) - {k - 1})]) AS u
  FROM t),
kk AS (
  -- guard mirrors operators/text.winnow_selected's raise_error: a
  -- document with >= 2^23 grams must fail LOUDLY in both engines, not
  -- silently pack a negative position field into a corrupted key
  SELECT doc_id, u.pos AS pos,
         u.h * {_POS} + ({_POS - 1} -
           CASE WHEN u.pos >= {_POS}
                THEN CAST(error('winnow oracle: document exceeds '
                                || '{_POS - 1} grams — widen the pack')
                          AS BIGINT)
                ELSE u.pos END) AS key
  FROM g),
m AS (
  SELECT doc_id, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS mk,
         max(pos) OVER (PARTITION BY doc_id) AS ng
  FROM kk),
sel AS (
  SELECT DISTINCT doc_id, ng, mk FROM m
  WHERE pos <= greatest(ng - {w - 1}, 1))"""


_DUCK_WINNOW = f"""
{_winnow_selection_ctes()},
fp AS (
  SELECT doc_id,
         CAST(max(ng) AS BIGINT) AS n_grams,
         CAST(count(*) AS BIGINT) AS n_fp,
         CAST(sum(mk // {_POS}) AS BIGINT) AS fp_sum,
         CAST(min(mk // {_POS}) AS BIGINT) AS fp_min,
         CAST(max(mk // {_POS}) AS BIGINT) AS fp_max
  FROM sel GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(fp.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(fp.n_fp, 0) AS BIGINT) AS n_fp,
       fp.fp_sum, fp.fp_min, fp.fp_max
FROM documents d LEFT JOIN fp USING (doc_id)
"""

_DUCK_WINNOW_PAIRS = f"""
{_winnow_selection_ctes()},
fph AS (
  SELECT DISTINCT doc_id, mk // {_POS} AS h FROM sel),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM fph GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM fph a JOIN fph b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {_WINNOW_MIN_SHARED})
SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
       round(n_shared / least(sa.n_fp, sb.n_fp), 6) AS overlap
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
"""


@query(
    "winnow_fingerprints",
    _DUCK_WINNOW,
    tags=["text", "dedup", "fingerprint", "winnowing"],
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint summary per document — rightmost
    minimal 4-gram hash per 5-gram window; see
    operators/text.winnow_fingerprints for the algorithm and the
    integer-key tie-rule construction both engines share. All-integer
    output: fully value-hash certified."""
    from ..operators.text import winnow_fingerprints

    docs = load_table(spark, "documents", sf_dir)
    return winnow_fingerprints(docs, k=_WINNOW_K, w=_WINNOW_W)


@query(
    "winnow_pairs",
    _DUCK_WINNOW_PAIRS,
    tags=["text", "dedup", "fingerprint", "winnowing", "pairs"],
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS match detection: document pairs sharing >= 2 distinct
    winnowing fingerprint hashes, with the containment-style overlap
    ratio against the smaller fingerprint set. Bucket equi-join on the
    selected hashes — the sum-of-bucket-sizes² shape, never all-pairs
    (see operators/text.winnow_pairs)."""
    from ..operators.text import winnow_pairs

    docs = load_table(spark, "documents", sf_dir)
    return winnow_pairs(
        docs, min_shared=_WINNOW_MIN_SHARED, k=_WINNOW_K, w=_WINNOW_W
    )
