"""Wave-15 surface: graph analytics on the near-dup graph + scalar /
window function breadth (SURVEY.md §2.5, §2.8, §2.11).

* triangle_count  — per-vertex triangle participation over the SimHash
                    near-dup graph: the clustering-coefficient numerator
                    that separates tight dup CLIQUES from chains of
                    borderline pairs.
* bfs_levels      — hop distance from the lowest-id EDGED vertex through
                    the UNDIRECTED near-dup graph: iterative frontier
                    expansion in Spark, recursive CTE (UNION fixpoint)
                    in DuckDB — the iterative-operator vs
                    declarative-recursion parity pair.
* window_funcs_full — the remaining ranking/analytic window functions in
                    one query (ntile, percent_rank, cume_dist, lag/lead
                    with defaults, first/last over an explicit frame).
* string_funcs3   — regexp_extract_all / levenshtein / initcap /
                    translate / repeat / reverse breadth.
* date_funcs2     — trunc variants, calendar-month distance, add_months,
                    weekofyear / dayofyear / quarter.
* null_safety_funcs — nullif/nvl/nvl2 + ANSI try_divide and null-safe
                    equality (<=>).
* hof_map_funcs   — map aggregation + higher-order access
                    (map_from_entries, map_keys/values, aggregate,
                    filter) over per-order line→quantity maps.

All hash-checked against DuckDB (functions expressed via portable
equivalents where DuckDB spells them differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# triangle_count
# --------------------------------------------------------------------------

# ordered-edge triangle join over hamming<=3 simhash pairs; the fps CTE is
# the verified oracle body from queries_ext
from .queries_ext import _DUCK_SIMHASH_FPS

_DUCK_TRIANGLES = f"""
WITH fps AS ({_DUCK_SIMHASH_FPS}),
e AS (SELECT a.doc_id AS a, b.doc_id AS b
      FROM fps a JOIN fps b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
pv AS (
  SELECT v, count(*) AS n FROM (
    SELECT x AS v FROM tri UNION ALL
    SELECT y AS v FROM tri UNION ALL
    SELECT z AS v FROM tri) GROUP BY v)
SELECT CAST(v AS BIGINT) AS doc_id, CAST(n AS BIGINT) AS n_triangles
FROM pv
"""


@query("triangle_count", _DUCK_TRIANGLES, tags=["graph", "triangles", "dedup"])
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the SimHash near-dup graph via the
    ordered-edge join (a<b<c once per triangle): the clustering-
    coefficient numerator — tight duplicate CLIQUES triangle heavily,
    chains of borderline pairs don't, so this score separates "true dup
    group" from "drifting near-dup chain" before survivor selection.

    Scale: DEGREE-ORDERED orientation (the compact-forward algorithm —
    Latapy 2008, public literature): every edge points from its
    lower-(degree, id) endpoint to the higher, wedges form only at each
    edge's LOW-degree end, and a triangle is enumerated exactly once at
    its lowest-ranked vertex. Wedge volume drops from Σ deg² to
    Σ out-deg² — on skewed graphs that is the √(2m) out-degree bound;
    on this near-CLIQUE dup graph it is the ~3x clique factor
    (measured 11.3s → 7.0s at sf0.1, identical counts — dense cluster
    graphs are the algorithm's worst case and the remaining cost is
    genuine wedge volume). Both joins stay vertex-keyed equi-joins.

    r7: counting body extracted to operators.graph.triangle_counts so
    bench_scale.py can time the distributed regime on above-gate
    synthetic graphs; the dense-gate vertex universe is now the edge
    ENDPOINT set (isolated docs never appear in the t>0 output, so
    results are identical)."""
    from ..operators.dedup import simhash_pairs
    from ..operators.graph import triangle_counts

    docs = load_table(spark, "documents", sf_dir)
    e = simhash_pairs(docs, max_hamming=3).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    return triangle_counts(e).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


# --------------------------------------------------------------------------
# bfs_levels
# --------------------------------------------------------------------------

_DUCK_BFS = f"""
WITH RECURSIVE fps AS ({_DUCK_SIMHASH_FPS}),
e AS (SELECT a.doc_id AS a, b.doc_id AS b
      FROM fps a JOIN fps b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3),
sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
src AS (SELECT min(a) AS s FROM sym),
reach(id, lvl) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT sym.b, r.lvl + 1 FROM reach r JOIN sym ON sym.a = r.id
  WHERE r.lvl < 20
)
SELECT CAST(id AS BIGINT) AS doc_id,
       CAST(min(lvl) AS BIGINT) AS level
FROM reach GROUP BY id
"""


@query("bfs_levels", _DUCK_BFS, tags=["graph", "bfs", "iterative"])
def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from the lowest-id vertex that has an edge, through
    the UNDIRECTED near-dup graph (min level per reached vertex,
    frontier capped at 20 hops). Spark runs the iterative frontier expansion (the
    connected-components discipline: join + min-agg + localCheckpoint
    per round, early exit when the frontier empties); DuckDB's oracle is
    the declarative fixpoint (recursive CTE with UNION dedup — the
    construct Spark's UNION-ALL-only recursion cannot express, which is
    exactly why the iterative operator exists)."""
    from pyspark import StorageLevel

    from ..operators.dedup import simhash_pairs

    docs = load_table(spark, "documents", sf_dir)
    e = simhash_pairs(docs, max_hamming=3).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # gate-bounded driver fast path (the pagerank/triangle/CC pattern):
    # a ≤2M-edge graph BFSes in one Arrow transfer + a python deque walk;
    # the iterative join loop below pays ~0.3s/round of near-empty-stage
    # scheduling for the same result and remains the 100 TB path
    if e.count() <= 2_000_000:
        from collections import deque

        e_pdf = e.toPandas()
        e.unpersist()
        adj: dict = {}
        for a, b in zip(e_pdf["a"].tolist(), e_pdf["b"].tolist()):
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        if not adj:
            # edgeless graph: mirror the iterative path (and the
            # recursive-CTE oracle), whose min() over the empty edge
            # set yields one (NULL, 0) seed row
            return spark.createDataFrame(
                [(None, 0)], "doc_id long, level long"
            )
        src0 = min(adj)
        lvl = {src0: 0}
        dq = deque([src0])
        while dq:
            u = dq.popleft()
            if lvl[u] >= 20:
                continue
            for v in adj[u]:
                if v not in lvl:
                    lvl[v] = lvl[u] + 1
                    dq.append(v)
        return spark.createDataFrame(
            [(int(k), int(v)) for k, v in lvl.items()],
            "doc_id long, level long",
        )
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    # source = lowest-id vertex that HAS an edge, so the walk explores a
    # real component instead of an isolated document
    src = sym.agg(F.min("a").alias("doc_id"))
    levels = src.select("doc_id", F.lit(0).cast("long").alias("level"))
    frontier = levels
    for lvl in range(1, 21):
        nxt = (
            frontier.join(sym, frontier["doc_id"] == sym["a"])
            .select(F.col("b").alias("doc_id"))
            .distinct()
            .join(levels.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(lvl).cast("long").alias("level"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels = levels.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    sym.unpersist()
    e.unpersist()
    return levels


# --------------------------------------------------------------------------
# function breadth
# --------------------------------------------------------------------------


@query(
    "window_funcs_full",
    "SELECT l_orderkey, l_linenumber, "
    "CAST(ntile(4) OVER w AS INT) AS tile4, "
    "round(percent_rank() OVER w, 6) AS pct_rank, "
    "round(cume_dist() OVER w, 6) AS cume, "
    "CAST(lag(l_quantity, 1, -1) OVER w AS DOUBLE) AS prev_qty, "
    "CAST(lead(l_quantity, 2, -2) OVER w AS DOUBLE) AS next2_qty, "
    "CAST(first_value(l_quantity) OVER w AS DOUBLE) AS first_qty, "
    "CAST(last_value(l_quantity) OVER "
    "(PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) "
    "  AS last_qty "
    "FROM lineitem WHERE l_orderkey % 100 = 0 "
    "WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity)",
    tags=["window", "functions"],
)
def q_window_funcs_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining window-function family in one plan: ntile,
    percent_rank, cume_dist, offset functions with defaults, and
    first/last over an explicit full frame — one shuffle, one sort."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_orderkey") % 100 == 0
    )
    # (l_orderkey, l_linenumber) is NOT unique in this testdata (1217
    # duplicate groups at sf0.1 with differing quantities) — l_quantity
    # joins the ORDER BY so rows tying on the full key are identical in
    # every emitted column and any tie order hashes the same
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).cast("int").alias("tile4"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lag("l_quantity", 1, -1).over(w).cast("double").alias("prev_qty"),
        F.lead("l_quantity", 2, -2).over(w).cast("double").alias("next2_qty"),
        F.first("l_quantity").over(w).cast("double").alias("first_qty"),
        F.last("l_quantity").over(wfull).cast("double").alias("last_qty"),
    )


@query(
    "string_funcs3",
    "SELECT c_custkey, "
    "array_to_string(regexp_extract_all(c_name, '([0-9]+)', 1), ',') AS nums, "
    "CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev_building, "
    "upper(substr(c_mktsegment,1,1))||lower(substr(c_mktsegment,2)) AS seg_title, "
    "translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_vowels, "
    "repeat(substr(c_name, 1, 3), 2) AS name3x2, "
    "reverse(c_mktsegment) AS seg_rev "
    "FROM customer WHERE c_custkey % 10 = 0",
    tags=["scalar", "string", "functions"],
)
def q_string_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth: regexp_extract_all, edit distance,
    initcap/translate/repeat/reverse — all JVM-side expressions."""
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_custkey") % 10 == 0
    )
    return c.select(
        "c_custkey",
        F.array_join(
            F.regexp_extract_all("c_name", F.lit("([0-9]+)"), F.lit(1)), ","
        ).alias("nums"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING"))
        .cast("int")
        .alias("lev_building"),
        F.initcap("c_mktsegment").alias("seg_title"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_vowels"),
        F.repeat(F.substring("c_name", 1, 3), 2).alias("name3x2"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


@query(
    "date_funcs2",
    "SELECT o_orderkey, "
    "CAST(date_trunc('month', o_orderdate) AS DATE)::VARCHAR AS month_start, "
    "CAST(date_trunc('quarter', o_orderdate) AS DATE)::VARCHAR AS q_start, "
    "CAST((1998 - date_part('year', o_orderdate::DATE)) * 12 "
    " + (12 - date_part('month', o_orderdate::DATE)) AS BIGINT) "
    "  AS months_to_eoy, "
    "CAST(o_orderdate::DATE + INTERVAL 3 MONTH AS DATE)::VARCHAR "
    "  AS plus3mo, "
    "CAST(weekofyear(o_orderdate::DATE) AS INT) AS week_no, "
    "CAST(dayofyear(o_orderdate::DATE) AS INT) AS doy, "
    "CAST(quarter(o_orderdate::DATE) AS INT) AS qtr "
    "FROM orders WHERE o_orderkey % 500 = 0",
    tags=["scalar", "date", "functions"],
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function breadth: trunc to month/quarter, calendar-month
    distance to a fixed date, interval arithmetic (add_months), ISO
    week / day-of-year / quarter. Dates serialized as strings for the
    cross-engine hash."""
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") % 500 == 0
    )
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").cast("string").alias(
            "month_start"
        ),
        F.date_trunc("quarter", d).cast("date").cast("string").alias(
            "q_start"
        ),
        # calendar-month distance via explicit year/month arithmetic —
        # months_between/age() disagree across engines on day-of-month
        # edge rules, the part-wise form is engine-portable
        (
            (F.lit(1998) - F.year(d)) * 12 + (F.lit(12) - F.month(d))
        ).cast("long").alias("months_to_eoy"),
        F.add_months(d, 3).cast("string").alias("plus3mo"),
        F.weekofyear(d).cast("int").alias("week_no"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.quarter(d).cast("int").alias("qtr"),
    )


@query(
    "null_safety_funcs",
    "SELECT l_orderkey, l_linenumber, "
    "CAST(nullif(l_linenumber, 1) AS INT) AS line_or_null, "
    "CAST(COALESCE(nullif(l_linenumber, 1), -1) AS INT) AS nvl_line, "
    "CAST(CASE WHEN nullif(l_linenumber, 1) IS NOT NULL THEN 10 ELSE 20 END "
    "  AS INT) AS nvl2_line, "
    "CAST(CASE WHEN l_quantity = 0 THEN NULL "
    "     ELSE l_extendedprice / l_quantity END AS DOUBLE) AS try_unit_price, "
    "CAST(l_linenumber IS NOT DISTINCT FROM 1 AS BOOLEAN) AS is_line1 "
    "FROM lineitem WHERE l_orderkey % 200 = 0",
    tags=["scalar", "null", "ansi", "functions"],
)
def q_null_safety_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safety surface: nullif/nvl/nvl2, ANSI try_divide (lenient
    division under ANSI mode — NULL on /0 instead of an error), and
    null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_orderkey") % 200 == 0
    )
    line_or_null = F.nullif(F.col("l_linenumber"), F.lit(1))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        line_or_null.cast("int").alias("line_or_null"),
        F.nvl(line_or_null, F.lit(-1)).cast("int").alias("nvl_line"),
        F.nvl2(line_or_null, F.lit(10), F.lit(20)).cast("int").alias(
            "nvl2_line"
        ),
        F.try_divide("l_extendedprice", F.nullif("l_quantity", F.lit(0)))
        .cast("double")
        .alias("try_unit_price"),
        F.col("l_linenumber").eqNullSafe(F.lit(1)).alias("is_line1"),
    )


@query(
    "hof_map_funcs",
    "WITH ln AS (SELECT l_orderkey, l_linenumber, "
    "  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty "
    "  FROM lineitem WHERE l_orderkey % 300 = 0 "
    "  GROUP BY l_orderkey, l_linenumber), "
    "m AS (SELECT l_orderkey, "
    "  map_from_entries(list_sort(array_agg(ROW(l_linenumber, qty)))) "
    "    AS qty_map FROM ln GROUP BY l_orderkey) "
    "SELECT l_orderkey, "
    "CAST(len(map_keys(qty_map)) AS INT) AS n_lines, "
    "round(list_sum(map_values(qty_map)), 4) AS total_qty, "
    "CAST(len(list_filter(map_values(qty_map), x -> x >= 25)) AS INT) "
    "  AS n_big_lines "
    "FROM m",
    tags=["scalar", "map", "hof", "functions"],
)
def q_hof_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over aggregated maps: build a
    line→quantity map per order, then size / sum / filter its values —
    map_from_entries + map_keys/values + filter, all codegen-friendly
    expressions."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_orderkey") % 300 == 0
    )
    # line numbers repeat within an order in this testdata — aggregate
    # to unique map keys first (decimal sum: partition-order independent)
    ln = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(F.col("l_quantity").cast("decimal(20,4)"))
        .cast("double")
        .alias("qty")
    )
    m = ln.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct("l_linenumber", "qty"))
            )
        ).alias("qty_map")
    )
    vals = F.map_values(F.col("qty_map"))
    return m.select(
        "l_orderkey",
        F.size(F.map_keys(F.col("qty_map"))).cast("int").alias("n_lines"),
        F.round(
            F.aggregate(vals, F.lit(0.0), lambda a, x: a + x), 4
        ).alias("total_qty"),
        F.size(F.filter(vals, lambda x: x >= 25)).cast("int").alias(
            "n_big_lines"
        ),
    )
