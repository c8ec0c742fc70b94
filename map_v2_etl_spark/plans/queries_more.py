"""Second extension query wave: as-of / range / full-outer joins, window
ranking, JSON & array scalars, correlated subqueries (decorrelation),
geo tiling, multimodal binary columns, sessionization, stateful streaming.

Same oracle philosophy as queries_ext.py: deterministic definitions shared
bit-for-bit with DuckDB wherever SQL can express the op; rows-only for the
genuinely non-SQL surfaces (pandas-UDF geometry, mapInPandas features,
applyInPandasWithState), each of which has a pytest ground-truth twin.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.geo import assign_tiles, per_tile_topk, with_interior_points
from ..operators.joins import asof_join, bucketed_range_join
from ..operators.multimodal import extract_features, synth_media
from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@query(
    "asof_join",
    "SELECT p.event_id, p.user_id, p.ts, c.ts AS ts_right, c.value AS value "
    "FROM (SELECT event_id, user_id, ts FROM events "
    "      WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events "
    "                WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id AND p.ts >= c.ts",
    tags=["join", "asof"],
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase matched to the user's latest
    prior click. Union + running-last composition — one shuffle on
    (user_id, ts), no nested-loop range join (operators/joins.asof_join)."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["value"],
    )


_N_BANDS = 140
_BAND_W = 800.0
_BAND_LEN = 1599.0


@query(
    "range_join",
    f"SELECT band_id, COUNT(*) AS n, "
    f"CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty "
    f"FROM lineitem JOIN ("
    f"  SELECT i AS band_id, i * {_BAND_W} AS lo, i * {_BAND_W} + {_BAND_LEN} AS hi "
    f"  FROM range(0, {_N_BANDS}) t(i)) bands "
    f"ON l_extendedprice BETWEEN lo AND hi GROUP BY band_id",
    tags=["join", "range"],
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via bucketed equi-join (operators/joins.
    bucketed_range_join): overlapping price bands x lineitem. A plain
    BETWEEN join would plan BroadcastNestedLoop — cartesian at scale;
    bucketing makes it a hash join on band buckets."""
    li = load_table(spark, "lineitem", sf_dir)
    bands = spark.range(0, _N_BANDS).select(
        F.col("id").alias("band_id"),
        (F.col("id") * _BAND_W).alias("lo"),
        (F.col("id") * _BAND_W + _BAND_LEN).alias("hi"),
    )
    joined = bucketed_range_join(
        li.select("l_extendedprice", "l_quantity"), bands,
        "l_extendedprice", "lo", "hi", bucket_width=_BAND_W,
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)"))
        .cast("double")
        .alias("qty"),
    )


@query(
    "full_outer_join",
    "WITH cu AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer "
    "WHERE c_mktsegment = 'MACHINERY' GROUP BY c_nationkey), "
    "su AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier "
    "WHERE s_acctbal > 3000 GROUP BY s_nationkey) "
    "SELECT COALESCE(cu.k, su.k) AS nationkey, n_cust, n_supp "
    "FROM cu FULL OUTER JOIN su ON cu.k = su.k",
    tags=["join", "outer"],
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered aggregates (SURVEY §2.3 declared
    join-type surface)."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    cu = (
        c.filter(F.col("c_mktsegment") == "MACHINERY")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    su = (
        s.filter(F.col("s_acctbal") > 3000)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cu.join(su, cu.k == su.k, "full_outer").select(
        F.coalesce(cu.k, su.k).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "correlated_subquery",
    "SELECT l_partkey, COUNT(*) AS n_small FROM lineitem l1 "
    "WHERE l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS "
    "DECIMAL(20,4))) AS DOUBLE) / COUNT(*)) FROM lineitem l2 "
    "WHERE l2.l_partkey = l1.l_partkey) GROUP BY l_partkey",
    tags=["subquery", "decorrelation"],
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape) through the SQL entry
    point — Catalyst decorrelates it into an aggregate + join; no
    per-row re-execution ever happens."""
    li = load_table(spark, "lineitem", sf_dir)
    view = "lineitem_corr_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    li.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT l_partkey, COUNT(*) AS n_small FROM {view} l1 "
        f"WHERE l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS "
        f"DECIMAL(20,4))) AS DOUBLE) / COUNT(*)) FROM {view} l2 "
        f"WHERE l2.l_partkey = l1.l_partkey) GROUP BY l_partkey"
    )


@query(
    "skew_salted_agg",
    "SELECT l_returnflag, COUNT(*) AS n, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty, "
    "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price "
    "FROM lineitem GROUP BY l_returnflag",
    tags=["agg", "skew", "salting"],
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a pathologically skewed key
    (3 distinct returnflags): each hot key fans out over 16 salt buckets
    in phase 1, partials merge in phase 2. Result identical to the plain
    GROUP BY the oracle runs (operators/skew.salted_agg)."""
    from ..operators.skew import salted_agg

    li = load_table(spark, "lineitem", sf_dir)
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("count", F.lit(1)),
            "qty": ("sum", F.col("l_quantity").cast("decimal(20,4)")),
            "min_price": ("min", F.col("l_extendedprice")),
            "max_price": ("max", F.col("l_extendedprice")),
        },
    )
    return out.withColumn("qty", F.col("qty").cast("double"))


@query(
    "tpch_q12",
    "SELECT o_orderpriority, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS high_count, "
    "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS low_count, COUNT(*) AS n "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE l_shipdate > o_orderdate GROUP BY o_orderpriority",
    tags=["tpch", "case-agg"],
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-conditional counting."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpch_q14",
    "SELECT CAST(100.0 * "
    "CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN "
    "CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(20,4))) END) AS DOUBLE) / "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE) "
    "AS DOUBLE) AS promo_revenue_pct FROM lineitem JOIN part ON l_partkey = p_partkey",
    tags=["tpch", "ratio"],
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue ratio — conditional / total
    aggregate in one pass, broadcast dimension join."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    rev = (F.col("l_extendedprice").cast("decimal(20,4)")
           * (1 - F.col("l_discount").cast("decimal(20,4)")))
    promo = F.col("p_type").like("PROMO%")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(promo, rev)).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18",
    "SELECT c_name, o_orderkey, o_totalprice FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 200)",
    tags=["tpch", "subquery", "semi"],
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with grouped HAVING — Catalyst plans
    the IN as a left-semi join against the aggregated subquery."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# window ranking (SURVEY §2.5 declared surface)
# --------------------------------------------------------------------------


@query(
    "window_ranking",
    "SELECT c_nationkey, c_custkey, "
    "RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, "
    "NTILE(4) OVER w AS quartile, "
    "CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank, "
    "CAST(CUME_DIST() OVER w AS DOUBLE) AS cume "
    "FROM customer "
    "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)",
    tags=["window", "ranking"],
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank / cume_dist over a
    deterministic total order (unique-key tiebreak)."""
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


@query(
    "window_range_frame",
    "SELECT o_custkey, o_orderkey, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) OVER "
    "(PARTITION BY o_custkey ORDER BY days "
    "RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_30d, "
    "FIRST_VALUE(o_orderkey) OVER w AS first_key, "
    "LAST_VALUE(o_orderkey) OVER "
    "(PARTITION BY o_custkey ORDER BY days, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key, "
    "NTH_VALUE(o_orderkey, 2) OVER "
    "(PARTITION BY o_custkey ORDER BY days, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key "
    "FROM (SELECT *, DATEDIFF('day', TIMESTAMP '1990-01-01 00:00:00', "
    "o_orderdate) AS days FROM orders) "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY days, o_orderkey)",
    tags=["window", "range-frame"],
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based sliding window — 30-day rolling sum) plus
    first/last/nth_value over explicit ROWS frames (SURVEY §2.5)."""
    o = load_table(spark, "orders", sf_dir).withColumn(
        "days", F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
    )
    w_range = (
        W.partitionBy("o_custkey").orderBy("days").rangeBetween(-30, 0)
    )
    w_rows = W.partitionBy("o_custkey").orderBy("days", "o_orderkey")
    w_full = w_rows.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
        .over(w_range)
        .cast("double")
        .alias("rolling_30d"),
        F.first("o_orderkey").over(w_rows).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    )


@query(
    "grouping_sets",
    "SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, o_orderstatus, "
    "COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total, "
    "CAST(GROUPING(EXTRACT(YEAR FROM o_orderdate)) AS INTEGER) AS g_yr, "
    "CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st "
    "FROM orders GROUP BY GROUPING SETS "
    "((EXTRACT(YEAR FROM o_orderdate)), (o_orderstatus), ())",
    tags=["agg", "grouping-sets"],
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers through the SQL
    entry point (rollup/cube cover the shorthand forms)."""
    o = load_table(spark, "orders", sf_dir)
    view = "orders_gs_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT YEAR(o_orderdate) AS yr, o_orderstatus, COUNT(*) AS n, "
        f"CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total, "
        f"CAST(GROUPING(YEAR(o_orderdate)) AS INT) AS g_yr, "
        f"CAST(GROUPING(o_orderstatus) AS INT) AS g_st "
        f"FROM {view} GROUP BY GROUPING SETS "
        f"((YEAR(o_orderdate)), (o_orderstatus), ())"
    )


@query(
    "median_quartiles",
    "SELECT l_returnflag, "
    "quantile_cont(l_extendedprice, 0.5) AS median_price, "
    "quantile_cont(l_extendedprice, 0.25) AS p25, "
    "quantile_cont(l_extendedprice, 0.75) AS p75 "
    "FROM lineitem GROUP BY l_returnflag",
    tags=["agg", "median"],
)
def q_median_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + quartiles — exact R-7 percentile (same interpolation as
    quantile_cont / d3.quantile; SURVEY §2.4 A4 applied at 0.25/0.5/0.75)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75"),
    )


@query(
    "string_funcs2",
    "SELECT p_partkey, "
    "regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred, "
    "translate(p_brand, '#', 'B') AS brand_t, "
    "lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad, "
    "split_part(p_type, ' ', 1) AS type_head, "
    "strpos(p_name, 'a') AS a_pos, "
    "reverse(p_brand) AS brand_rev, "
    "levenshtein(p_brand, reverse(p_brand)) AS lev_palin "
    "FROM part",
    tags=["scalar", "string"],
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second wave of string scalars: regexp_replace, translate, lpad,
    split_part, instr/strpos, reverse, levenshtein — all JVM-side."""
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.translate("p_brand", "#", "B").alias("brand_t"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.instr(F.col("p_name"), "a").alias("a_pos"),
        F.reverse("p_brand").alias("brand_rev"),
        F.levenshtein(F.col("p_brand"), F.reverse("p_brand")).alias(
            "lev_palin"
        ),
    )


@query(
    "group_zscore",
    "WITH b AS (SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS qi "
    "FROM lineitem), "
    "s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(qi) AS sq, "
    "SUM(qi * qi) AS sqq FROM b GROUP BY l_returnflag) "
    "SELECT b.l_returnflag, b.qi, "
    "CASE WHEN s.n > 1 AND (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) > 0 "
    "THEN (qi - CAST(sq AS DOUBLE) / n) / "
    "SQRT((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1)) "
    "ELSE 0.0 END AS zscore "
    "FROM b JOIN s USING (l_returnflag)",
    tags=["applyInPandas", "groups"],
)
def q_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via applyInPandas (operators/groups.py) — the
    Arrow per-group escape hatch, kept integer-exact so the pandas result
    hash-matches the SQL formula."""
    from ..operators.groups import group_zscore

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", F.round("l_quantity").cast("bigint").alias("qi")
    )
    return group_zscore(li, "l_returnflag", "qi")


# --------------------------------------------------------------------------
# JSON / array scalar surface (SURVEY §2.8 extension)
# --------------------------------------------------------------------------


@query(
    "json_funcs",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
    "CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket "
    "FROM events",
    tags=["scalar", "json"],
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (get_json_object —
    JVM-side Jackson path, no UDF)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select(
        "event_id", k.alias("k"), (k % 10).alias("k_bucket")
    )


@query(
    "array_funcs",
    "SELECT l_orderkey, "
    "array_to_string(list_sort(array_agg(l_linenumber)), ',') AS lines, "
    "COUNT(*) AS n_lines, "
    "list_contains(array_agg(l_linenumber), 3) AS has_line3 "
    "FROM lineitem GROUP BY l_orderkey",
    tags=["scalar", "array"],
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + sort + contains (collect_list / array_sort /
    array_contains); array serialized to string for the cross-engine
    hash."""
    li = load_table(spark, "lineitem", sf_dir)
    lines = F.array_sort(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(lines, lambda x: x.cast("string")), ","
        ).alias("lines"),
        F.count("*").alias("n_lines"),
        F.array_contains(F.collect_list("l_linenumber"), F.lit(3)).alias(
            "has_line3"
        ),
    )


# --------------------------------------------------------------------------
# geo tiling (SURVEY §2.9) — lon/lat derived deterministically from keys
# --------------------------------------------------------------------------

_ZOOM = 4

_DUCK_TILES = f"""
WITH pts AS (
  SELECT c_custkey, c_acctbal,
         (c_custkey % 360) - 180 + 0.5 AS lon,
         ((c_custkey * 7) % 160) - 80 + 0.25 AS lat
  FROM customer
),
t AS (
  SELECT c_custkey, c_acctbal,
    CAST(floor((lon + 180.0) / 360.0 * {2 ** _ZOOM}) AS INTEGER) AS tile_x,
    CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())
         / 2.0 * {2 ** _ZOOM}) AS INTEGER) AS tile_y
  FROM pts
),
r AS (
  SELECT tile_x, tile_y, c_custkey,
    ROW_NUMBER() OVER (PARTITION BY tile_x, tile_y
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM t
)
SELECT tile_x, tile_y, c_custkey FROM r WHERE rn <= 3
"""


@query("geo_tiles", _DUCK_TILES, tags=["geo", "tiles", "topk"])
def q_geo_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-Mercator tile assignment (pure column math, G3) + per-tile
    top-k density dropping (O3) — the tippecanoe tiling surface
    in-engine. lon/lat derived from keys so the oracle reproduces them."""
    c = load_table(spark, "customer", sf_dir)
    pts = c.select(
        "c_custkey",
        "c_acctbal",
        ((F.col("c_custkey") % 360) - 180 + 0.5).alias("lon"),
        ((F.col("c_custkey") * 7) % 160 - 80 + 0.25).alias("lat"),
    )
    tiled = assign_tiles(pts, "lon", "lat", zoom=_ZOOM)
    topk = per_tile_topk(tiled, "c_acctbal", 3, tie_cols=["c_custkey"])
    return topk.select("tile_x", "tile_y", "c_custkey")


_DUCK_INTERIOR = (
    "SELECT n_nationkey, CAST(n_nationkey + 1 AS DOUBLE) AS ip_x, "
    "CAST(n_nationkey + 1 AS DOUBLE) AS ip_y FROM nation"
)


@query(
    "geo_interior_points", _DUCK_INTERIOR, tags=["geo", "interior-point"]
)
def q_geo_interior_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interior points (G1, mapshaper -points inner) of synthetic square
    polygons via the Arrow-batched pandas UDF. The geometry algorithm is
    pure Python (not SQL-replicable in general), but the registry inputs
    are axis-aligned 2x2 squares whose interior point has the CLOSED
    FORM (k+1, k+1) — exact in float arithmetic — so the oracle checks
    the engine's values bit-for-bit on these inputs; algorithmic
    generality stays pinned in tests/test_geo_pipeline.py."""
    n = load_table(spark, "nation", sf_dir)
    sq = n.select(
        "n_nationkey",
        F.format_string(
            '{"type":"Polygon","coordinates":[[[%d,%d],[%d,%d],[%d,%d],'
            "[%d,%d],[%d,%d]]]}",
            F.col("n_nationkey"), F.col("n_nationkey"),
            F.col("n_nationkey") + 2, F.col("n_nationkey"),
            F.col("n_nationkey") + 2, F.col("n_nationkey") + 2,
            F.col("n_nationkey"), F.col("n_nationkey") + 2,
            F.col("n_nationkey"), F.col("n_nationkey"),
        ).alias("geometry"),
    )
    return with_interior_points(sq).select("n_nationkey", "ip_x", "ip_y")


_DUCK_FRAME_SAMPLE = """
SELECT d.doc_id AS media_id, CAST(f.f AS INTEGER) AS frame_ix,
       CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
       (SELECT CAST(SUM((s + d.doc_id + 3 * f.f) % 256) AS BIGINT)
        FROM range(0, 48) t(s)) AS sum_px
FROM documents d,
     LATERAL (SELECT unnest(range(0, 12 + d.doc_id % 20, 5)) AS f) f
"""


@query(
    "media_frame_sample",
    _DUCK_FRAME_SAMPLE,
    tags=["multimodal", "video", "frame-sample", "mapInPandas"],
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 5th frame) over deterministic M2EV
    containers synthesized per doc — REAL container parsing and
    Arrow-batched decode (operators/multimodal.sample_frames), integer
    frame statistics. Frame pixel (x, y) of frame f is
    (x + y*w + 3f + id) mod 256, so each sampled frame's exact pixel
    sum has the closed form the oracle computes with pure mod
    arithmetic — the whole decode-and-sample loop value-hashes."""
    from ..operators.multimodal import sample_frames, synth_video

    docs = load_table(spark, "documents", sf_dir)
    return sample_frames(synth_video(docs), every_n=5)


# Pinned tile-content digests (r10, verdict item 3): the query's input
# is the TPC-H `nation` table, which is 25 FIXED rows at every scale
# factor (verified identical across sf0.001/0.01/0.1), so the encoded
# tile set — and therefore this digest table — is scale-independent and
# run-deterministic. The pin is not circular: the pbf bytes behind each
# md5 are independently certified by the decoder round-trip and golden
# geometry tests in tests/test_mvt.py; this VALUES oracle makes the
# DRIVER's check content-bearing (any encoder regression flips a digest
# and hash-mismatches) instead of rows-only.
_MVT_DIGEST_ORACLE = """
SELECT CAST(z AS INTEGER) AS z, CAST(x AS BIGINT) AS x,
       CAST(y AS BIGINT) AS y, CAST(n_bytes AS BIGINT) AS n_bytes, pbf_md5
FROM (VALUES
  (4, 7, 7, 60, '3ac2d910dd7168f23a3f2eea949479f8'),
  (4, 7, 8, 58, 'af1b6f2923c88b7c7ab0e0880cd569c9'),
  (4, 8, 6, 125, 'f5f432503c7cdff54060acf0aa564f1e'),
  (4, 8, 7, 760, 'f8fab4ffa5741e4603270f89d4547ecb'),
  (4, 8, 8, 59, '373cd507a1b9d9c6705a4badff7795f9'),
  (4, 9, 6, 156, '7d9fa8089fa6b37e7b8b7f2315aba4e0'),
  (4, 9, 7, 89, '4ad6adf5191774111fc29ba89f295799')
) AS t(z, x, y, n_bytes, pbf_md5)
ORDER BY z, x, y
"""


@query(
    "geo_mvt_tiles",
    _MVT_DIGEST_ORACLE,
    tags=["geo", "mvt", "mbtiles", "sink", "pinned-digest"],
)
def q_geo_mvt_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native MVT tile encode (S8 without tippecanoe): synthetic square
    polygons -> distributed per-tile protobuf blobs (sources/mvt.py,
    hand-encoded spec-2.1 wire format). Output is the deterministic
    (z, x, y, n_bytes, pbf_md5) fingerprint of each blob, value-hashed
    against the pinned digest table above (scale-independent because
    `nation` is the same 25 rows at every SF); the bytes themselves are
    pinned by the independent decoder round-trip in tests/test_mvt.py."""
    from ..sources.mvt import encode_tiles

    n = load_table(spark, "nation", sf_dir)
    sq = n.select(
        "n_nationkey",
        F.format_string(
            '{"type":"Polygon","coordinates":[[[%d,%d],[%d,%d],[%d,%d],'
            '[%d,%d],[%d,%d]]]}',
            F.col("n_nationkey"), F.col("n_nationkey"),
            F.col("n_nationkey") + 2, F.col("n_nationkey"),
            F.col("n_nationkey") + 2, F.col("n_nationkey") + 2,
            F.col("n_nationkey"), F.col("n_nationkey") + 2,
            F.col("n_nationkey"), F.col("n_nationkey"),
        ).alias("geometry"),
        F.lit("nations").alias("layer"),
    )
    tiles = encode_tiles(sq, zoom=4, id_col="n_nationkey")
    return tiles.select(
        "z",
        "x",
        "y",
        F.octet_length("pbf").cast("long").alias("n_bytes"),
        F.md5("pbf").alias("pbf_md5"),
    ).orderBy("z", "x", "y")


# --------------------------------------------------------------------------
# multimodal binary columns
# --------------------------------------------------------------------------


@query(
    "media_byte_stats",
    "SELECT doc_id AS media_id, "
    "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END AS kind, "
    "octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5 "
    "FROM documents",
    tags=["multimodal", "binary"],
)
def q_media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata plan: payload length + content hash, all
    JVM-side (octet_length/md5 on BINARY). The media table itself is the
    deterministic synth_media stand-in (operators/multimodal.py)."""
    docs = load_table(spark, "documents", sf_dir)
    media = synth_media(docs)
    return media.select(
        "media_id",
        "kind",
        "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


_DUCK_MEDIA_FEATURES = """
WITH b AS MATERIALIZED (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents),
c AS MATERIALIZED (
  -- 16 bins of width 16 = the byte's HIGH NIBBLE = the odd-position
  -- hex digits of the payload
  SELECT doc_id,
         strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) - 1 AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM b, LATERAL unnest(range(n)) AS u(i)
  GROUP BY 1, 2),
f AS (
  SELECT b.doc_id, bins.bin, coalesce(c.cnt, 0) AS cnt
  FROM b CROSS JOIN (SELECT unnest(range(16)) AS bin) bins
  LEFT JOIN c ON c.doc_id = b.doc_id AND c.bin = bins.bin)
SELECT b.doc_id AS media_id,
       CASE CAST(b.doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(b.n AS BIGINT) AS n_bytes,
       g.histogram_json
FROM b JOIN (
  SELECT doc_id,
         '[' || string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY bin)
             || ']' AS histogram_json
  FROM f GROUP BY doc_id) g ON g.doc_id = b.doc_id
"""


@query(
    "media_features", _DUCK_MEDIA_FEATURES, tags=["multimodal", "mapInPandas"]
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (byte histogram through the stub
    decode boundary) via mapInPandas — non-SQL; ground truth asserted in
    tests/test_multimodal.py.

    Registry projection serializes the array-typed histogram to JSON:
    the driver's canonicalizer lexsorts pandas cells and an
    array<bigint> cell is unhashable there. extract_features keeps the
    typed array API for engine users; only this registry view flattens.
    """
    docs = load_table(spark, "documents", sf_dir)
    feats = extract_features(synth_media(docs))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.to_json("histogram").alias("histogram_json"),
    )


@query(
    "pivot_builtin",
    "SELECT o_custkey, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = {y} "
        f"THEN CAST(o_totalprice AS DECIMAL(20,4)) END) AS DOUBLE) AS total_{y}"
        for y in range(1995, 2002)
    )
    + " FROM orders GROUP BY o_custkey",
    tags=["A1", "pivot", "builtin"],
)
def q_pivot_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same long->wide pivot via Spark's native groupBy().pivot() with
    EXPLICIT values (no extra distinct-values job, deterministic schema) —
    the alternative formulation to pivot_wide's conditional aggregates.
    Catalyst compiles both to one hash aggregation."""
    years = list(range(1995, 2002))
    o = load_table(spark, "orders", sf_dir).withColumn(
        "yr", F.year("o_orderdate")
    )
    wide = (
        o.groupBy("o_custkey")
        .pivot("yr", years)
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double")
        )
    )
    return wide.select(
        "o_custkey", *[F.col(str(y)).alias(f"total_{y}") for y in years]
    )


@query(
    "unpivot_melt",
    "SELECT metric, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total FROM ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS metric, {c} AS value FROM lineitem"
        for c in ["l_quantity", "l_discount", "l_tax"]
    )
    + ") GROUP BY metric",
    tags=["unpivot", "melt"],
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (unpivot) + aggregation — the inverse of the pivot
    operator, used by the extents path (SURVEY §2.4 A5)."""
    cols = ["l_quantity", "l_discount", "l_tax"]
    li = load_table(spark, "lineitem", sf_dir).select(*cols)
    melted = li.unpivot([], cols, "metric", "value")
    return melted.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("total"),
    )


@query(
    "map_funcs",
    "SELECT doc_id, m['lang'][1] AS lang_val, "
    "array_to_string(list_sort(map_keys(m)), ',') AS keys_str "
    "FROM (SELECT doc_id, MAP {'lang': lang, 'source': source} AS m "
    "FROM documents)",
    tags=["scalar", "map"],
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: create_map, element_at, map_keys."""
    docs = load_table(spark, "documents", sf_dir)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return docs.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_str"),
    )


def _duck_ivf_sql() -> str:
    from .duck_vec import cosine as C

    return (
        "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_vec "
        "FROM embeddings WHERE vec_id % 10 = 0), "
        # nearest centroid per corpus vector — max_by(cent_id,
        # struct(cs, cent_id)): highest cs, ties to the HIGHEST cent_id
        "asg AS (SELECT nn_id, cent_id FROM ("
        "SELECT e.vec_id AS nn_id, c.cent_id, ROW_NUMBER() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {C('e.embedding', 'c.cent_vec')} "
        "DESC, c.cent_id DESC) AS rn FROM embeddings e CROSS JOIN cents c"
        ") WHERE rn = 1), "
        # query probes: nprobe=4 nearest cells, ties to the LOWEST id
        "probes AS (SELECT q_id, cent_id FROM ("
        "SELECT q.vec_id AS q_id, c.cent_id, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {C('q.embedding', 'c.cent_vec')} "
        "DESC, c.cent_id ASC) AS rn "
        "FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 50 = 0 "
        "AND q.embedding IS NOT NULL"
        ") WHERE rn <= 4), "
        "scored AS (SELECT p.q_id, a.nn_id, "
        f"{C('qv.embedding', 'nv.embedding')} AS cosine "
        "FROM probes p JOIN asg a ON a.cent_id = p.cent_id "
        "JOIN embeddings nv ON nv.vec_id = a.nn_id "
        "JOIN embeddings qv ON qv.vec_id = p.q_id "
        "WHERE a.nn_id <> p.q_id) "
        "SELECT q_id, nn_id, CAST(rank AS INTEGER) AS rank, cosine FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id "
        "ORDER BY cosine DESC, nn_id ASC) AS rank FROM scored"
        ") WHERE rank <= 5"
    )


@query("embedding_ivf_topk", _duck_ivf_sql(), tags=["similarity", "ann", "ivf"])
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (operators/similarity.
    ivf_cosine_topk): coarse-quantize the corpus into centroid cells,
    probe nprobe cells per query. Deterministic end to end (strided
    codebook, lexicographic tie-breaks, pinned cosine fold order), so
    despite being APPROXIMATE it now carries a full value-hash oracle —
    the DuckDB twin replicates assignment, probing, and scoring bit for
    bit (plans/duck_vec.py). Recall vs the exact twin is additionally
    asserted in tests/test_similarity.py."""
    from ..operators.similarity import ivf_cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_cosine_topk(emb, qs, k=5, centroid_stride=10, nprobe=4)


@query(
    "text_posexplode",
    "SELECT doc_id, CAST(i AS INTEGER) AS pos, w[i + 1] AS tok FROM "
    r"(SELECT doc_id, string_split_regex(trim(text), '\s+') AS w "
    "FROM documents WHERE length(trim(text)) > 0) t, "
    "LATERAL unnest(range(len(t.w))) AS u(i)",
    tags=["text", "explode", "lateral"],
)
def q_text_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view / posexplode: token table with positions (the
    tokenize-with-offsets shape every text pipeline needs)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    )


@query(
    "stats_agg",
    "SELECT l_returnflag, COUNT(*) AS n, "
    "CAST(SUM(qi) AS DOUBLE) / COUNT(*) AS mean_qty, "
    "(CAST(SUM(qi * qi) AS DOUBLE) - CAST(SUM(qi) AS DOUBLE) * CAST(SUM(qi) AS DOUBLE) / COUNT(*)) / (COUNT(*) - 1) AS var_qty, "
    "(CAST(SUM(qi * di) AS DOUBLE) - CAST(SUM(qi) AS DOUBLE) * CAST(SUM(di) AS DOUBLE) / COUNT(*)) / "
    "SQRT((CAST(SUM(qi * qi) AS DOUBLE) - CAST(SUM(qi) AS DOUBLE) * CAST(SUM(qi) AS DOUBLE) / COUNT(*)) * "
    "(CAST(SUM(di * di) AS DOUBLE) - CAST(SUM(di) AS DOUBLE) * CAST(SUM(di) AS DOUBLE) / COUNT(*))) AS corr_qty_disc "
    "FROM (SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS qi, "
    "CAST(ROUND(l_discount * 100) AS BIGINT) AS di FROM lineitem) "
    "GROUP BY l_returnflag",
    tags=["agg", "stats"],
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean/variance/correlation) via explicit
    integer-sum formulas: quantity and discount are integer-quantized, so
    SUM/SUM-of-squares are exact BIGINTs and every engine derives
    identical doubles. (Built-in stddev/corr use Welford-style updates
    whose rounding is engine-specific — fine in practice, but they would
    fail a bit-exact cross-engine hash.)"""
    li = load_table(spark, "lineitem", sf_dir)
    qi = F.round(F.col("l_quantity")).cast("bigint")
    di = F.round(F.col("l_discount") * 100).cast("bigint")
    base = li.select("l_returnflag", qi.alias("qi"), di.alias("di"))
    n = F.count("*")
    s_q, s_qq = F.sum("qi").cast("double"), F.sum(F.col("qi") * F.col("qi")).cast("double")
    s_d, s_dd = F.sum("di").cast("double"), F.sum(F.col("di") * F.col("di")).cast("double")
    s_qd = F.sum(F.col("qi") * F.col("di")).cast("double")
    var_q = (s_qq - s_q * s_q / n) / (n - 1)
    corr = (s_qd - s_q * s_d / n) / F.sqrt(
        (s_qq - s_q * s_q / n) * (s_dd - s_d * s_d / n)
    )
    return base.groupBy("l_returnflag").agg(
        n.alias("n"),
        (s_q / n).alias("mean_qty"),
        var_q.alias("var_qty"),
        corr.alias("corr_qty_disc"),
    )


# --------------------------------------------------------------------------
# sessionization + stateful streaming
# --------------------------------------------------------------------------


@query(
    "events_session_windows",
    "WITH o AS (SELECT user_id, ts, CASE WHEN "
    "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR "
    "ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= "
    "INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s FROM events), "
    "s AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id "
    "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
    "SELECT user_id, MIN(ts) AS session_start, "
    "MAX(ts) + INTERVAL 10 MINUTE AS session_end, COUNT(*) AS n_events "
    "FROM s GROUP BY user_id, sid",
    tags=["streaming", "session"],
)
def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (session_window, 10-min gap) in its batch
    form; the oracle rebuilds the identical sessions with lag + running
    sum. The same transform runs as a real watermarked stream in
    streaming/windows.session_windows."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_resample_gapfill",
    "WITH b AS (SELECT to_timestamp(floor(epoch(MIN(ts)) / 300) * 300) AS lo, "
    "to_timestamp(floor(epoch(MAX(ts)) / 300) * 300) AS hi FROM events), "
    "grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS ws "
    "FROM b), "
    "types AS (SELECT DISTINCT event_type FROM events), "
    "c AS (SELECT to_timestamp(floor(epoch(ts) / 300) * 300) AS ws, "
    "event_type, COUNT(*) AS n FROM events GROUP BY 1, 2) "
    "SELECT CAST(g.ws AS TIMESTAMP) AS window_start, t.event_type, "
    "COALESCE(c.n, 0) AS n_events FROM grid g CROSS JOIN types t "
    "LEFT JOIN c ON c.ws = g.ws AND c.event_type = t.event_type",
    tags=["timeseries", "gapfill"],
)
def q_events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense resample: fixed 5-min windows x all event types with explicit
    zero rows for silent windows (operators/timeseries.resample_gapfill).
    Grid built with sequence()+explode, no driver loop."""
    from ..operators.timeseries import resample_gapfill

    ev = load_table(spark, "events", sf_dir)
    return resample_gapfill(ev, window_sec=300)


_DUCK_SIMPLIFY = (
    "SELECT n_nationkey, printf("
    "'{\"type\":\"Polygon\",\"coordinates\":[[[%d.0,%d.0],[%d.0,%d.0],"
    "[%d.0,%d.0],[%d.0,%d.0],[%d.0,%d.0]]]}', "
    "n_nationkey, n_nationkey, n_nationkey + 2, n_nationkey, "
    "n_nationkey + 2, n_nationkey + 2, n_nationkey, n_nationkey + 2, "
    "n_nationkey, n_nationkey) AS simplified FROM nation"
)


@query("geo_simplify", _DUCK_SIMPLIFY, tags=["geo", "simplification"])
def q_geo_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Douglas-Peucker polygon simplification (G2 — tippecanoe
    --simplification in-engine) over synthetic sawtooth polygons; pure-
    Python geometry under an Arrow-batched UDF. The registry input is a
    sawtooth square whose DP result at tolerance 0.5 has the CLOSED
    FORM (the four corners, first vertex repeated), so the oracle
    reproduces the exact serialized ring and value-hashes the output;
    algorithmic generality stays pinned in tests/test_geo_pipeline.py."""
    from ..operators.geo import simplify_geometry

    n = load_table(spark, "nation", sf_dir)
    # sawtooth square around each nation key: extra collinear points that
    # a tolerance of 0.5 must remove
    k = F.col("n_nationkey").cast("double")
    coords = F.concat_ws(
        ",",
        *[
            F.format_string("[%s,%s]", (k + dx).cast("string"), (k + dy).cast("string"))
            for dx, dy in [
                (0.0, 0.0), (1.0, 0.01), (2.0, 0.0), (2.0, 1.0),
                (2.0, 2.0), (1.0, 2.0), (0.0, 2.0), (0.0, 1.0), (0.0, 0.0),
            ]
        ],
    )
    sq = n.select(
        "n_nationkey",
        F.concat(
            F.lit('{"type":"Polygon","coordinates":[['),
            coords,
            F.lit("]]}"),
        ).alias("geometry"),
    )
    return sq.select(
        "n_nationkey",
        simplify_geometry(0.5)(F.col("geometry")).alias("simplified"),
    )


_DUCK_STATEFUL = (
    "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list(value ORDER BY value)), (acc, x) -> acc + x) AS total_value "
    "FROM events GROUP BY user_id"
)


@query(
    "events_stateful_running", _DUCK_STATEFUL, tags=["streaming", "stateful"]
)
def q_events_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): runs a
    REAL Structured Streaming query over the events parquet and returns
    the per-user running totals. The operator accumulates each batch in
    CANONICAL value-sorted fold order (shuffle arrival order must never
    leak into a float result), so the single-batch replay this query
    performs is bit-deterministic and the DuckDB oracle — the same
    sorted fold in SQL — value-hashes a genuine Structured Streaming
    run, state store and all. Batch-parity additionally asserted in
    tests/test_streaming.py."""
    from ..streaming.stateful import running_user_totals
    from ..streaming.windows import run_stream_on_parquet

    qname = "stateful_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return run_stream_on_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        running_user_totals,
        query_name=qname,
        output_mode="update",
    )
