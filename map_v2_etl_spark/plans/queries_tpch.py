"""Extended TPC-H-shaped query coverage (q2/q4/q6..q22 adaptations).

The reference pipeline (EvictionLab map-v2-etl, /root/reference/build.sh)
has exactly one join and one aggregation shape; this module widens the
engine's declared relational surface with the classic TPC-H patterns the
driver's star schema can express: EXISTS / NOT-EXISTS decorrelation,
scalar subqueries, correlated aggregates, anti joins, OR-of-bands
predicates, and group-count histograms.

The driver's testdata is TPC-H-*ish*: there is no partsupp table, no
l_commitdate / l_receiptdate, no comment columns. Queries that need
those are adapted (documented per-query) — lineitem serves as the
part<->supplier bridge, and "late" is defined against o_orderdate.

Determinism rules (hash-match vs DuckDB): money sums go through
DECIMAL(20,4) so addition is exact and partition-order-independent;
averages used in comparisons are rewritten as exact integer/decimal
cross-multiplications where a double rounding difference could flip a
boundary row; top-k always tie-breaks on a unique key.

Scale posture (100 TB): every dimension join is broadcast
(region/nation/supplier/part/customer are tiny relative to the fact
tables); fact-fact joins shuffle on the join key only after scan-level
filter pushdown; EXISTS/NOT-EXISTS pairs are decorrelated into a single
per-key aggregation pass instead of two correlated probes, so each adds
exactly one shuffle of pre-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

DEC = "decimal(20,4)"


def _rev(df_col_price: str = "l_extendedprice", disc: str = "l_discount"):
    return F.col(df_col_price).cast(DEC) * (1 - F.col(disc).cast(DEC))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(20,4)) * "
    "(1 - CAST(l_discount AS DECIMAL(20,4)))"
)


@query(
    "tpch_q2",
    "SELECT s_name, n_name, p_partkey, p_name, l_extendedprice AS min_price "
    "FROM part, lineitem, supplier, nation, region "
    "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
    "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
    "AND p_size = 15 AND p_type = 'SMALL' AND r_name = 'ASIA' "
    "AND l_extendedprice = ("
    "  SELECT MIN(l2.l_extendedprice) FROM lineitem l2, supplier s2, "
    "  nation n2, region r2 WHERE l2.l_partkey = p_partkey "
    "  AND s2.s_suppkey = l2.l_suppkey AND s2.s_nationkey = n2.n_nationkey "
    "  AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')",
    tags=["tpch", "subquery", "correlated-min"],
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier), adapted: no partsupp table, so
    lineitem is the part<->supplier bridge and l_extendedprice stands in
    for ps_supplycost. The correlated MIN is decorrelated into one
    aggregate + equi-join on (partkey, price) — price values compare
    exactly (same parquet doubles on both engines, no arithmetic).

    Scale: region/nation/supplier broadcast; the min-aggregate reuses the
    same filtered fact scan, so Catalyst schedules one shuffle per side
    keyed on l_partkey.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")

    # lineitems whose supplier sits in the target region
    asia_li = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    min_price = asia_li.groupBy(
        F.col("l_partkey").alias("mp_partkey")
    ).agg(F.min("l_extendedprice").alias("min_price"))
    return (
        asia_li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(
            min_price,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("s_name", "n_name", "p_partkey", "p_name", "min_price")
    )


@query(
    "tpch_q4",
    "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
    "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
    "AND l_shipdate > o_orderdate) GROUP BY o_orderpriority",
    tags=["tpch", "exists", "semi"],
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking), adapted: the reference
    schema has no l_commitdate/l_receiptdate, so the EXISTS predicate is
    "some line shipped after the order date". Catalyst plans the EXISTS
    as a left-semi join with the non-equi condition attached.

    Scale: the date filter pushes to the orders scan; the semi join
    shuffles only (orderkey, orderdate) against lineitem's two columns.
    """
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate"
    )
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q6",
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * "
    "CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) AS revenue "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
    tags=["tpch", "filter", "scan-agg"],
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan + conjunctive filter
    + single aggregate — the canonical pushdown benchmark. All three
    predicates reach the parquet reader (PushedFilters); the plan is one
    whole-stage-codegen'd partial agg + a 1-row final agg.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * F.col("l_discount").cast(DEC)
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q7",
    "SELECT supp_nation, cust_nation, l_year, "
    "CAST(SUM(volume) AS DOUBLE) AS revenue FROM ("
    "  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "  EXTRACT(YEAR FROM l_shipdate) AS l_year, "
    f"  {_REV_SQL} AS volume "
    "  FROM supplier, lineitem, orders, customer, nation n1, nation n2 "
    "  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey "
    "  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey "
    "  AND c_nationkey = n2.n_nationkey "
    "  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
    "    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
    "  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' "
    "  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') "
    "GROUP BY supp_nation, cust_nation, l_year",
    tags=["tpch", "multi-join", "agg"],
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): five-way join with a symmetric
    nation-pair predicate, revenue by (supplier nation, customer nation,
    ship year).

    Scale: both nation joins broadcast; supplier broadcast; the only
    shuffles are lineitem><orders on orderkey and orders><customer on
    custkey. The nation-pair filter is applied after the broadcasts, so
    the fact scan is pruned to 3 columns + the filter year range.
    """
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q8",
    "SELECT o_year, CAST(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume "
    "END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share "
    "FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year, "
    f"  {_REV_SQL} AS volume, n2.n_name AS nation "
    "  FROM part, lineitem, supplier, orders, customer, "
    "  nation n1, nation n2, region "
    "  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
    "  AND l_orderkey = o_orderkey AND o_custkey = c_custkey "
    "  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey "
    "  AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey "
    "  AND p_type = 'PROMO') GROUP BY o_year",
    tags=["tpch", "multi-join", "ratio"],
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_1 suppliers' share of
    PROMO-part revenue sold to ASIA customers, per order year. The
    conditional/total ratio is computed in one aggregation pass (decimal
    sums, double division only at the end).

    Scale: part/supplier/nation/region all broadcast; two fact shuffles
    (orderkey, custkey). The p_type filter broadcasts as a pre-filtered
    build side, shrinking the probe early.
    """
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    vol = _rev()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_1", vol))
                .cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@query(
    "tpch_q9",
    "SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit FROM ("
    "  SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year, "
    f"  {_REV_SQL} - "
    "  CAST(p_retailprice AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(20,4)) "
    "  AS amount "
    "  FROM part, supplier, lineitem, orders, nation "
    "  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey "
    "  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey "
    "  AND p_name LIKE '%widget%') GROUP BY nation, o_year",
    tags=["tpch", "multi-join", "profit"],
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit), adapted: no partsupp, so
    p_retailprice stands in for ps_supplycost in the profit formula;
    the part filter is a substring LIKE on p_name ('%widget%').

    Scale: part/supplier/nation broadcast; one orderkey shuffle. Profit
    arithmetic stays in decimal until the final cast so the sum is
    order-independent.
    """
    p = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("%widget%")
    )
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    amount = _rev() - (
        F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q10",
    "SELECT c_custkey, c_name, "
    f"CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, c_acctbal, n_name "
    "FROM customer, orders, lineitem, nation "
    "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
    "AND l_returnflag = 'R' AND c_nationkey = n_nationkey "
    "GROUP BY c_custkey, c_name, c_acctbal, n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
    tags=["tpch", "topk", "join-agg"],
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): lost revenue per customer
    from returned lines in one quarter, top 20. Tie-break on c_custkey
    keeps the limit deterministic across engines.

    Scale: returnflag + date filters push to both fact scans before the
    custkey shuffle; the final top-20 is a TakeOrdered (no full sort).
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q11",
    "SELECT l_partkey AS ps_partkey, CAST(SUM(CAST(l_extendedprice AS "
    "DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS value "
    "FROM lineitem, supplier, nation "
    "WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey "
    "AND n_name = 'NATION_3' GROUP BY l_partkey "
    "HAVING SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * "
    "CAST(l_quantity AS DECIMAL(20,4))) > ("
    "  SELECT SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * "
    "  CAST(l_quantity AS DECIMAL(20,4))) * 0.005 "
    "  FROM lineitem, supplier, nation "
    "  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey "
    "  AND n_name = 'NATION_3')",
    tags=["tpch", "scalar-subquery", "having"],
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock), adapted: lineitem is the
    partsupp stand-in; "value" is extendedprice*quantity held by one
    nation's suppliers, keeping parts whose value exceeds 0.5% of the
    national total (scalar subquery).

    The HAVING comparison stays entirely in decimal on both engines —
    exact arithmetic, so boundary parts cannot flip on rounding.

    Scale: the scalar total is a second pass over the same filtered
    scan; Spark broadcasts the 1-row result into the HAVING filter
    (cross-join of a scalar), no driver collect.
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name") == "NATION_3"
    )
    val = F.col("l_extendedprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    national = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    per_part = national.groupBy("l_partkey").agg(
        F.sum(val).alias("value_dec")
    )
    total = national.agg(
        (F.sum(val) * F.lit(0.005).cast("decimal(4,3)")).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
    )


@query(
    "tpch_q13",
    "SELECT c_count, COUNT(*) AS custdist FROM ("
    "  SELECT c_custkey, COUNT(o_orderkey) AS c_count "
    "  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey "
    "  AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) "
    "GROUP BY c_count",
    tags=["tpch", "outer-join", "histogram"],
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): left outer join with an
    extra ON-clause predicate (not a WHERE — customers with zero
    qualifying orders must survive with count 0), then a histogram of
    the per-customer counts. Adapted: the o_comment NOT LIKE filter
    becomes an o_orderpriority exclusion.

    Scale: first agg shuffles on custkey, second on the tiny c_count
    domain; COUNT(o_orderkey) ignores the nulls the outer join emits.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q16",
    "SELECT p_brand, p_type, p_size, "
    "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' "
    "AND p_size IN (1, 4, 7, 10, 15, 22, 25, 30) "
    "AND l_suppkey NOT IN ("
    "  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
    "GROUP BY p_brand, p_type, p_size",
    tags=["tpch", "anti-join", "count-distinct"],
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship), adapted: lineitem
    bridges part->supplier (no partsupp); the excluded-supplier
    subquery filters on s_acctbal < 0 (no comment column). NOT IN on a
    non-nullable key plans as a broadcast anti join.

    Scale: part broadcast after its IN-list filter; the anti join
    broadcasts the (tiny) bad-supplier set; distinct-count shuffles on
    the (brand, type, size) group key.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 22, 25, 30))
    )
    bad_s = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad_s),
            li.l_suppkey == bad_s.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17",
    "SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)"
    " / 7.0 AS DOUBLE) AS avg_yearly "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand = 'Brand#23' AND l_quantity < ("
    "  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 "
    "  WHERE l2.l_partkey = lineitem.l_partkey)",
    tags=["tpch", "correlated-avg"],
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    below 20% of the part's average quantity. The correlated AVG is
    decorrelated into a per-part aggregate + join. Quantities are small
    integers stored as doubles, so SUM/COUNT/AVG are exact in double on
    both engines and the 0.2* comparison is deterministic.

    Scale: the per-part average is a partial-agg-friendly shuffle on
    partkey over two pruned columns; the filtered brand probe side is
    broadcast.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand") == "Brand#23"
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / 7.0
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q19",
    f"SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
    "  AND l_quantity BETWEEN 1 AND 11) "
    "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
    "  AND l_quantity BETWEEN 10 AND 20) "
    "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 "
    "  AND l_quantity BETWEEN 20 AND 30)",
    tags=["tpch", "or-bands", "join-filter"],
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, OR-of-bands): disjunctive
    predicate spanning both join sides — Catalyst can't split it across
    the join, but it derives the common p_brand IN (...) prefilter for
    the broadcast build side.

    Scale: part side pre-shrunk by the derived IN filter and broadcast;
    the residual OR evaluates post-join inside codegen.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q20",
    "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN ("
    "  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey "
    "  WHERE p_type = 'PROMO' "
    "  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "  GROUP BY l_suppkey "
    "  HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 300)",
    tags=["tpch", "semi", "grouped-having"],
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), adapted: suppliers
    who moved > 300 units of PROMO parts in 1996 (lineitem stands in
    for partsupp availability). IN-over-grouped-HAVING plans as a
    left-semi join against the aggregate.

    Scale: the aggregate side reduces to ~|suppliers| rows before the
    semi join, which then broadcasts; decimal quantity sum keeps the
    HAVING threshold exact.
    """
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return s.join(
        F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "tpch_q21",
    "SELECT s_name, COUNT(*) AS numwait "
    "FROM supplier, lineitem l1, orders "
    "WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey "
    "AND o_orderstatus = 'F' "
    "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY "
    "AND EXISTS (SELECT 1 FROM lineitem l2 "
    "  WHERE l2.l_orderkey = l1.l_orderkey "
    "  AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
    "  WHERE l3.l_orderkey = l1.l_orderkey "
    "  AND l3.l_suppkey <> l1.l_suppkey "
    "  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) "
    "GROUP BY s_name",
    tags=["tpch", "exists", "not-exists", "decorrelated"],
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted: no
    commit/receipt dates, so "late" = shipped more than 60 days after
    the order date; counts, per supplier, the late lines in finished
    multi-supplier orders where that supplier was the ONLY late one.

    Rather than two correlated EXISTS probes, both are decorrelated
    into ONE aggregation over (orderkey, suppkey): an order qualifies
    when it has >= 2 distinct suppliers and exactly 1 with late lines.
    That turns two extra fact-table joins into one reduced-cardinality
    pass — the shape that survives at 100 TB.
    """
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, "lineitem", sf_dir)
    lines = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("late").alias("late_cnt")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("late_cnt") > 0).cast("int")).alias("n_late_supp"),
    )
    qualifying = (
        per_supp.join(per_order, "l_orderkey")
        .filter(
            (F.col("late_cnt") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        qualifying.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_cnt").alias("numwait"))
    )


@query(
    "tpch_q22",
    "SELECT cntrycode, COUNT(*) AS numcust, "
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS totacctbal "
    "FROM (SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode, "
    "  c_acctbal FROM customer "
    "  WHERE CAST(c_acctbal AS DECIMAL(20,4)) * ("
    "    SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0) > ("
    "    SELECT SUM(CAST(c_acctbal AS DECIMAL(20,4))) FROM customer "
    "    WHERE c_acctbal > 0.0) "
    "  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
    "    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) "
    "GROUP BY cntrycode",
    tags=["tpch", "anti-join", "scalar-subquery"],
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity), adapted: cntrycode =
    c_nationkey % 5 (no phone column); customers with above-average
    positive balance and no orders since 2000 (every customer in the
    testdata has SOME order, so the classic no-orders-ever predicate
    would select zero rows — the recency window keeps the anti join
    meaningful).

    The "above average" comparison is cross-multiplied into exact
    decimal arithmetic (bal * n > sum) — an average computed in double
    could round differently per engine and flip a boundary customer.

    Scale: the scalar (count, sum) pair is one broadcast row; the
    no-orders test is an anti join shuffled on custkey (orders' probe
    side prunes to one column).
    """
    c = load_table(spark, "customer", sf_dir)
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    pos = c.filter(F.col("c_acctbal") > 0.0)
    stats = pos.agg(
        F.count("*").alias("n_pos"),
        F.sum(F.col("c_acctbal").cast(DEC)).alias("sum_pos"),
    )
    return (
        c.join(F.broadcast(stats))
        .filter(
            F.col("c_acctbal").cast(DEC) * F.col("n_pos")
            > F.col("sum_pos")
        )
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(
            (F.col("c_nationkey") % 5).cast("int").alias("cntrycode")
        )
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "tpch_q15",
    "WITH revenue AS ("
    f"  SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_revenue "
    "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue "
    "FROM supplier, revenue WHERE s_suppkey = supplier_no "
    "AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)",
    tags=["tpch", "cte", "scalar-max"],
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the classic CREATE VIEW becomes a reused
    DataFrame (same thing — a named logical plan); the supplier(s)
    achieving MAX(total_revenue) in one quarter. Revenue stays decimal
    through the MAX-equality comparison, so ties and the max itself are
    exact on both engines; only the output column casts to double.

    Scale: the revenue aggregate reduces lineitem to |suppliers| rows
    before anything else happens; the scalar MAX broadcasts back over
    it, and the supplier join is a broadcast.
    """
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, "supplier", sf_dir)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue_dec")
    )
    top = revenue.agg(F.max("total_revenue_dec").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue_dec") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
    )
