"""Wave-17 surface: storage-format breadth + layout-aware scan patterns
+ two training-data ordering operators (SURVEY.md §2.1, §2.11).

* orc_roundtrip        — lineitem → ORC → re-read → aggregate: exercises
                         Spark's second columnar container end-to-end
                         (the reference stack is CSV/GeoJSON-only; ORC
                         and Parquet are the two formats a Spark shop
                         actually stores 100 TB in).
* json_roundtrip       — orders → newline-delimited JSON (the crawl-dump
                         interchange format) → schema-pinned re-read →
                         aggregate. Schema is explicit on the way back
                         in: at scale you NEVER infer over 100 TB (one
                         full extra pass) — the pinned schema is both
                         the perf posture and the type-fidelity test.
* partition_pruned_scan— events → date-partitioned parquet → filtered
                         re-read: the layout that turns a time-range
                         query from a 100 TB scan into a one-partition
                         read. The filter lands in PartitionFilters
                         (asserted in tests), not in post-scan Filter.
* training_order       — deterministic global shuffle for training-data
                         ordering: rank by md5(doc_id). Two-phase
                         distributed rank (per-bucket row_number +
                         broadcast prefix offsets) — the scale-honest
                         zipWithIndex; no single-reducer global window.
* curriculum_stages    — quartile-bucketed curriculum: exact R-7
                         quartiles of token count split the corpus into
                         4 stages (short→long), per-stage counts/sums.
                         Threshold pass is one bounded aggregate; the
                         bucketing pass is a broadcast-free projection.

All five hash-checked against DuckDB. Roundtrip queries materialize
their (tiny) aggregate eagerly and then remove the temp directory, so
nothing leaks between oracle runs.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators import text as X
from ..sources.registry import load_table
from .registry import query

DEC = "decimal(20,4)"


def _eager(df: DataFrame) -> DataFrame:
    """Materialize a small result NOW (so the temp dir backing it can be
    deleted before the caller lazily executes the returned frame)."""
    return df.localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# orc_roundtrip
# --------------------------------------------------------------------------

_DUCK_ORC = (
    "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, "
    # decimal-exact internal sum, DOUBLE final projection (house style,
    # see tpch_q1): the driver's hasher canonicalizes DECIMAL finals
    # differently per engine, DOUBLE finals hash bit-stably.
    f"CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty, "
    f"CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_price "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus"
)


@query("orc_roundtrip", _DUCK_ORC, tags=["source", "orc", "roundtrip"])
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC (snappy) → re-read → pricing-summary aggregate.

    The aggregate over the re-read equals the aggregate over the source
    parquet cell-for-cell (longs/doubles/strings are exact in ORC), so
    the oracle certifies the full write+read cycle, not just the agg."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice",
    )
    path = tempfile.mkdtemp(prefix="m2e_orc_")
    try:
        li.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        return _eager(
            back.groupBy("l_returnflag", "l_linestatus").agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                .alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                .alias("sum_price"),
            )
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# json_roundtrip
# --------------------------------------------------------------------------

_DUCK_JSON = (
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
    f"CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS sum_price, "
    "CAST(min(o_orderkey) AS BIGINT) AS min_key "
    "FROM orders GROUP BY o_orderpriority"
)

_JSON_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderpriority string"
)


@query("json_roundtrip", _DUCK_JSON, tags=["source", "json", "roundtrip"])
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ndjson → schema-pinned re-read → per-priority aggregate.

    Doubles survive exactly (Spark's JSON writer emits shortest-
    roundtrip representations); the explicit read schema is the 100 TB
    posture — inference would cost a full extra pass over the corpus."""
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority",
    )
    path = tempfile.mkdtemp(prefix="m2e_json_")
    try:
        od.write.mode("overwrite").json(path)
        back = spark.read.schema(_JSON_SCHEMA).json(path)
        return _eager(
            back.groupBy("o_orderpriority").agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
                .alias("sum_price"),
                F.min("o_orderkey").alias("min_key"),
            )
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# partition_pruned_scan
# --------------------------------------------------------------------------

_DUCK_PRUNE = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    f"CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value "
    "FROM events "
    "WHERE strftime(ts, '%Y-%m-%d') = "
    "  (SELECT min(strftime(ts, '%Y-%m-%d')) FROM events) "
    "GROUP BY event_type"
)


def _read_string_partitions(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table keeping partition values as STRINGS:
    inference would type '2024-01-01' as DATE and every comparison
    literal would need the same coercion on every engine version —
    strings compare bit-stably. The conf is restored afterwards
    (partition schema resolves eagerly at read time, so the flip need
    not outlive this call)."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        return spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# within-day write-salt sizing: one salt bucket per this many input
# bytes (≈ one output file's worth); module-level so tests can force
# the multi-bucket regime on small data
_SALT_TARGET_BYTES = 128 << 20


def _input_sz(uri: str) -> int:
    """Best-effort local-file size for write-fanout sizing (0 when not
    statable — the salt then stays at its floor of 1)."""
    import os as _os

    try:
        return _os.path.getsize(uri.removeprefix("file:"))
    except OSError:
        return 0


def build_partitioned_events(
    spark: SparkSession, sf_dir: str, path: str
) -> str:
    """Write events date-partitioned under ``path``; returns the minimum
    event_date string (the partition the demo query reads)."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    # cluster by the partition column before the partitioned write
    # (r17, guide §6 — the plain-parquet analogue of Iceberg's hash
    # distribution-mode): without it every input split writes a file
    # into EVERY day directory (splits x days files, and a single-split
    # local source serializes all the day files through one task —
    # measured 4.6-5.1s -> 2.1-3.9s at sf0.1, 30 days). One shuffle of
    # narrow event rows buys bounded files per day and parallel
    # commits; the day-equality read below is unchanged.
    #
    # r18 (guide §2.5, VERDICT r17 item 6): repartition("event_date")
    # alone caps write parallelism at the DAY cardinality (~30 tasks
    # whatever the cluster) and funnels a hot day through one task. A
    # deterministic within-day salt — ceil(input_bytes / 128 MB) splits
    # spread over the days, never more than the session's parallelism —
    # keeps ≤k files per day with k sized from the data. At sf0.1
    # (2 MB) k = 1, so the salt column is constant and the local plan
    # and file layout are unchanged; at corpus scale k grows with the
    # bytes and a hot day fans out over k tasks.
    src_bytes = sum(
        _input_sz(f) for f in ev.inputFiles()
    )
    # salt cardinality ~ one bucket per target-file's worth of input
    # (data-sized, not core-sized); the explicit partition COUNT keeps
    # at least full session concurrency — a column-only repartition is
    # REPARTITION_BY_COL, which AQE happily coalesces to one task on
    # small inputs, resurrecting the serialized write
    k = max(1, -(-src_bytes // _SALT_TARGET_BYTES))  # ceil-div
    n_tasks = max(spark.sparkContext.defaultParallelism, k)
    ev.repartition(
        n_tasks,
        F.col("event_date"),
        F.pmod(F.xxhash64("event_id"), F.lit(k)),
    ).write.mode("overwrite").partitionBy("event_date").parquet(path)
    # min over ONLY the partition column of the just-written table: the
    # partition values come from the directory listing (Spark's
    # metadata-only optimization), not a second corpus-sized scan of
    # the source
    return (
        _read_string_partitions(spark, path)
        .select("event_date")
        .agg(F.min("event_date"))
        .collect()[0][0]
    )


def read_pruned(spark: SparkSession, path: str, day: str) -> DataFrame:
    """One-partition read: the equality filter on the partition column
    resolves at PLANNING time (PartitionFilters, asserted in tests) —
    the scan lists exactly one directory regardless of table size."""
    return _read_string_partitions(spark, path).filter(
        F.col("event_date") == day
    )


@query(
    "partition_pruned_scan",
    _DUCK_PRUNE,
    tags=["source", "partitioning", "pruning"],
)
def q_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → date-partitioned parquet → single-partition filtered read
    → per-type aggregate. The layout pattern that turns time-ranged
    queries over a 100 TB event table into one-directory reads."""
    path = tempfile.mkdtemp(prefix="m2e_part_")
    try:
        day = build_partitioned_events(spark, sf_dir, path)
        pruned = read_pruned(spark, path, day)
        return _eager(
            pruned.groupBy("event_type").agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast(DEC)).cast("double")
                .alias("sum_value"),
            )
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# training_order
# --------------------------------------------------------------------------

_DUCK_ORDER = (
    "SELECT doc_id, CAST(row_number() OVER "
    "(ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS ord "
    "FROM documents"
)


@query("training_order", _DUCK_ORDER, tags=["sampling", "shuffle", "order"])
def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: every document's position in a
    seeded training order (rank of md5(doc_id), ties by id).

    Scale shape — the distributed zipWithIndex: a global
    row_number() window would sort the entire corpus on ONE reducer.
    Instead the hash's first byte buckets rows 256 ways; per-bucket
    counts (a 256-row aggregate) become broadcast prefix offsets, and
    rank = per-bucket row_number + offset. Bucket-by-hex-prefix keeps
    bucket order consistent with the global lexicographic hash order,
    so the result is IDENTICAL to the single-reducer window — each
    reducer sorts |corpus|/256 rows."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn(
        "bucket", F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    )
    counts = {
        r["bucket"]: r["n"]
        for r in keyed.groupBy("bucket").agg(F.count("*").alias("n"))
        .collect()
    }
    offs, acc = [0] * 256, 0
    for b in range(256):
        offs[b] = acc
        acc += counts.get(b, 0)
    # one parsed literal array (the bloom-bitmap lesson: element-wise
    # F.lit costs a py4j round trip per element)
    from ..functions.scalars import long_array_lit

    offs_lit = long_array_lit(offs)
    w = W.partitionBy("bucket").orderBy("h", "doc_id")
    return keyed.select(
        "doc_id",
        (
            F.row_number().over(w).cast("long")
            + F.element_at(offs_lit, F.col("bucket") + 1)
        ).alias("ord"),
    )


# --------------------------------------------------------------------------
# curriculum_stages
# --------------------------------------------------------------------------

_DUCK_NT = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    r"ELSE len(string_split_regex(trim(text), '\s+')) END"
)

_DUCK_CURRICULUM = f"""
WITH t AS (SELECT doc_id, {_DUCK_NT} AS nt FROM documents),
q AS (SELECT quantile_cont(nt, 0.25) AS q1, quantile_cont(nt, 0.50) AS q2,
             quantile_cont(nt, 0.75) AS q3 FROM t)
SELECT CAST(1 + CAST(nt > q1 AS INT) + CAST(nt > q2 AS INT)
              + CAST(nt > q3 AS INT) AS INT) AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS sum_tokens,
       CAST(min(nt) AS BIGINT) AS min_tokens,
       CAST(max(nt) AS BIGINT) AS max_tokens
FROM t CROSS JOIN q GROUP BY 1
"""


@query(
    "curriculum_stages",
    _DUCK_CURRICULUM,
    tags=["text", "curriculum", "sampling"],
)
def q_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum staging: exact R-7 quartiles of whitespace token
    count split the corpus into 4 stages (stage 1 = shortest quartile),
    the classic short→long curriculum schedule.

    Two bounded passes: ONE percentile aggregate (3 driver scalars),
    then a broadcast-free projection + 4-group aggregate. No window, no
    per-doc shuffle beyond the final 4-key agg."""
    docs = load_table(spark, "documents", sf_dir)
    nt = docs.select(
        "doc_id", X.token_count(F.col("text")).cast("long").alias("nt")
    )
    q1, q2, q3 = nt.agg(
        F.expr("percentile(nt, array(0.25, 0.50, 0.75))").alias("qs")
    ).collect()[0]["qs"]
    stage = (
        F.lit(1)
        + (F.col("nt") > q1).cast("int")
        + (F.col("nt") > q2).cast("int")
        + (F.col("nt") > q3).cast("int")
    ).cast("int")
    return (
        nt.select(stage.alias("stage"), "nt")
        .groupBy("stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("long").alias("sum_tokens"),
            F.min("nt").cast("long").alias("min_tokens"),
            F.max("nt").cast("long").alias("max_tokens"),
        )
    )
