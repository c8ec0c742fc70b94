"""Wave-23 surface: a streaming Python Data Source, Arrow-native group
transforms, and dynamic partition pruning.

The reference (/root/reference) has none of these; they extend the
engine along the same axis as waves 21–22 — NEW PLAN SHAPES / NEW
EXECUTION SURFACES rather than new domains:

* stream_python_datasource — the STREAMING side of the Python Data
  Source API (`sources/pystream.py`): a custom
  `DataSourceStreamReader` replays events as a sequence of real
  microbatches (offset dict → per-batch partition planning →
  executor-side Arrow reads → commit), driven through a genuine
  `readStream ... writeStream` query into the memory sink. The result
  is the per-type count/sum aggregate in complete mode, so the oracle
  is plain batch SQL — what gets hash-certified is that N microbatches
  of offset-ranged replay compose to EXACTLY the batch answer (the
  exactly-once contract, observable). The multi-microbatch property
  itself (not one giant batch) is pinned in tests/test_wave23.py via
  query progress.

* arrow_group_transform — `groupBy().applyInArrow`: the Arrow-native
  grouped transform (no pandas conversion at all — the UDF receives a
  `pyarrow.Table` per group). Exact per-language median via sorted-
  array midpoint (= the R-7/linear interpolation DuckDB's median
  applies, so the float is bit-identical), plus count/sum. Honest
  scale note: applyInPandas/applyInArrow materialize EACH GROUP in one
  task — right for bounded groups (models, codecs, per-entity fits);
  for unbounded groups the engine's built-in percentile operators
  (operators/extents.py) are the path. This query certifies the
  SURFACE on a 5-group table where the bound holds by construction.

* dynamic_partition_pruning — the runtime-pruning plan shape: a
  date-partitioned fact joined to a filtered dim on the partition
  column. The dim keeps dates whose TOTAL EVENT COUNT is odd — a
  deliberately data-dependent predicate, because a predicate that is a
  deterministic expression of the join key (a date-arithmetic filter,
  a pmod of the key) gets inferred onto the fact STATICALLY by
  Catalyst's constraint propagation and prunes at plan time with no
  DPP involved at all (measured while building bench_scale's dpp op —
  the A/B collapsed to 1.0x until the dim went opaque). With a
  count-based predicate only runtime pruning can skip fact
  directories: Catalyst inserts a dynamicpruning#N subquery into the
  fact scan's PartitionFilters, the dim executes first, and the scan
  lists ONLY surviving date directories — at 100 TB the difference
  between reading half the table and all of it. The physical-plan
  presence of `dynamicpruning` is asserted in tests/test_wave23.py;
  the oracle recomputes the semantics (dates with odd counts) from
  events. Measured at generated scale in bench_scale.py (`dpp` op):
  2.1-2.3x wall over the full scan at 7-15 GB fixtures, gap growing
  with size (the byte ratio, 6x there, is the cluster-transferable
  number — local page-cache decode understates it).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

DEC = "decimal(20,4)"


def _eager(df: DataFrame) -> DataFrame:
    """Materialize now so temp dirs backing the plan can be deleted."""
    return df.localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# stream_python_datasource
# --------------------------------------------------------------------------

_DUCK_STREAM_PYDS = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    f"CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value "
    "FROM events GROUP BY event_type"
)


@query(
    "stream_python_datasource",
    _DUCK_STREAM_PYDS,
    tags=["streaming", "source", "datasource-api", "arrow"],
)
def q_stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events replayed through the custom streaming Python Data Source
    (microbatched offset ranges, executor-side Arrow reads) → complete-
    mode per-type aggregate in the memory sink. See module docstring."""
    import os

    from ..sources import pystream

    pystream.register(spark)
    stream = (
        spark.readStream.format("m2e_parquet_replay")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("columns", "event_id,event_type,value")
        .option("batch_rows", "4096")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )
    name = "m2e_replay_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # localCheckpoint: the memory-sink table is owned by the (stopped)
    # query; pin the rows before returning
    return _eager(spark.table(name))


# --------------------------------------------------------------------------
# arrow_group_transform
# --------------------------------------------------------------------------

_DUCK_ARROW_GROUP = (
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(median(n_chars) AS DOUBLE) AS median_chars, "
    "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
    "FROM documents GROUP BY lang"
)


def _lang_stats_arrow(key, tbl):
    """Per-group pyarrow.Table -> pyarrow.Table; numpy sorted-midpoint
    median == linear-interpolated quantile(0.5) == DuckDB median.
    Ints sum exactly; the midpoint of two int64s is an exact double
    for values < 2^52."""
    import numpy as np
    import pyarrow as pa

    x = np.sort(tbl.column("n_chars").to_numpy())
    n = len(x)
    med = (float(x[(n - 1) // 2]) + float(x[n // 2])) / 2.0
    return pa.table(
        {
            "lang": pa.array([key[0]], pa.string()),
            "n_docs": pa.array([n], pa.int64()),
            "median_chars": pa.array([med], pa.float64()),
            "sum_chars": pa.array([int(x.sum())], pa.int64()),
        }
    )


@query(
    "arrow_group_transform",
    _DUCK_ARROW_GROUP,
    tags=["udf", "arrow", "applyInArrow", "groups"],
)
def q_arrow_group_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(lang).applyInArrow — the Arrow-native grouped transform
    surface (no pandas layer). See module docstring for the
    bounded-group contract this rides on."""
    docs = load_table(spark, "documents", sf_dir).select("lang", "n_chars")
    return docs.groupBy("lang").applyInArrow(
        _lang_stats_arrow,
        schema="lang string, n_docs bigint, median_chars double, "
               "sum_chars bigint",
    )


# --------------------------------------------------------------------------
# dynamic_partition_pruning
# --------------------------------------------------------------------------

_DUCK_DPP = (
    "WITH f AS (SELECT strftime(ts, '%Y-%m-%d') AS event_date, value "
    "           FROM events), "
    "keep AS (SELECT event_date FROM f GROUP BY event_date "
    "         HAVING count(*) % 2 = 1) "
    "SELECT event_date, CAST(count(*) AS BIGINT) AS n, "
    f"CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value "
    "FROM f JOIN keep USING (event_date) "
    "GROUP BY event_date"
)


def dpp_join(fact: DataFrame, dim: DataFrame) -> DataFrame:
    """fact (partitioned by event_date) ⋈ filtered dim on the partition
    column → per-date aggregate. Separated from the fixture writing so
    tests can assert the dynamicpruning subquery on this exact plan."""
    return (
        fact.join(dim, "event_date")
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


def build_dpp_frames(
    spark: SparkSession, sf_dir: str, path: str
) -> tuple[DataFrame, DataFrame]:
    """Write the date-partitioned fact and derive the filtered dim.

    The dim keeps dates with an ODD total event count — a
    data-dependent predicate the optimizer CANNOT infer onto the fact
    statically (a key-derivable predicate would static-prune and make
    the DPP machinery dead weight; see module docstring). The dim is
    computed from the source events table, the fact from the
    partitioned copy, so the pruning subquery is a genuinely
    independent relation as in a real star schema."""
    from .queries_wave17 import _read_string_partitions, build_partitioned_events

    build_partitioned_events(spark, sf_dir, path)
    fact = _read_string_partitions(spark, path)
    dim = (
        load_table(spark, "events", sf_dir)
        .select(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("n_day"))
        .filter(F.pmod(F.col("n_day"), F.lit(2)) == 1)
        .select("event_date")
    )
    return fact, dim


@query(
    "dynamic_partition_pruning",
    _DUCK_DPP,
    tags=["join", "partitioning", "dpp", "pruning"],
)
def q_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime partition pruning: the fact scan lists only the date
    directories surviving the dim's filter. See module docstring."""
    path = tempfile.mkdtemp(prefix="m2e_dpp_")
    try:
        fact, dim = build_dpp_frames(spark, sf_dir, path)
        return _eager(dpp_join(fact, dim))
    finally:
        shutil.rmtree(path, ignore_errors=True)
