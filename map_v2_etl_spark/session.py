"""SparkSession factory.

Single place where execution knobs live so every entry point (tests, bench,
driver contract) gets the same tuned session. Defaults target the local[N]
harness but are written for a multi-executor cluster: AQE on (runtime
coalescing + skew-join handling), shuffle partitions sized to cores instead
of the 200 default, Arrow enabled for the Pandas-UDF slow path, UTC session
timezone so results compare cleanly against UTC-naive oracles (DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "map_v2_etl_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster the ``master`` is supplied by spark-submit and the
    ``local[...]`` default below is ignored; everything else carries over.
    """
    cpus = cpus or _DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert at the source boundary
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # single-JVM local mode: the "driver" heap IS the executor heap.
        # 8g starves 32 concurrent tasks on wide workloads (573-column
        # parquet writers + pivot buffers -> TASK_WRITE_FAILED); size for
        # cores x widest-operator working set, not the classic small
        # cluster-driver heuristic.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    # spark-submit sets spark.master in the SparkConf (NOT an env var);
    # builder.master() would override it and silently run a cluster job
    # single-node on the driver host — only default to local[N] when no
    # master is configured anywhere
    from pyspark import SparkConf

    has_master = SparkConf().contains("spark.master") or os.environ.get(
        "SPARK_MASTER"
    )
    if not has_master:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
