"""Parquet layout management — the engine's internal storage format.

SURVEY §7.7 scale posture: "Parquet everywhere internally, partition by
region/year". Two layouts:

  * ``write_partitioned`` — hive-style directory partitioning; reads with
    a partition-column predicate prune whole directories (visible as
    PartitionFilters in the scan node), the columnar reader prunes
    columns, and ordinary predicates push down to row groups.
  * ``write_bucketed`` — pre-shuffled, hash-bucketed table layout: two
    tables bucketed on the same key join WITHOUT an exchange on either
    side — the shuffle is paid once at write time, then every downstream
    join/aggregation on that key is shuffle-free. This is the cluster
    answer to repeated joins against a 100 TB fact table.

The reference's decade sharding (/root/reference/build.sh:34-36,163) is
the same idea done by hand with csvcut; here it is partitionBy("decade")
and partition pruning replaces the file naming convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Hive-layout parquet: one directory per partition-column value."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition columns come back as real columns; predicates on them
    prune directories before any file is opened."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) managed table.

    Joins and aggregations keyed on ``bucket_cols`` between tables with
    the same bucketing skip the exchange entirely; with ``sort_cols`` a
    sort-merge join also skips the sort."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> int:
    """Small-file compaction — the maintenance job every long-lived
    table needs: streaming/incremental writers accumulate many small
    files, and small files tax the scan planner (one task each), the
    file index, and S3 listing.

    Reads the directory, sizes the target file count from the CURRENT
    on-disk bytes (`inputFiles` + filesystem stat — metadata only, no
    data pass), rewrites with coalesce (narrow — no shuffle; compaction
    must not pay a network pass just to concatenate), then swaps the
    new directory in through rename-aside: old -> *.old, tmp -> path,
    delete *.old. Every intermediate state leaves a readable directory
    at SOME path (a crash can strand *.old / *.tmp, never lose data),
    unlike delete-then-rename which has a window with no data at all.

    LOCAL-FILESYSTEM, OFFLINE maintenance only: the swap relies on
    POSIX rename atomicity and `os.path.getsize`, and a concurrent
    reader that resolved file paths before the swap will still miss
    them after it. On object storage / live tables this job belongs to
    a table format's OPTIMIZE (Iceberg/Delta), which swaps snapshots
    in metadata instead of renaming directories.

    At cluster scale the same routine runs per partition directory
    (compact the partitions whose file count exceeds a threshold).
    """
    import glob
    import os
    import shutil

    df = spark.read.parquet(path)
    files = [f.replace("file:", "") for f in df.inputFiles()]
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    norm = path.rstrip("/")
    tmp = norm + ".compact.tmp"
    old = norm + ".compact.old"
    (
        df.coalesce(int(n_target))
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(tmp)
    )
    if os.path.exists(old):  # stranded by an earlier crash
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "part-*.parquet")))


def write_zordered(
    df: DataFrame,
    path: str,
    zkey_col: str,
    num_files: int,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Z-order-clustered parquet (see plans/queries_wave6.zorder_layout
    for the key construction): range-partition on the Morton key, sort
    within each partition, drop the key from the files.

    ``repartitionByRange`` uses a sampled range exchange — NOT a global
    sort — so the write scales like any shuffle while every output
    file covers a compact Z-curve segment. Because the curve interleaves
    both source dimensions, each file's row-group min/max stats are
    tight on BOTH columns, and a reader's predicate on either one skips
    most files (asserted against the footer stats in
    tests/test_wave6.py).
    """
    (
        df.repartitionByRange(num_files, zkey_col)
        .sortWithinPartitions(zkey_col)
        .drop(zkey_col)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )
