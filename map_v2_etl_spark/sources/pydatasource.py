"""Python Data Source API (Spark 4.x) — an Arrow-batched parquet source.

The reference (/root/reference) reads its inputs through fixed ad-hoc
readers (CSV via csv-parser in shape-data.js:1-20, GeoJSON via node
streams); it has no pluggable-source surface at all. This module
demonstrates the engine's source EXTENSIBILITY axis with Spark's
first-class mechanism for it: the Python Data Source API
(`pyspark.sql.datasource`, SPARK-44076), the sanctioned way to plug a
custom format/system (an internal feed, a bespoke container format, a
metrics endpoint) into the DataFrame reader without JVM code.

Design points, all load-bearing for the 100 TB posture:

* **Partition planning mirrors parquet row groups.** `partitions()`
  lists the file set (a single file or a directory of part files) and
  emits one `InputPartition` per (file, row-group) — the same
  split-by-row-group parallelism Spark's native parquet scan plans, so
  a many-row-group corpus fans out across all executors; no partition
  ever materializes more than one row group.
* **The read path is Arrow batches, never Python rows.** `read()`
  yields `pyarrow.RecordBatch` directly from
  `ParquetFile.iter_batches`; Spark's Python data source runner
  forwards Arrow batches to the JVM without a per-row Python loop —
  the same batch-transfer discipline as the engine's pandas UDFs.
* **Manual column projection.** Python sources do not (yet) receive
  Catalyst's column pruning, so the source takes an explicit
  `columns` option and pushes the projection into the parquet reader
  itself (row groups decode only the requested column chunks). The
  docstring of the wave-22 query states this trade honestly: for
  formats Spark already speaks, the native reader with automatic
  pruning/pushdown is the right path; this API is for formats it
  doesn't.

Schema is resolved ONCE on the driver from the parquet footer at plan
time (`schema()`), so executors never re-infer types.
"""

from __future__ import annotations

import os
from glob import glob

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _file_list(path: str) -> list[str]:
    """A parquet dataset path is either one file or a directory of part
    files (Spark's own writer layout). Deterministic order: sorted."""
    if os.path.isdir(path):
        return sorted(glob(os.path.join(path, "*.parquet")))
    return [path]


class _RowGroupPartition(InputPartition):
    """One (file, row group) unit of parallel work. Plain picklable
    attributes only — this object ships to Python workers."""

    def __init__(self, path: str, row_group: int, columns: list[str] | None):
        self.path = path
        self.row_group = row_group
        self.columns = columns


class ArrowParquetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        cols = options.get("columns")
        self.columns = [c.strip() for c in cols.split(",")] if cols else None
        # read batch size: bounded executor memory per batch regardless
        # of row-group size (a 1 GiB row group streams as ~8k-row batches)
        self.batch_size = int(options.get("batch_size", "8192"))

    def partitions(self):  # planning: driver-side, metadata-only
        import pyarrow.parquet as pq

        parts: list[_RowGroupPartition] = []
        for f in _file_list(self.path):
            n = pq.ParquetFile(f).metadata.num_row_groups
            parts.extend(
                _RowGroupPartition(f, rg, self.columns) for rg in range(n)
            )
        return parts

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        # yields pyarrow.RecordBatch — the Arrow fast path through the
        # data source runner (no per-row Python iteration)
        yield from pf.iter_batches(
            batch_size=self.batch_size,
            row_groups=[partition.row_group],
            columns=partition.columns,
        )


class ArrowParquetDataSource(DataSource):
    """`spark.read.format("m2e_arrow_parquet").option("path", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "m2e_arrow_parquet"

    def schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _file_list(self.options["path"])
        arrow_schema = pq.ParquetFile(files[0]).schema_arrow
        cols = self.options.get("columns")
        if cols:
            names = [c.strip() for c in cols.split(",")]
            arrow_schema = pa.schema([arrow_schema.field(n) for n in names])
        return from_arrow_schema(arrow_schema)

    def reader(self, schema) -> DataSourceReader:
        return ArrowParquetReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces the entry, so
    every query call can register unconditionally — required because
    the driver's oracle harness constructs its own SparkSession)."""
    spark.dataSource.register(ArrowParquetDataSource)
