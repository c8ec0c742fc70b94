"""CSV source/sink with the reference's conventions (SURVEY.md §2.1).

Read side (S2/S3): header row, declared schema (never inferSchema in the
engine), empty string -> null (PapaParse leaves blanks as "" and the
numeric edge drops them — null + null-ignoring aggregates reproduces that,
/root/reference/scripts/extract-extents.js:24-27), transparent .gz.

Write side (S5): the reference emits ONE file, header first, rows sorted
(shape-data.js:105-124). A distributed engine writes a directory of parts;
``write_sorted_csv`` provides the compatibility single-file sink for small
outputs (extents ~100 rows, per-region wide tables) while ``write_csv_dir``
is the scale path (sorted within partitions via repartitionByRange, so a
downstream merge preserves global order).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_long_csv(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """Header CSV bound BY NAME to the declared schema; blanks -> null; .gz ok.

    Spark's ``.schema()`` on CSV binds positionally, but the reference binds
    by header name (PapaParse ``header: true``, shape-data.js:76) and its
    inputs carry extra columns that must be silently dropped. So: peek at
    the header, read every file column as string in file order, then
    select+cast the declared columns by name (missing declared columns
    become null, undeclared file columns are dropped — matching
    shape-data.js:33).
    """
    import csv as _csv

    header_line = spark.read.text(path).limit(1).collect()[0][0]
    # csv.reader honors quoting — a naive split(',') mis-parses quoted
    # header names containing commas or escaped quotes (round-1 advice)
    file_cols = next(_csv.reader([header_line]))
    raw_schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in file_cols]
    )
    raw = (
        spark.read.option("header", True)
        .option("nullValue", "")
        .option("emptyValue", "")
        .schema(raw_schema)
        .csv(path, **options)
    )
    from pyspark.sql import functions as F

    cols = []
    for f in schema.fields:
        if f.name in file_cols:
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return raw.select(*cols)


def write_csv_dir(df: DataFrame, path: str, sort_cols: list[str], compression: str | None = None):
    """Scale sink: range-partitioned so part files are globally ordered."""
    writer = (
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("header", True)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)


def write_sorted_csv(df: DataFrame, path: str, sort_cols: list[str] | None):
    """Compatibility sink: one CSV file, header, globally sorted rows.

    Coalesce to ONE partition first, then sortWithinPartitions: for a
    single partition that is a total order, and it avoids orderBy's
    range-partition sampling pass, which re-evaluates the whole child
    plan (doubling observe() metrics and any non-deterministic work).
    Only appropriate for outputs that fit one file by design.
    ``sort_cols=None`` preserves the DataFrame's existing order (for plans
    that already end in an orderBy, e.g. extents' input-column order).
    """
    tmp = tempfile.mkdtemp(prefix="m2e_csv_")
    try:
        (
            (
                df.coalesce(1).sortWithinPartitions(*sort_cols)
                if sort_cols
                else df.coalesce(1)
            )
            .write.mode("overwrite")
            .option("header", True)
            .csv(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        shutil.move(part, path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
