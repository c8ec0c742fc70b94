"""CSV source/sink with the reference's conventions (SURVEY.md §2.1).

Read side (S2/S3): header row, declared schema (never inferSchema in the
engine), empty string -> null (PapaParse leaves blanks as "" and the
numeric edge drops them — null + null-ignoring aggregates reproduces that,
/root/reference/scripts/extract-extents.js:24-27), transparent .gz.

Write side (S5): the reference emits ONE file, header first, rows sorted
(shape-data.js:105-124). A distributed engine writes a directory of parts;
``write_sorted_csv`` provides the compatibility single-file sink for small
outputs (extents ~100 rows, per-region wide tables) while ``write_csv_dir``
is the scale path (sorted within partitions via repartitionByRange, so the
part files are globally ordered).
"""

from __future__ import annotations

import csv as _csv
import glob
import gzip
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _first_line(p: str) -> str:
    opener = gzip.open if p.endswith(".gz") else open
    with opener(p, "rt", encoding="utf-8", errors="replace") as fh:
        return fh.readline().rstrip("\r\n")


def _peek_header_cols(
    spark: SparkSession, path: str, sep: str, quote: str
) -> list[str]:
    """Column list from the header row(s) of ``path``.

    For local files/directories every file's header is read and they
    must AGREE: the raw read below binds positionally per file, so a
    directory mixing column orders would silently cross-map values
    (verified failure mode — part2 with a swapped header read its name
    column into id). Non-local paths (object stores) peek the first
    line Spark sees; multi-file consistency is the writer's contract
    there."""
    local: list[str] | None = None
    if os.path.isdir(path):
        local = sorted(
            p
            for p in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(p)
            and not os.path.basename(p).startswith((".", "_"))
        )
        if not local:
            raise ValueError(f"no CSV files under directory: {path}")
    elif os.path.isfile(path):
        local = [path]

    def parse(line: str, src: str) -> list[str]:
        if not line:
            raise ValueError(f"empty CSV (no header row): {src}")
        # csv.reader honors quoting — a naive split(',') mis-parses
        # quoted header names containing commas or escaped quotes
        # (round-1 advice); the caller's sep/quote options apply to the
        # header exactly as they do to the data read
        return next(_csv.reader([line], delimiter=sep, quotechar=quote))

    if local is not None:
        headers = [parse(_first_line(p), p) for p in local]
        for p, h in zip(local[1:], headers[1:]):
            if h != headers[0]:
                raise ValueError(
                    f"inconsistent CSV headers under {path}: "
                    f"{local[0]} has {headers[0]} but {p} has {h} — "
                    "positional binding would corrupt data"
                )
        return headers[0]
    rows = spark.read.text(path).limit(1).collect()
    if not rows:
        raise ValueError(f"empty CSV (no header row): {path}")
    return parse(rows[0][0], path)


def read_long_csv(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """Header CSV bound BY NAME to the declared schema; blanks -> null; .gz ok.

    Spark's ``.schema()`` on CSV binds positionally, but the reference binds
    by header name (PapaParse ``header: true``, shape-data.js:76) and its
    inputs carry extra columns that must be silently dropped. So: peek at
    the header (every file's header for local dirs — they must agree),
    read every file column as string in file order, then select+cast the
    declared columns by name (missing declared columns become null,
    undeclared file columns are dropped — matching shape-data.js:33).
    """
    sep = options.get("sep", options.get("delimiter", ","))
    quote = options.get("quote", '"')
    file_cols = _peek_header_cols(spark, path, sep, quote)
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
    cols = []
    for f in schema.fields:
        if f.name in file_cols:
            # backtick-quote (with `` escaping) so headers containing
            # dots don't parse as struct-field access and embedded
            # backticks stay literal
            q = f.name.replace("`", "``")
            cols.append(
                F.col(f"`{q}`").try_cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return raw.select(*cols)


def write_csv_dir(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    compression: str | None = None,
    header: bool = True,
):
    """Scale sink: range-partitioned so part files are globally ordered.

    With ``header=True`` (default) EVERY part file carries its own
    header row — correct for per-file consumption (Spark/DuckDB/pandas
    readers), but a raw byte-level ``cat part-*`` merge would interleave
    header lines mid-data. For a cat-style merge pass ``header=False``
    and prepend one header line yourself (or strip line 1 of every part
    after the first)."""
    writer = (
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("header", header)
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
    if os.path.isdir(path):
        # shutil.move into an existing DIRECTORY would silently drop the
        # part file inside it under its temp name instead of replacing
        raise ValueError(
            f"write_sorted_csv target is an existing directory: {path}"
        )
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


def write_csv_stdout(
    df: DataFrame,
    sort_cols: list[str] | None,
    out=None,
    batch_rows: int = 10_000,
):
    """S6 stdout sink: the reference streams the SAME CSV it would
    write to a file when no output path is given (shape-data.js:82,
    extract-extents.js:58 — ``outputFile ? fs.write : console.log``).

    Byte-identical to ``write_sorted_csv`` (test-pinned): the rows are
    serialized by Spark's OWN CSV writer into a temp file — not
    re-rendered driver-side, which would re-implement Spark's
    quoting/float-formatting rules and drift — then streamed to ``out``
    (default ``sys.stdout``) in bounded chunks. A driver-side
    ``toLocalIterator`` + python csv render was rejected for exactly
    that drift risk; the temp-file hop costs one local write of an
    output that is by contract small enough for a single file (the
    same bound as write_sorted_csv).
    """
    import sys

    out = out if out is not None else sys.stdout
    tmp = tempfile.mkdtemp(prefix="m2e_csv_stdout_")
    tmp_file = os.path.join(tmp, "out.csv")
    try:
        write_sorted_csv(df, tmp_file, sort_cols)
        with open(tmp_file, "rt", encoding="utf-8") as fh:
            while True:
                chunk = fh.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
