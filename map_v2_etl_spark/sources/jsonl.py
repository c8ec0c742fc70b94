"""JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
training corpora (one document object per line, usually gzipped).

Not in the reference (its inputs are CSV + GeoJSON; /root/reference/
build.sh:75,105), but a first-class format for the engine's north-star
training-data pipeline surface: corpora arrive as *.jsonl.gz shards and
leave the same way.

Scale posture: Spark's JSON reader is splittable per file and parallel
across files; schema is DECLARED (never inferred) so a 100 TB read does
not pay a sampling pass and silently-missing keys become typed nulls.
Gzip files are non-splittable — one task per shard — which is the
standard corpus layout anyway (many ~100 MB-1 GB shards); the writer
emits one shard per partition to keep that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options,
) -> DataFrame:
    """Read newline-delimited JSON with a declared schema; `.gz` and glob
    paths work transparently. Keys absent from a line become null; keys
    absent from the schema are dropped (columnar pruning at parse time —
    the parser skips tokens it does not need).

    Malformed lines land in ``_corrupt_record`` when the schema declares
    it (PERMISSIVE default); pass ``mode="DROPMALFORMED"`` to filter
    them, or ``mode="FAILFAST"`` for strict ingestion.
    """
    return spark.read.schema(schema).options(**options).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    shards: int | None = None,
) -> None:
    """Write one JSONL shard per partition (`.json.gz` with the default
    compression). ``shards`` repartitions first — set it to control shard
    count/size (aim for ~100 MB-1 GB compressed per shard at scale).
    """
    if shards is not None and shards < 1:
        raise ValueError(f"shards must be >= 1: {shards}")
    out = df.repartition(shards) if shards is not None else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def documents_schema() -> T.StructType:
    """The engine's canonical document-corpus JSONL schema (matches the
    testdata `documents` table so parquet<->jsonl round-trips are
    lossless)."""
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
