"""Wave-31 surface: streaming sketch maintenance and manifest-pruned
scans.

* stream_kmv_merge — wave-28's KMV sketch maintained INCREMENTALLY by
  the streaming engine: events replay through the custom streaming
  Python Data Source (sources/pystream.py) and each microbatch's
  per-type sketch MERGES into a running sketch snapshot
  (bottom_k(prev ∪ batch_sketch)). The final estimates must equal the
  from-scratch batch sketch — certified against the DuckDB oracle that
  computes the batch form directly. What this certifies is the
  MERGEABILITY theorem under real microbatching: bottom-k is
  associative/commutative (bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪
  bottom_k(B))), so the result is independent of how the stream
  happened to batch — the same class of claim as hll_merge_rollup
  (sketch algebra) and stream_foreach_batch_upsert (LWW algebra), now
  for the distinct-sketch family. At 100 TB this is how sketches are
  actually produced: per-ingest-batch partials merged into a stored
  summary, never a full-corpus rescan.

  Per-batch work: sketch(batch) touches only the batch; the merge
  touches only (k·types + k·types) sketch rows. Snapshot directories
  are keyed by batch id (the wave-24 idempotence discipline).

* manifest_pruned_scan — Iceberg/Delta-style FILE-LEVEL pruning from a
  stats manifest: the table is laid out as range-partitioned files,
  a manifest of per-file (min, max) key stats is read from the parquet
  FOOTERS (metadata only, never data), and a key-range predicate
  selects only the overlapping files — the pruned file list feeds the
  scan, and the result must equal the plain full-scan filter (the
  oracle). Spark's own parquet reader already skips row groups via
  footer stats once a file is OPEN; manifest pruning is the layer
  above — at 100 TB with millions of files it eliminates the file
  opens and footer reads themselves, which is precisely what
  Iceberg's manifest tree does at plan time. The pruning is asserted
  real in tests (fewer files scanned than exist) and result-invisible
  (oracle + test equality with the unpruned filter).

  The manifest build is a driver loop over the file list — bounded by
  file count, the same budget any table format's planner spends; data
  rows never reach the driver.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# stream_kmv_merge
# --------------------------------------------------------------------------

from ..operators.sketches import KMV_M as _M  # noqa: E402

_K = 64

# batch oracle: the from-scratch per-type KMV estimate over user_id —
# the streaming merge must land on exactly this
_DUCK_STREAM_KMV = f"""
WITH h AS (
  SELECT DISTINCT event_type AS t,
         CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
  FROM events),
sk AS (
  SELECT t, h FROM (
    SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM h)
  WHERE rn <= {_K}),
st AS (SELECT t, count(*) AS n_sk, max(h) AS kth FROM sk GROUP BY t)
SELECT t AS event_type,
  CAST(ROUND(CASE WHEN n_sk < {_K} THEN CAST(n_sk AS DOUBLE)
       ELSE {_K - 1}.0 * ({_M!r} / CAST(kth AS DOUBLE)) END) AS BIGINT)
    AS est_users
FROM st
"""


def _stream_kmv(
    spark: SparkSession, sf_dir: str, batch_rows: int
) -> DataFrame:
    """Body of stream_kmv_merge with the microbatch size as a
    parameter — the batch-boundary-independence test drives it at a
    different size and must land on identical estimates."""
    from ..operators import sketches as S
    from ..sources import pystream

    pystream.register(spark)
    root = tempfile.mkdtemp(prefix="m2e_skmv_")
    state = {"v": -1}
    rank = F.row_number().over(W.partitionBy("event_type").orderBy("h"))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = S.kmv_sketch(batch_df, "event_type", "user_id", _K)
        prev_v = batch_id - 1
        if prev_v >= 0:
            prev = spark.read.parquet(os.path.join(root, f"v={prev_v}"))
            # sketch merge: union partials, re-truncate to bottom-k —
            # the associative fold that makes the result independent
            # of microbatch boundaries
            part = (
                prev.unionByName(part)
                .distinct()
                .withColumn("rn", rank)
                .filter(F.col("rn") <= _K)
                .drop("rn")
            )
        part.write.mode("overwrite").parquet(
            os.path.join(root, f"v={batch_id}")
        )
        state["v"] = max(state["v"], batch_id)

    try:
        stream = (
            spark.readStream.format("m2e_parquet_replay")
            .option("path", os.path.join(sf_dir, "events.parquet"))
            .option("columns", "event_id,user_id,event_type")
            .option("batch_rows", str(batch_rows))
            .load()
        )
        q = stream.writeStream.foreachBatch(merge_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = spark.read.parquet(os.path.join(root, f"v={state['v']}"))
        out = S.kmv_stats(final, "event_type", _K).select(
            "event_type", F.col("est").alias("est_users")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "stream_kmv_merge",
    _DUCK_STREAM_KMV,
    tags=["streaming", "sketch", "kmv", "merge"],
)
def q_stream_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → streaming replay → per-microbatch KMV partial sketches
    merged into a running snapshot → final per-type distinct-user
    estimates (module docstring)."""
    return _stream_kmv(spark, sf_dir, 4096)


# --------------------------------------------------------------------------
# manifest_pruned_scan
# --------------------------------------------------------------------------

_N_FILES = 8
_LO, _HI = 120, 260  # doc_id key range, present at every fixture SF

_DUCK_MANIFEST = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE doc_id BETWEEN {_LO} AND {_HI}
GROUP BY lang
"""


def _write_range_layout(docs: DataFrame, path: str) -> None:
    """Range-partitioned file layout: each part file owns a contiguous
    doc_id slice (what makes per-file min/max stats selective)."""
    (
        docs.repartitionByRange(_N_FILES, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )


def _manifest(path: str) -> list[dict]:
    """Per-file key stats from the parquet footers — metadata-only
    (column-chunk statistics), no data pages read."""
    import pyarrow.parquet as pq
    from glob import glob as _glob

    entries = []
    for f in sorted(_glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "doc_id"
            )
            st = col.statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        entries.append({"file": f, "min": lo, "max": hi})
    return entries


@query(
    "manifest_pruned_scan",
    _DUCK_MANIFEST,
    tags=["scan", "manifest", "pruning", "layout"],
)
def q_manifest_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-manifest file pruning (module docstring): range layout →
    footer-stats manifest → read ONLY files overlapping the key range →
    aggregate; equals the plain filtered scan."""
    out = tempfile.mkdtemp(prefix="m2e_manifest_")
    try:
        docs = load_table(spark, "documents", sf_dir).select(
            "doc_id", "lang", "n_chars"
        )
        _write_range_layout(docs, out)
        manifest = _manifest(out)
        selected = [
            e["file"]
            for e in manifest
            if e["min"] <= _HI and e["max"] >= _LO
        ]
        if not selected:  # defensive: predicate outside the key space
            return docs.filter(F.lit(False)).groupBy("lang").agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
        pruned = spark.read.parquet(*selected)
        return (
            pruned.filter(F.col("doc_id").between(_LO, _HI))
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
