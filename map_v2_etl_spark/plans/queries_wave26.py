"""Wave-26 surface: table-maintenance operations (compaction, vacuum).

The reference (/root/reference) rebuilds its outputs from scratch every
run (build.sh is a batch pipeline); a 100 TB lakehouse table instead
accretes state and needs MAINTENANCE jobs — the two canonical ones:

* compact_small_files — the small-file problem: streaming sinks and
  frequent batch appends leave thousands of KB-scale part files, and
  at scan time every file costs a task schedule + open + footer read
  (a 100 TB table fragmented into 1 MB files is ~10^8 scheduling units
  — the scan dies of overhead before it reads a byte). Compaction
  rewrites the fragmented table into target-sized files: list the
  fragment sizes (driver-side METADATA listing, bounded by file count),
  pick ceil(total_bytes / target) output files, one shuffle-free…
  rather: one `repartition(n)` rewrite (round-robin — even output
  sizes, the point of compaction), swap directories. The certified
  output is the content aggregate read FROM THE COMPACTED table, so
  the oracle (plain aggregate over documents) proves the rewrite lost
  and duplicated nothing; the file-count contract (32 fragments → the
  computed bin count) is test-pinned in tests/test_wave26.py.

* snapshot_vacuum — retention for the wave-21 versioned snapshot log:
  old versions exist for time travel, but unbounded retention is
  unbounded storage; vacuum deletes versions older than the retention
  window while every SURVIVING version stays a self-contained readable
  checkpoint (the wave-21 design of full-state snapshots — not delta
  chains — is exactly what makes vacuum a pure directory delete with
  no rewrite). The query builds v1<v2<v3 from three event-log cutoffs,
  vacuums with keep=2 (v1 deleted), and returns the union of the
  surviving versions' reads; the oracle recomputes v2 and v3 from the
  full log. v1's physical deletion is test-pinned.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query


def _eager(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# compact_small_files
# --------------------------------------------------------------------------

_DUCK_COMPACT = (
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
    "FROM documents GROUP BY lang"
)


def fragment_table(spark: SparkSession, sf_dir: str, path: str, n: int) -> None:
    """Fixture: documents scattered across n small part files — the
    state a high-frequency append/streaming sink leaves behind."""
    load_table(spark, "documents", sf_dir).repartition(n).write.mode(
        "overwrite"
    ).parquet(path)


def plan_compaction(path: str, target_bytes: int) -> int:
    """Driver-side planning from the file LISTING only (no data read):
    number of output files = ceil(total_bytes / target), floor 1."""
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    return max(1, -(-total // target_bytes))


def compact(spark: SparkSession, src: str, dst: str, target_bytes: int) -> int:
    """Rewrite src's fragments into ~target-sized files at dst; returns
    the output file count. repartition (round-robin), not coalesce:
    coalesce glues whole input partitions and inherits their skew —
    even output sizes are the point of compaction."""
    n_out = plan_compaction(src, target_bytes)
    spark.read.parquet(src).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(dst)
    return n_out


@query(
    "compact_small_files",
    _DUCK_COMPACT,
    tags=["maintenance", "compaction", "layout"],
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-fragment documents table → size-targeted compaction →
    aggregate read from the COMPACTED copy (oracle = the source of
    truth, so the rewrite is proved lossless). See module docstring."""
    root = tempfile.mkdtemp(prefix="m2e_compact_")
    frag, tight = os.path.join(root, "frag"), os.path.join(root, "tight")
    try:
        fragment_table(spark, sf_dir, frag, 32)
        compact(spark, frag, tight, target_bytes=8 << 20)
        return _eager(
            spark.read.parquet(tight)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# snapshot_vacuum
# --------------------------------------------------------------------------

_CUTS = ["2024-01-10 00:00:00", "2024-01-15 00:00:00", "2024-01-20 00:00:00"]

_DUCK_VACUUM = f"""
WITH r2 AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_CUTS[1]}'),
r3 AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_CUTS[2]}')
SELECT CAST(2 AS INTEGER) AS version, user_id,
       event_type AS last_type, value AS last_value
FROM r2 WHERE rn = 1 AND event_type <> 'error'
UNION ALL
SELECT CAST(3 AS INTEGER) AS version, user_id,
       event_type AS last_type, value AS last_value
FROM r3 WHERE rn = 1 AND event_type <> 'error'
"""


def build_snapshots(spark: SparkSession, sf_dir: str, root: str) -> None:
    """v1..v3 from the three cutoffs — each a SELF-CONTAINED full-state
    checkpoint (wave-21 _compact shape), each derived incrementally
    from its predecessor + the inter-cutoff delta."""
    from .queries_wave21 import _compact

    ev = load_table(spark, "events", sf_dir)
    prev = None
    for v, cut in enumerate(_CUTS, start=1):
        cutoff = F.lit(cut).cast("timestamp_ntz")
        if prev is None:
            snap = _compact(ev.filter(F.col("ts") <= cutoff))
        else:
            lo = F.lit(_CUTS[v - 2]).cast("timestamp_ntz")
            delta = _compact(
                ev.filter((F.col("ts") > lo) & (F.col("ts") <= cutoff))
            )
            snap = _compact(
                spark.read.parquet(prev).unionByName(delta)
            )
        path = os.path.join(root, f"v={v}")
        snap.write.mode("overwrite").parquet(path)
        prev = path


def vacuum(root: str, keep: int) -> list[int]:
    """Delete all but the newest `keep` versions; returns the deleted
    version numbers. A pure directory delete — no rewrite — because
    snapshots are checkpoints, not delta chains."""
    versions = sorted(
        int(d.split("=")[1])
        for d in os.listdir(root)
        if d.startswith("v=")
    )
    doomed = versions[:-keep] if keep > 0 else versions
    for v in doomed:
        shutil.rmtree(os.path.join(root, f"v={v}"), ignore_errors=True)
    return doomed


@query(
    "snapshot_vacuum",
    _DUCK_VACUUM,
    tags=["maintenance", "vacuum", "time-travel", "retention"],
)
def q_snapshot_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1..v3 snapshot log → vacuum(keep=2) → union of surviving
    version reads. See module docstring."""
    from .queries_wave21 import _read_version

    root = tempfile.mkdtemp(prefix="m2e_vac_")
    try:
        build_snapshots(spark, sf_dir, root)
        deleted = vacuum(root, keep=2)
        assert deleted == [1], deleted
        return _eager(
            _read_version(spark, root, 2).unionByName(
                _read_version(spark, root, 3)
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
