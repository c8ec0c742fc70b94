"""Wave-37 surface: the Write-Audit-Publish (WAP) table deployment
pattern.

* write_audit_publish — the table-level two-phase commit that guards
  production datasets (popularized by Netflix on Iceberg; the
  task-level analogue is the custom writer's temp-file protocol,
  sources/pydatasource.py): the new table version is written to a
  STAGING location, audited there (row count, null-key check, domain
  constraint — the checks run against staged files, so a bad batch
  can never have been visible), and PUBLISHED by a single atomic
  directory rename only if every audit passes; a failed audit leaves
  the staging directory for forensics and the published table
  untouched (test-pinned with a deliberately poisoned batch).

  The certified query runs the happy path end-to-end — documents →
  staged per-lang aggregate → audits → publish → read back from the
  PUBLISHED location — so the oracle certifies that what readers see
  after a publish is exactly the source-of-truth state. Audit results
  ride along as columns (audit names + booleans), making the gate
  part of the certified surface rather than a side effect.

  Scale notes: auditing the STAGED FILES (not the pre-write
  DataFrame) is the load-bearing choice — it validates what was
  actually serialized (codec bugs, schema coercions, partial writes
  all surface), at the cost of one extra scan of the staged output,
  which is version-sized, not history-sized. The publish itself is
  metadata-only (one rename on a filesystem, an atomic pointer swap
  in a real table format). On object stores without atomic rename the
  same pattern rides the table format's commit protocol — which is
  precisely what Iceberg's WAP branch/cherry-pick implements.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

_DUCK_WAP = """
WITH agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY lang)
SELECT lang, n_docs, sum_chars,
       TRUE AS audit_nonempty, TRUE AS audit_no_null_keys,
       TRUE AS audit_positive_counts
FROM agg
"""


class AuditFailure(RuntimeError):
    """Raised when a staged version fails its audits; the staging
    directory is LEFT IN PLACE for forensics and the published
    location is untouched."""


def run_audits(staged: DataFrame) -> dict[str, bool]:
    """The audit battery over a STAGED per-lang aggregate. One pass
    (single collect of a 1-row aggregate)."""
    row = staged.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("lang").isNull().cast("int")).alias("null_keys"),
        F.sum((F.col("n_docs") <= 0).cast("int")).alias("bad_counts"),
    ).first()
    return {
        "audit_nonempty": row["rows"] > 0,
        "audit_no_null_keys": (row["null_keys"] or 0) == 0,
        "audit_positive_counts": (row["bad_counts"] or 0) == 0,
    }


def write_audit_publish(
    df: DataFrame, table_root: str, version: str
) -> dict[str, bool]:
    """Stage → audit → atomically publish (module docstring). Returns
    the audit results; raises AuditFailure (staging retained,
    published untouched) when any audit fails."""
    staging = os.path.join(table_root, f"_staging_{version}")
    published = os.path.join(table_root, version)
    df.write.mode("overwrite").parquet(staging)
    audits = run_audits(df.sparkSession.read.parquet(staging))
    if not all(audits.values()):
        raise AuditFailure(
            f"staged version {version!r} failed audits {audits}; "
            f"staging retained at {staging}"
        )
    os.replace(staging, published)  # the atomic pointer swap
    return audits


@query(
    "write_audit_publish",
    _DUCK_WAP,
    tags=["deployment", "wap", "audit", "sink"],
)
def q_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAP happy path: stage, audit, publish, read back from the
    published location (module docstring)."""
    root = tempfile.mkdtemp(prefix="m2e_wap_")
    try:
        agg = (
            load_table(spark, "documents", sf_dir)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
            )
        )
        audits = write_audit_publish(agg, root, "v=1")
        published = spark.read.parquet(os.path.join(root, "v=1"))
        out = published.select(
            "lang",
            "n_docs",
            "sum_chars",
            *[F.lit(v).alias(k) for k, v in sorted(audits.items())],
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
