"""Wave-31 tests: streaming KMV merge and manifest-pruned scan.

Claims pinned:
* stream_kmv_merge is microbatch-boundary independent: replaying the
  same events with a DIFFERENT batch size lands on identical estimates,
  and both equal the from-scratch batch sketch (the bottom-k merge
  associativity the module docstring claims).
* manifest_pruned_scan's pruning is real (strictly fewer files read
  than written) and result-invisible (equals the unpruned full-scan
  filter aggregate); the manifest stats cover every file and come from
  footers whose min/max actually bound the key range predicate.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_stream_kmv_merge_batch_independent(spark):
    from map_v2_etl_spark.operators import sketches as S
    import map_v2_etl_spark.plans.queries_wave31 as w31

    # from-scratch batch sketch (no streaming)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        r["event_type"]: r["est"]
        for r in S.kmv_stats(
            S.kmv_sketch(ev, "event_type", "user_id", w31._K),
            "event_type",
            w31._K,
        ).collect()
    }
    default = {
        r["event_type"]: r["est_users"]
        for r in REGISTRY["stream_kmv_merge"].fn(spark, SF).collect()
    }
    assert default == batch
    # different microbatch boundaries -> identical result (merge
    # associativity under real streaming execution)
    alt = {
        r["event_type"]: r["est_users"]
        for r in w31._stream_kmv(spark, SF, batch_rows=1500).collect()
    }
    assert alt == default


def test_manifest_pruning_real_and_invisible(spark):
    import map_v2_etl_spark.plans.queries_wave31 as w31

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="m2e_manifest_test_")
    try:
        w31._write_range_layout(docs, out)
        manifest = w31._manifest(out)
        import glob

        n_files = len(glob.glob(os.path.join(out, "*.parquet")))
        assert len(manifest) == n_files
        selected = [
            e for e in manifest if e["min"] <= w31._HI and e["max"] >= w31._LO
        ]
        assert 0 < len(selected) < n_files, (len(selected), n_files)
        # stats actually bound the data per file
        for e in manifest:
            lohi = (
                spark.read.parquet(e["file"])
                .agg(F.min("doc_id"), F.max("doc_id"))
                .first()
            )
            assert (lohi[0], lohi[1]) == (e["min"], e["max"])
    finally:
        shutil.rmtree(out, ignore_errors=True)

    got = {
        r["lang"]: (r["n_docs"], r["sum_chars"])
        for r in REGISTRY["manifest_pruned_scan"].fn(spark, SF).collect()
    }
    want = {
        r["lang"]: (r["n"], r["s"])
        for r in docs.filter(F.col("doc_id").between(w31._LO, w31._HI))
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert got == want
