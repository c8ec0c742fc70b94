"""Wave-26 tests: compaction and snapshot vacuum.

Claims pinned: compaction actually shrinks the file count to the
planned bin count while preserving content exactly (set equality, not
just aggregates); the planner's bin math follows the listing; vacuum
physically deletes only the expired versions and every survivor stays
a readable self-contained checkpoint equal to a from-scratch recompute.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_compaction_shrinks_files_preserves_content(spark, tmp_path):
    from map_v2_etl_spark.plans.queries_wave26 import (
        compact,
        fragment_table,
        plan_compaction,
    )

    frag = str(tmp_path / "frag")
    tight = str(tmp_path / "tight")
    fragment_table(spark, SF, frag, 32)
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    assert n_frag == 32
    planned = plan_compaction(frag, target_bytes=8 << 20)
    n_out = compact(spark, frag, tight, target_bytes=8 << 20)
    assert n_out == planned
    produced = len(glob.glob(os.path.join(tight, "*.parquet")))
    assert produced == n_out < n_frag
    a = sorted(map(tuple, spark.read.parquet(frag).collect()))
    b = sorted(map(tuple, spark.read.parquet(tight).collect()))
    assert a == b, "compaction must be a pure relayout"


def test_compaction_bin_math():
    """ceil(total/target) with floor 1, straight from the listing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_v2_etl_spark.plans.queries_wave26 import plan_compaction

    import tempfile

    d = tempfile.mkdtemp(prefix="binmath_")
    try:
        for i in range(4):
            pq.write_table(
                pa.table({"x": list(range(1000))}),
                os.path.join(d, f"p{i}.parquet"),
            )
        total = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )
        assert plan_compaction(d, target_bytes=total) == 1
        assert plan_compaction(d, target_bytes=total // 2 + 1) == 2
        assert plan_compaction(d, target_bytes=10**12) == 1
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_vacuum_deletes_expired_keeps_survivors_readable(spark, tmp_path):
    from map_v2_etl_spark.plans.queries_wave26 import (
        _CUTS,
        build_snapshots,
        vacuum,
    )

    root = str(tmp_path / "snaps")
    os.makedirs(root)
    build_snapshots(spark, SF, root)
    assert sorted(os.listdir(root)) == ["v=1", "v=2", "v=3"]
    deleted = vacuum(root, keep=2)
    assert deleted == [1]
    assert sorted(os.listdir(root)) == ["v=2", "v=3"]
    # every survivor is a self-contained checkpoint == full recompute
    ev = spark.read.parquet(f"{SF}/events.parquet")
    for v, cut in [(2, _CUTS[1]), (3, _CUTS[2])]:
        snap = {
            r["user_id"]: (r["event_type"], r["value"])
            for r in spark.read.parquet(os.path.join(root, f"v={v}"))
            .collect()
        }
        want = {
            r["user_id"]: (r["s"]["event_type"], r["s"]["value"])
            for r in ev.filter(
                F.col("ts") <= F.lit(cut).cast("timestamp_ntz")
            )
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("event_type", "value"),
                    F.struct("ts", "event_id"),
                ).alias("s")
            )
            .collect()
        }
        assert snap == want, f"v{v} diverged from recompute"
