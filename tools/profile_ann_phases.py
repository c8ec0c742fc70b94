"""Phase profile for the ann_index_topk composition (r16, r15 verdict
#3 follow-up): BENCH_AB_r15 confirmed the ~6s floor is real code cost,
and the query-only plan is already exonerated by the scale cell — this
splits the registered composition's wall into its one-time phases
(build / write / read) vs the query, reps with cache clears, so the
regression can be pinned to a phase instead of a module.

Usage: python tools/profile_ann_phases.py [--reps 3] [--sf DIR]
Prints one JSON object {"phases_sec": {phase: [reps...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from map_v2_etl_spark.operators import similarity as S  # noqa: E402
from map_v2_etl_spark.plans.queries_wave43 import (  # noqa: E402
    _scratch_index_path,
)
from map_v2_etl_spark.session import get_spark  # noqa: E402
from map_v2_etl_spark.sources.registry import load_table  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()
    spark = get_spark("m2e-profile-ann")
    force(spark.range(1000).selectExpr("sum(id) as s"))
    phases: dict[str, list[float]] = {
        "build": [], "write": [], "read": [], "query": [],
        "total": [],
    }
    for _ in range(args.reps):
        spark.catalog.clearCache()
        emb = load_table(spark, "embeddings", args.sf)
        qs = emb.filter(F.col("vec_id") % 50 == 0)
        t0 = time.monotonic()
        # build = the eager driver-side training (sample + Lloyd); the
        # corpus encode stays lazy and is paid by the write phase,
        # exactly as in the registered composition
        index = S.ann_index_build(
            emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
        )
        t1 = time.monotonic()
        path = _scratch_index_path()
        S.ann_index_write(index, path)
        t2 = time.monotonic()
        reloaded = S.ann_index_read(spark, path)
        reloaded["coded"].write.format("noop").mode("overwrite").save()
        t3 = time.monotonic()
        force(
            S.ann_index_topk(
                reloaded, qs, emb, k=5, candidates=50, nprobe=4,
            )
        )
        t4 = time.monotonic()
        phases["build"].append(round(t1 - t0, 3))
        phases["write"].append(round(t2 - t1, 3))
        phases["read"].append(round(t3 - t2, 3))
        phases["query"].append(round(t4 - t3, 3))
        phases["total"].append(round(t4 - t0, 3))
    print(json.dumps({"phases_sec": phases, "sf_dir": args.sf}))


if __name__ == "__main__":
    main()
