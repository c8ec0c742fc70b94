"""Reference-scale benchmark: the reference's own workload shape at its
own largest cardinality (BASELINE.md engine benchmark plan).

Times the two core jobs of /root/reference/build.sh on a synthetic
block-group-scale dataset (240k places x 19 years x 30 metrics = 4.56M
long rows -> 240k x 573 wide):

  * ref_pivot   — long -> rename/project -> falsy-fill -> last-write-wins
                  pivot -> 573-column wide parquet (shape-data.js job)
  * ref_extents — wide parquet -> per-column min/max/exact-R7
                  1st/99th percentiles (extract-extents.js job)

The reference runs these single-threaded in Node with a 4 GB heap cap
(build.sh:80,86) and a 10-second progress-log cadence chosen for
multi-minute runs (shape-data.js:22). This script is the apples-to-apples
"same data scale, one machine" comparison; it is kept out of the
per-round bench.py so the fast regression signal stays fast.

Prints ONE JSON line. SPARK_GRAFT_REF_PLACES overrides the cardinality.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_v2_etl_spark.operators.extents import column_extents  # noqa: E402
from map_v2_etl_spark.operators.pivot import pivot_long_to_wide  # noqa: E402
from map_v2_etl_spark.session import get_spark  # noqa: E402
from map_v2_etl_spark.sources.synthetic import reference_long_table  # noqa: E402

PLACES = int(os.environ.get("SPARK_GRAFT_REF_PLACES", "240000"))


def main() -> None:
    spark = get_spark("m2e-bench-reference")
    # warm-up at 1% so JVM/codegen spin-up isn't billed to the first job
    tmp = tempfile.mkdtemp(prefix="m2e_ref_bench_")
    try:
        warm = os.path.join(tmp, "warm")
        pivot_long_to_wide(
            reference_long_table(spark, max(PLACES // 100, 100)), "raw"
        ).write.mode("overwrite").parquet(warm)
        column_extents(spark.read.parquet(warm)).write.format(
            "noop"
        ).mode("overwrite").save()

        codec = os.environ.get("SPARK_GRAFT_REF_CODEC")
        if codec:
            spark.conf.set("spark.sql.parquet.compression.codec", codec)
        # split the pivot job: COMPUTE (noop sink) vs parquet write, so
        # a slow-disk episode is attributable (the write stays in the
        # headline because the reference job also materializes wide)
        t0 = time.time()
        pivot_long_to_wide(
            reference_long_table(spark, PLACES), "raw"
        ).write.format("noop").mode("overwrite").save()
        t_pivot_compute = round(time.time() - t0, 3)

        wide_path = os.path.join(tmp, "wide")
        t0 = time.time()
        pivot_long_to_wide(
            reference_long_table(spark, PLACES), "raw"
        ).write.mode("overwrite").parquet(wide_path)
        t_pivot = round(time.time() - t0, 3)

        wide = spark.read.parquet(wide_path)
        t0 = time.time()
        column_extents(wide).write.format("noop").mode("overwrite").save()
        t_extents = round(time.time() - t0, 3)

        n_cols = len(wide.columns)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "reference_scale_jobs_total",
                "value": round(t_pivot + t_extents, 3),
                "unit": "sec",
                "queries": {"ref_pivot": t_pivot, "ref_extents": t_extents},
                "ref_pivot_compute_noop": t_pivot_compute,
                "parquet_codec": codec or "snappy (default)",
                "places": PLACES,
                "wide_columns": n_cols,
            }
        )
    )


if __name__ == "__main__":
    main()
