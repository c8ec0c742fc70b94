"""A/B a set of session confs over a subset of the bench headline
queries, using bench.py's exact protocol (sf0.001 warmup, min-of-2 at
$SPARK_GRAFT_SF_DIR, noop sink, clearCache between reps).

Usage: python tools/bench_conf_ab.py [k=v ...] -- q1 q2 ...
Prints one JSON line {"conf": {...}, "queries": {q: sec}, "total": s}.
Run control and variant in SEPARATE processes back to back; the conf
must be set at session build time (AQE/join-strategy confs are read
per-query, but a clean JVM keeps codegen caches comparable).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries  # noqa: E402
from map_v2_etl_spark.session import get_spark  # noqa: E402

all_queries()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = os.environ.get(
    "SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001"
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sep = sys.argv.index("--")
    conf = dict(a.split("=", 1) for a in sys.argv[1:sep])
    names = sys.argv[sep + 1:]
    spark = get_spark("m2e-conf-ab", extra_conf=conf)
    force(spark.range(1000).selectExpr("sum(id) as s"))
    for name in names:
        try:
            force(REGISTRY[name].fn(spark, WARMUP_SF_DIR))
        except Exception:
            pass
    spark.catalog.clearCache()
    timings = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            force(REGISTRY[name].fn(spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    print(json.dumps({
        "conf": conf,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
    }))


if __name__ == "__main__":
    main()
