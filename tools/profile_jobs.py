"""Per-query job/stage/shuffle profile (r17, guide §1).

For each named registry query: warm it once at sf0.001, then run it via
the noop sink at $SPARK_GRAFT_SF_DIR inside a dedicated job group, and
report wall seconds split into build (spec.fn — eager phases run here)
vs execute, the number of Spark jobs/stages/tasks the measured rep
launched, and total shuffle read/write bytes + executor run time pulled
from the local REST API. High job counts with low task time = driver
round-trip bound; high shuffle bytes = exchange bound.

Usage: python tools/profile_jobs.py name [name ...] [--no-warmup]
Prints one JSON object per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

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


def api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    warm = "--no-warmup" not in sys.argv
    spark = get_spark(
        "m2e-profile-jobs", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
    force(spark.range(1000).selectExpr("sum(id) as s"))
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(json.dumps({"query": name, "error": "not registered"}))
            continue
        if warm:
            try:
                force(spec.fn(spark, WARMUP_SF_DIR))
            except Exception as exc:  # best-effort, mirror bench.py
                print(json.dumps({"query": name, "warmup_error": str(exc)}))
            spark.catalog.clearCache()
        sc.setJobGroup(f"prof:{name}", name)
        t0 = time.monotonic()
        df = spec.fn(spark, SF_DIR)
        t1 = time.monotonic()
        force(df)
        t2 = time.monotonic()
        sc.setJobGroup(None, None)
        jobs = [
            j for j in api(base, "/jobs")
            if j.get("jobGroup") == f"prof:{name}"
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        sread = swrite = ttime = tasks = 0
        in_bytes = 0
        n_stages = 0
        for sid in stage_ids:
            try:
                for att in api(base, f"/stages/{sid}"):
                    if att["status"] == "SKIPPED":
                        continue
                    n_stages += 1
                    sread += att["shuffleReadBytes"]
                    swrite += att["shuffleWriteBytes"]
                    ttime += att["executorRunTime"]
                    tasks += att["numCompleteTasks"]
                    in_bytes += att["inputBytes"]
            except Exception:
                pass
        spark.catalog.clearCache()
        print(json.dumps({
            "query": name,
            "build_sec": round(t1 - t0, 3),
            "exec_sec": round(t2 - t1, 3),
            "total_sec": round(t2 - t0, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": tasks,
            "input_mb": round(in_bytes / 1e6, 1),
            "shuffle_read_mb": round(sread / 1e6, 1),
            "shuffle_write_mb": round(swrite / 1e6, 1),
            "executor_run_sec": round(ttime / 1000, 1),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
