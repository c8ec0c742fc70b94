"""Capture .explain("formatted") output for named registry queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query. NOTE: queries whose
builder runs eager phases (index build/write compositions) execute those
phases while the plan is constructed — run this on an idle box, never
concurrently with bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries  # noqa: E402
from map_v2_etl_spark.session import get_spark  # noqa: E402

all_queries()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("m2e-capture-plans")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        df = spec.fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
