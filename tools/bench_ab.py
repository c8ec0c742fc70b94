"""Same-code A/B acquittal series for driver-bench swings.

Replicates bench.py's exact measurement protocol (sf0.001 warmup pass,
measured reps at sf0.1 with spark.catalog.clearCache() between reps,
noop-sink force) but runs N reps per query instead of best-of-2, so a
flagged round-over-round regression can be judged against the same-code
run-to-run spread rather than a single driver sample.

Usage:
    python tools/bench_ab.py q1 q2 ... [--reps 6] [--out FILE]

Prints one JSON object {"series_sec": {q: [..]}, "fingerprints": {q: fp}}.
The fingerprint is tools/cert_fingerprint.py's plan-relevant source slice
hash — recording it pins that the series ran on byte-identical plan code
to whatever HEAD the flagged driver number came from.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries  # noqa: E402
from map_v2_etl_spark.session import get_spark  # noqa: E402
from tools.cert_fingerprint import compute_fingerprints  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = os.environ.get(
    "SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001"
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    all_queries()
    spark = get_spark("m2e-bench-ab")
    force(spark.range(1000).selectExpr("sum(id) as s"))
    for name in args.queries:
        spec = REGISTRY.get(name)
        if spec is None:
            raise SystemExit(f"unknown query: {name}")
        try:
            force(spec.fn(spark, WARMUP_SF_DIR))
        except Exception:
            pass  # warmup is best-effort, as in bench.py
    spark.catalog.clearCache()

    series: dict[str, list[float]] = {name: [] for name in args.queries}
    # interleave reps (rep 1 of every query, then rep 2 of every query,
    # ...) so a transient box-load episode smears across all queries
    # instead of poisoning one query's whole series
    for _ in range(args.reps):
        for name in args.queries:
            spec = REGISTRY[name]
            t0 = time.time()
            force(spec.fn(spark, SF_DIR))
            series[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()

    fps = compute_fingerprints(REPO)
    out = {
        "series_sec": series,
        "fingerprints": {q: fps.get(q) for q in args.queries},
        "sf_dir": SF_DIR,
        "reps": args.reps,
    }
    text = json.dumps(out, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
