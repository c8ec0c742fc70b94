"""Generate docs/PLANS.md: the physical-plan audit of every bench headline
query — shuffle counts, broadcast usage, scan pushdown, codegen spans —
plus the full `explain("formatted")` output.

This is the "the plan IS the product" artifact: tests/test_plans.py
asserts the load-bearing contracts (broadcasts, pushdown, no nested
loops); this document shows the whole picture for review.

Usage: python tools/gen_plan_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "PLANS.md",
)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> dict[str, int | str]:
    # count operator DETAIL headers ("(n) OperatorName") — each operator
    # instance appears once there; the tree rendering above would double
    # every count
    def op(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.M))

    return {
        "exchanges": op("Exchange") + op("BroadcastExchange"),
        "broadcasts": op("BroadcastExchange"),
        "bhj": op("BroadcastHashJoin"),
        "smj": op("SortMergeJoin"),
        "bnlj": op("BroadcastNestedLoopJoin"),
        "scans": op("Scan parquet") + len(re.findall(r"^\(\d+\) InMemoryTableScan", plan, flags=re.M)),
        "pushed": "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-",
        "codegen": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
    }


#: audited beyond the bench headline: new-plan-shape queries worth a
#: standing physical-plan record even though they don't (yet) run in
#: the per-round bench
AUDIT_EXTRA = [
    # wave-22 (not in the bench headline yet)
    "recursive_cte_paths", "python_datasource_scan",
    "constraint_profile", "countmin_heavy",
    # wave-23
    "stream_python_datasource", "arrow_group_transform",
    "dynamic_partition_pruning",
    # wave-24
    "stream_foreach_batch_upsert", "python_datasource_write_roundtrip",
    # wave-25
    "hll_merge_rollup",
    # wave-26
    "compact_small_files", "snapshot_vacuum",
    # wave-27
    "scd2_intervals",
    # wave-41: residual IVF-PQ, both regimes — the routed-BHJ ADC scan
    # and the fused zero-corpus-shuffle MapInPandas encode
    "ivf_pq_residual_topk", "ivf_pq_residual_fused",
    # wave-42: cross-doc exact substring dedup (k-gram anchor table)
    "cross_doc_span_dedup",
    # wave-42/43 (r14): the boilerplate-gram skew cap and the persisted
    # ANN index's two surfaces (build = fused encode; topk = the
    # query-only plan with zero train/encode stages)
    "span_dedup_capped", "ann_index_build", "ann_index_topk",
    # wave-44 (r14): the scalar-quantization family (all-JVM encode +
    # routed BHJ scan)
    "ivf_sq8_topk",
]


def main() -> None:
    from bench import HEADLINE  # the queries the driver times per round

    from map_v2_etl_spark.plans.registry import REGISTRY, all_queries
    from map_v2_etl_spark.session import get_spark

    all_queries()
    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=16)

    rows = []
    details = []
    for name in HEADLINE + AUDIT_EXTRA:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        plan = formatted_plan(spec.fn(spark, SF_DIR))
        a = audit(plan)
        rows.append(
            f"| `{name}` | {a['exchanges']} | {a['broadcasts']} | "
            f"{a['bhj']} | {a['smj']} | {a['bnlj']} | {a['scans']} | "
            f"{a['pushed']} | {a['codegen']} |"
        )
        details.append(
            f"<details>\n<summary><code>{name}</code></summary>\n\n"
            f"```\n{plan.strip()}\n```\n\n</details>\n"
        )

    doc = (
        "# Physical-plan audit (generated)\n\n"
        f"`python tools/gen_plan_audit.py` over the bench headline set at "
        f"`{SF_DIR}`.\n\n"
        "Reading guide: **Exchanges** are shuffles — each one is a full\n"
        "rewrite of the stage's data over the network at cluster scale, so\n"
        "fewer is better and every one should be load-bearing (a groupBy or\n"
        "a non-broadcastable join). **BroadcastHashJoin** rows confirm small\n"
        "sides ship to executors instead of shuffling the big side.\n"
        "**BNLJ** (BroadcastNestedLoopJoin) is only acceptable for\n"
        "deliberate bounded cross products (exact ANN scoring against a\n"
        "broadcast query set). **Pushed** marks parquet scans with filter\n"
        "pushdown active. **Codegen** counts whole-stage-codegen spans;\n"
        "AQE plans print `isFinalPlan=false` pre-execution and only\n"
        "annotate codegen ids at runtime, so 0 means 'adaptive plan,\n"
        "spans assigned at execution', not 'codegen off' (map-only plans\n"
        "that bypass AQE, e.g. `pii_redact`, show their span directly).\n\n"
        "| query | exchanges | broadcasts | BHJ | SMJ | BNLJ | scans | "
        "pushed | codegen |\n"
        "|---|---|---|---|---|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n\n## Full plans\n\n"
        + "\n".join(details)
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write(doc)
    print(f"wrote {OUT}: {len(rows)} queries")


if __name__ == "__main__":
    main()
