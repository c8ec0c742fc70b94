"""Regenerate SURVEY.md §8's coverage table from the live query registry.

Usage: python tools/gen_coverage_map.py   (rewrites SURVEY.md in place)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries  # noqa: E402

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")


def main() -> None:
    all_queries()
    lines = ["| query | oracle | tags | module |", "|---|---|---|---|"]
    for name, spec in REGISTRY.items():  # insertion = registration order
        oracle = "value-hash" if spec.oracle else "rows-only"
        module = spec.fn.__module__.rsplit(".", 1)[-1]
        lines.append(
            f"| `{name}` | {oracle} | {', '.join(spec.tags)} | {module} |"
        )
    table = "\n".join(lines)

    text = open(SURVEY).read()
    # replace the first markdown table after the §8 header
    # [^\n] (not DOTALL .) so a table row never swallows past its own line
    m = re.search(
        r"(## 8\..*?\n\n(?:[^\n]+\n)*?\n)\| query \| oracle[^\n]*\n(?:\|[^\n]*\n)+",
        text,
        flags=re.S,
    )
    if not m:
        raise SystemExit("SURVEY.md §8 table not found")
    text = text[: m.start()] + m.group(1) + table + "\n" + text[m.end():]
    open(SURVEY, "w").write(text)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    print(f"wrote {len(REGISTRY)} rows ({n_oracle} value-hash)")


if __name__ == "__main__":
    main()
