"""README surface-count drift guard (r10, ADVICE r9 item 4).

The README's query tally was hand-maintained and went stale twice; this
pins the numbers in the prose to the live registry so any future wave
that forgets to update the README fails loudly here instead of shipping
a wrong public claim.
"""

from __future__ import annotations

import os
import re

from map_v2_etl_spark.plans.registry import all_oracles, all_queries

README = os.path.join(os.path.dirname(__file__), "..", "README.md")
SURVEY = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")


def test_readme_query_tally_matches_registry():
    text = open(README).read()
    m = re.search(
        r"(\d+) registered queries \((\d+) value-hash\)", text
    )
    assert m, "README no longer states the query tally"
    assert int(m.group(1)) == len(all_queries())
    assert int(m.group(2)) == len(all_oracles())


def test_survey_prose_tally_matches_registry():
    """SURVEY §8 prose went stale twice (r11 '214', judged r12); pin it too."""
    text = open(SURVEY).read()
    m = re.search(r"all (\d+) queries are value-hash\s*\ncertified", text)
    assert m, "SURVEY.md no longer states the §8 query tally"
    assert int(m.group(1)) == len(all_queries())
