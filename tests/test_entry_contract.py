"""Driver-contract invariants of __spark_entry__."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e


def test_queries_rotation_puts_uncertified_first():
    """The driver certifies a bounded prefix of queries(); every query a
    past CORRECTNESS_r*.json attests as PASSING must sort after every
    never-passing one — a hash mismatch or crash in an old snapshot is
    NOT certification and must rotate back to the front. A stale
    no_oracle record certifies only while the query is STILL oracle-less
    (r5: queries that gained oracles were buried behind old records)."""
    has_oracle = set(e.oracle_sql())
    certified: set[str] = set()
    for p in glob.glob(
        os.path.join(os.path.dirname(os.path.abspath(e.__file__)),
                     "CORRECTNESS_r*.json")
    ):
        for k, v in json.load(open(p)).items():
            if isinstance(v, dict) and (
                v.get("hash_match") is True
                or (v.get("err") == "no_oracle" and k not in has_oracle)
            ):
                certified.add(k)
    # plan-changed queries are explicitly de-certified for re-check
    certified -= e.FORCE_RECERT
    names = list(e.queries())
    assert len(names) == len(set(names))
    seen_certified = False
    for n in names:
        if n in certified:
            seen_certified = True
        else:
            assert not seen_certified, (
                f"uncertified query {n!r} sorted after a certified one"
            )


def test_oracles_subset_of_queries():
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
