"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (the reference's core long->wide pivot,
                SURVEY.md §2.4 A1) on sf0.001.
queries()     — named (spark, sf_dir) -> DataFrame callables, one per
                implemented operator from SURVEY.md §2.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalents for the hash-match
                correctness gate; non-SQL-expressible ops are omitted
                (rows-only check).

All implementations live in map_v2_etl_spark/ (plans/queries.py registry).
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_v2_etl_spark.plans import registry as _r  # noqa: E402

#: queries whose PHYSICAL PLAN changed since their last passing driver
#: record: an old hash_match=True no longer attests the current code,
#: so they rotate to the front for re-certification. Maintained by hand
#: when a round edits a certified query's plan (the no_oracle staleness
#: guard in queries() cannot see plan edits). r6: the minhash
#: hash-family change (operators/dedup.py) affects all LSH consumers.
FORCE_RECERT: set[str] = {
    "dedup_minhash_pairs",
    "dedup_incremental",
    "dedup_clusters",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the long->wide pivot on sf0.001 orders (one row per
    customer, one column per order-year) — the reference's core operator."""
    return _r.all_queries()["pivot_wide"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registry queries, ordered never-driver-certified first.

    The driver's correctness snapshot covers a bounded prefix of this
    dict (r01/r02 each certified the same first 50), so queries that a
    past CORRECTNESS_r*.json already attests rotate to the back and the
    not-yet-certified cohort surfaces first. Across rounds this walks
    the whole registry through the driver's gate; the full set is
    locally checked every round by tools/check_oracle.py.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    has_oracle = set(_r.all_oracles())
    certified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                snapshot = json.load(fh)
        except (OSError, ValueError):
            continue
        for k, v in snapshot.items():
            # only a PASSING record certifies: a hash mismatch or crash
            # in an old snapshot must rotate the query back to the
            # FRONT for re-certification, not bury it behind the
            # driver's bounded prefix forever. rows-only queries
            # (err == "no_oracle") have no hash to match — a clean run
            # is their pass, but ONLY while the query is still
            # oracle-less: once it gains a value-hash oracle the stale
            # record no longer certifies and it rotates back to the
            # front (the r5 staleness bug — 7 queries buried forever).
            if not isinstance(v, dict):
                continue
            if v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and k not in has_oracle
            ):
                certified.add(k)
    qs = _r.all_queries()
    certified -= FORCE_RECERT
    ordered = {k: v for k, v in qs.items() if k not in certified}
    ordered.update((k, v) for k, v in qs.items() if k in certified)
    return ordered


def oracle_sql() -> dict[str, str]:
    return _r.all_oracles()
