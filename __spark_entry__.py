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

#: hand override on top of the AUTOMATIC staleness key (r7+): queries
#: listed here rotate to the front regardless of fingerprint state.
#: Since tools/cert_fingerprint.py de-certifies any query whose
#: plan-relevant source slice or oracle drifted from the state its last
#: passing driver record attested (CERT_FINGERPRINTS.json), this set is
#: normally EMPTY — it remains as an escape hatch for staleness the
#: slicer cannot see (e.g. a behavior change routed through dynamic
#: dispatch or data files rather than package source). r9: CLEARED —
#: CORRECTNESS_r08 certified all 13 members of the r7 set green, and
#: the round-start `tools/cert_fingerprint.py update` re-seeded their
#: fingerprints at the attested state, so the automatic staleness key
#: has taken over (docs/ROUND7.md §1 protocol).
FORCE_RECERT: set[str] = set()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the long->wide pivot on sf0.001 orders (one row per
    customer, one column per order-year) — the reference's core operator."""
    return _r.all_queries()["pivot_wide"](spark, "/root/testdata/sf0.001")


def _passing_records() -> dict[str, bool]:
    """{query: True} for every query with a passing record in ANY
    CORRECTNESS_r*.json. Only a PASSING record certifies: a hash
    mismatch or crash in an old snapshot must rotate the query back to
    the FRONT for re-certification, not bury it behind the driver's
    bounded prefix forever. rows-only queries (err == "no_oracle") have
    no hash to match — a clean run is their pass, but ONLY while the
    query is still oracle-less (the r5 staleness bug)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    has_oracle = set(_r.all_oracles())
    certified: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                snapshot = json.load(fh)
        except (OSError, ValueError):
            continue
        for k, v in snapshot.items():
            if not isinstance(v, dict):
                continue
            if v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and k not in has_oracle
            ):
                certified[k] = True
    return certified


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registry queries, ordered needs-certification first.

    The driver's correctness snapshot covers a bounded prefix of this
    dict (~50 queries/round), so ordering IS the certification queue:

      1. never driver-certified (new queries) — registry order;
      2. STALE certs — a passing record exists but the query's current
         fingerprint (oracle SQL + AST-sliced plan-relevant source,
         tools/cert_fingerprint.py) no longer matches the one recorded
         at certification time in CERT_FINGERPRINTS.json — oldest cert
         round first, so the records furthest from the current code
         re-attest soonest;
      3. certified and fingerprint-current — registry order, at the
         back.

    This replaces the hand-maintained FORCE_RECERT judgement call of
    r2–r6 (which round 6 demonstrably got wrong — see ADVICE.md r6):
    any edit to a module an operator's plan flows through de-certifies
    it automatically. The full set is still locally checked every round
    by tools/check_oracle.py.
    """
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    qs = _r.all_queries()
    passing = _passing_records()
    store: dict = {}
    current: dict[str, str] = {}
    try:
        store_path = os.path.join(here, "CERT_FINGERPRINTS.json")
        with open(store_path) as fh:
            store = json.load(fh)
        from tools.cert_fingerprint import compute_fingerprints

        current = compute_fingerprints(here)
    except Exception:
        # fingerprinting must never break the driver contract: with no
        # usable store, fall back to record-based ordering (bucket 2
        # collapses into bucket 3)
        store, current = {}, {}

    def bucket(idx_name: tuple[int, str]) -> tuple:
        idx, name = idx_name
        if name in FORCE_RECERT or name not in passing:
            return (0, 0, idx)  # never certified / forced
        rec = store.get(name)
        if rec is not None and current and current.get(name) != rec["fp"]:
            return (1, rec.get("round", 0), idx)  # stale cert
        return (2, 0, idx)  # certified + current

    names = sorted(
        ((i, k) for i, k in enumerate(qs)), key=bucket
    )
    return {k: qs[k] for _, k in names}


def oracle_sql() -> dict[str, str]:
    return _r.all_oracles()
