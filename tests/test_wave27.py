"""Wave-27 tests: SCD Type-2 interval build.

Claims pinned: intervals per user tile the user's event timeline with
no gaps or overlaps; exactly one open (is_current) interval per user;
consecutive duplicate states NEVER open a new version (the dimension-
explosion bug); every event's timestamp falls inside the interval
whose state matches the user's latest state change at that time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def _intervals(spark):
    rows = REGISTRY["scd2_intervals"].fn(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user in by_user:
        by_user[user].sort(key=lambda r: (r["valid_from"], r["from_event_id"]))
    return by_user


def test_intervals_tile_without_gaps_or_overlaps(spark):
    by_user = _intervals(spark)
    assert by_user
    for user, ivs in by_user.items():
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], (user, a, b)
        assert all(iv["valid_to"] is not None for iv in ivs[:-1])
        assert ivs[-1]["valid_to"] is None
        assert sum(iv["is_current"] for iv in ivs) == 1
        assert ivs[-1]["is_current"]


def test_no_duplicate_state_versions(spark):
    by_user = _intervals(spark)
    for user, ivs in by_user.items():
        for a, b in zip(ivs, ivs[1:]):
            assert a["state"] != b["state"], (
                f"user {user}: consecutive episodes share state "
                f"{a['state']} — duplicate-suppression regressed"
            )


def test_every_event_resolves_to_latest_state(spark):
    """Point lookup consistency: for each event, the last interval
    starting at-or-before it carries exactly the state of the user's
    event sequence at that point (computed independently by walking
    the raw log) — the contract a fact-to-SCD2 range join relies on."""
    by_user = _intervals(spark)
    log = {}
    for e in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    ):
        log.setdefault(e["user_id"], []).append(e)
    for user, events in log.items():
        events.sort(key=lambda e: (e["ts"], e["event_id"]))
        ivs = by_user[user]
        state = None
        for e in events:
            state = e["event_type"]  # the log IS the state sequence
            covering = max(
                (
                    iv
                    for iv in ivs
                    if (iv["valid_from"], iv["from_event_id"])
                    <= (e["ts"], e["event_id"])
                ),
                key=lambda iv: (iv["valid_from"], iv["from_event_id"]),
            )
            assert covering["state"] == state, (user, e, covering)
