"""Wave-29 tests: SCD2 point-in-time lookup and sequence pattern match.

Claims pinned:
* scd2_lookup NEVER fans out: exactly one output row per event (the
  interval-uniqueness argument in the module docstring, asserted).
* state_at_arrival equals an independently computed "latest strictly
  earlier change point" per event (python twin over the raw log),
  including NULL for events at/before the user's first change point
  and the boundary rule (an episode-opening event sees the episode it
  closed).
* sequence_pattern_match features equal a pure-python recomputation
  from each user's (ts, event_id)-ordered event list.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type")
        .collect()
    )


def test_scd2_lookup_matches_python_twin(spark):
    rows = _events(spark)
    # change points per user: ordered by (ts, event_id), keep events
    # whose type differs from the previous kept state
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        eps = by_user.setdefault(r["user_id"], [])
        if not eps or eps[-1][1] != r["event_type"]:
            eps.append((r["ts"], r["event_type"]))

    def state_before(uid, ts):
        best = None
        for t, s in by_user.get(uid, []):
            if t < ts:
                best = (s, t)
        return best

    out = REGISTRY["scd2_lookup"].fn(spark, SF).collect()
    assert len(out) == len(rows), "PIT join fanned out or dropped rows"
    expect = {
        r["event_id"]: state_before(r["user_id"], r["ts"]) for r in rows
    }
    nulls = matches = 0
    for o in out:
        want = expect[o["event_id"]]
        if want is None:
            assert o["state_at_arrival"] is None and o["state_since"] is None
            nulls += 1
        else:
            assert (o["state_at_arrival"], o["state_since"]) == want, o
            matches += 1
    assert matches > 0 and nulls > 0  # both branches exercised


def test_sequence_pattern_match_python_twin(spark):
    import re

    rows = _events(spark)
    seqs: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        seqs[r["user_id"]] = seqs.get(r["user_id"], "") + r["event_type"][0]
    out = {r["user_id"]: r for r in
           REGISTRY["sequence_pattern_match"].fn(spark, SF).collect()}
    assert set(out) == set(seqs)
    for uid, s in seqs.items():
        o = out[uid]
        assert o["seq_len"] == len(s)
        assert o["n_view_click"] == s.count("vc")
        assert o["n_click_purchase"] == s.count("cp")
        assert o["has_conversion"] == bool(re.search("v.*c.*p", s))
        assert o["starts_with_signup"] == s.startswith("s")
