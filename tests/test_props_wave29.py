"""Property tests for the wave-28/29 lakehouse read-side semantics over
hypothesis-generated change logs.

* snapshot_diff's defining CDF property — state(T1) ⊕ diff == state(T2)
  — holds for ARBITRARY logs (duplicate timestamps, tombstone flips,
  keys born after T1, keys deleted before T2, single-event keys), not
  just the fixture; op labels always partition correctly.
* scd2_lookup never fans out and always returns the latest STRICTLY
  earlier change point (or NULL before the first), for arbitrary logs
  including ts ties resolved by event_id.

Both drive the REAL query bodies via monkeypatched loaders — the same
plan the driver certifies, not a re-model.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASE = dt.datetime(2024, 1, 1)
_TYPES = ["view", "click", "purchase", "error"]


def _log_strategy():
    # (user 0..3, minute-offset 0..40000, type index) — tight key space
    # forces duplicate-ts ties and tombstone churn
    return st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 40_000),
            st.integers(0, len(_TYPES) - 1),
        ),
        min_size=1,
        max_size=60,
    )


def _frame(spark, raw):
    rows = [
        (
            eid,
            (_BASE + dt.timedelta(minutes=mins)).isoformat(sep=" "),
            uid,
            _TYPES[t],
            float(eid % 7),
        )
        for eid, (uid, mins, t) in enumerate(raw)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).selectExpr(
        "event_id",
        "CAST(ts_s AS TIMESTAMP_NTZ) AS ts",
        "user_id",
        "event_type",
        "value",
    )


def _state(raw, cutoff_min):
    latest: dict = {}
    for eid, (uid, mins, t) in enumerate(raw):
        if mins > cutoff_min:
            continue
        cur = latest.get(uid)
        if cur is None or (mins, eid) > (cur[0], cur[1]):
            latest[uid] = (mins, eid, _TYPES[t], float(eid % 7))
    return {
        uid: (ty, v)
        for uid, (_, _, ty, v) in latest.items()
        if ty != "error"
    }


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_log_strategy())
def test_snapshot_diff_replay_property(spark, raw, monkeypatch):
    import map_v2_etl_spark.plans.queries_wave28 as w28

    df = _frame(spark, raw)
    monkeypatch.setattr(w28, "load_table", lambda s, n, d: df)
    # cutoffs as minute offsets matching the module's literal cutoffs
    t1 = int(
        (dt.datetime.fromisoformat(w28._T1) - _BASE).total_seconds() // 60
    )
    t2 = int(
        (dt.datetime.fromisoformat(w28._T2) - _BASE).total_seconds() // 60
    )
    s1, s2 = _state(raw, t1), _state(raw, t2)
    diff = w28.q_snapshot_diff(spark, "unused").collect()
    replayed = dict(s1)
    for r in diff:
        if r["op"] == "insert":
            assert r["user_id"] not in s1
            replayed[r["user_id"]] = (r["after_type"], r["after_value"])
        elif r["op"] == "delete":
            assert r["user_id"] in s1
            del replayed[r["user_id"]]
        else:
            assert replayed[r["user_id"]] == (
                r["before_type"],
                r["before_value"],
            )
            replayed[r["user_id"]] = (r["after_type"], r["after_value"])
    assert replayed == s2


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_log_strategy())
def test_scd2_lookup_property(spark, raw, monkeypatch):
    import map_v2_etl_spark.plans.queries_wave29 as w29

    df = _frame(spark, raw)
    monkeypatch.setattr(w29, "load_table", lambda s, n, d: df)
    out = w29.q_scd2_lookup(spark, "unused").collect()
    assert len(out) == len(raw), "PIT join fanned out or dropped rows"
    # change points per user in (ts, event_id) order
    episodes: dict = {}
    for eid, (uid, mins, t) in sorted(
        enumerate(raw), key=lambda x: (x[1][0], x[1][1], x[0])
    ):
        eps = episodes.setdefault(uid, [])
        if not eps or eps[-1][1] != _TYPES[t]:
            eps.append((mins, _TYPES[t]))
    by_eid = {eid: (uid, mins) for eid, (uid, mins, _) in enumerate(raw)}
    for r in out:
        uid, mins = by_eid[r["event_id"]]
        best = None
        for m, ty in episodes.get(uid, []):
            if m < mins:
                best = ty
        assert r["state_at_arrival"] == best, (r, best)
