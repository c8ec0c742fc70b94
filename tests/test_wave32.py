"""Wave-32 tests: interval coverage and peak concurrency vs brute-force
python twins.

Claims pinned:
* interval_coverage equals a literal merge-the-intervals recomputation
  per user (sort, merge overlapping, sum lengths, count islands).
* peak_concurrency equals a brute-force sweep per event type with
  explicit end-before-start tie handling (half-open intervals).
* Coverage bounds sanity: islands ≥ 1, interval_length ≤ covered ≤
  n_events · interval_length for every user.
"""

from __future__ import annotations

from map_v2_etl_spark.plans.queries_wave32 import _IV_US
from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def _intervals(spark, key):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(key, "ts", "event_id")
        .collect()
    )
    out: dict = {}
    # epoch micros computed EXACTLY from timedelta components (the
    # fixture's ts is naive wall clock == UTC; float total_seconds
    # would drift at microsecond precision)
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    for r in rows:
        delta = r["ts"] - epoch
        s = (
            delta.days * 86400 + delta.seconds
        ) * 1_000_000 + delta.microseconds
        out.setdefault(r[key], []).append((s, s + _IV_US, r["event_id"]))
    return out


def test_interval_coverage_python_twin(spark):
    ivs = _intervals(spark, "user_id")
    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in REGISTRY["interval_coverage"].fn(spark, SF).collect()
    }
    assert set(got) == set(ivs)
    for uid, lst in ivs.items():
        lst = sorted(lst)
        islands = []
        for s, e, _ in lst:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want = (len(islands), sum(e - s for s, e in islands))
        assert got[uid] == want, (uid, got[uid], want)
        assert want[0] >= 1
        assert _IV_US <= want[1] <= len(lst) * _IV_US


def test_peak_concurrency_python_twin(spark):
    ivs = _intervals(spark, "event_type")
    got = {
        r["event_type"]: (r["peak_concurrent"], r["n_intervals"])
        for r in REGISTRY["peak_concurrency"].fn(spark, SF).collect()
    }
    assert set(got) == set(ivs)
    for t, lst in ivs.items():
        # brute-force sweep: ends (-1) before starts (+1) at equal t
        bounds = [(s, 1) for s, _, _ in lst] + [(e, -1) for _, e, _ in lst]
        bounds.sort()  # (t, -1) < (t, +1) ascending
        cur = peak = 0
        for _, d in bounds:
            cur += d
            peak = max(peak, cur)
        assert got[t] == (peak, len(lst)), (t, got[t], (peak, len(lst)))
        assert 1 <= peak <= len(lst)
