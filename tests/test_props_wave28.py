"""Property tests for the wave-28/32 primitives.

* KMV pair estimation equals an exact Python re-model of the SAME
  estimator (same md5-prefix hash, same bottom-k, same float
  parenthesization, same rounding) on arbitrary value multisets — the
  mergeability algebra (union sketch = bottom-k of the union of
  sketches, intersection via the merged sketch's Jaccard) exercised at
  a small k so BOTH regimes (exact and estimator) and the
  intersection's two branches appear.
* Interval coverage (gaps-and-islands windows) and peak concurrency
  (boundary sweep with peer-inclusive running sums) equal brute-force
  Python merges/sweeps on arbitrary interval sets — including ties on
  start points, zero-length gaps, and end==start boundary touches
  (half-open semantics).
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_K = 16
_M = float(1 << 60)


def _h60(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _est(n_sk: int, kth: int) -> float:
    if n_sk < _K:
        return float(n_sk)
    return float(_K - 1) * (_M / float(kth))


def _model_pair(va: list[int], vb: list[int]):
    ka = sorted({_h60(v) for v in va})[:_K]
    kb = sorted({_h60(v) for v in vb})[:_K]
    merged = sorted(set(ka) | set(kb))[:_K]
    n_u, kth_u = len(merged), merged[-1]
    c_ab = sum(1 for h in merged if h in set(ka) and h in set(kb))
    eu = _est(n_u, kth_u)
    est_int = (
        c_ab
        if n_u < _K
        else int(round(float(c_ab) * (eu / float(_K))))
    )
    return (
        int(round(_est(len(ka), ka[-1]))),
        int(round(_est(len(kb), kb[-1]))),
        int(round(eu)),
        est_int,
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    va=st.lists(st.integers(0, 400), min_size=1, max_size=120),
    vb=st.lists(st.integers(0, 400), min_size=1, max_size=120),
)
def test_kmv_pair_estimates_match_model(spark, va, vb):
    from map_v2_etl_spark.operators import sketches as S

    rows = [("a", v) for v in va] + [("b", v) for v in vb]
    df = spark.createDataFrame(rows, "g string, v bigint")
    sk = S.kmv_sketch(df, "g", "v", _K)
    out = S.kmv_pair_estimates(sk, "g", _K).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r["est_a"],
        r["est_b"],
        r["est_union"],
        r["est_intersect"],
    ) == _model_pair(va, vb)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    starts=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    length=st.integers(1, 15),
)
def test_interval_ops_match_bruteforce(spark, starts, length):
    from map_v2_etl_spark.plans.queries_wave32 import (
        coverage_from_intervals,
        peak_from_intervals,
    )

    rows = [("k", i, s, s + length) for i, s in enumerate(starts)]
    iv = spark.createDataFrame(
        rows, "user_id string, event_id int, s long, e long"
    )
    cov = coverage_from_intervals(iv).collect()[0]
    islands: list[list[int]] = []
    for s in sorted(starts):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], s + length)
        else:
            islands.append([s, s + length])
    assert (cov["n_islands"], cov["covered_us"]) == (
        len(islands),
        sum(e - s for s, e in islands),
    )

    pk = peak_from_intervals(iv, "user_id").collect()[0]
    bounds = sorted(
        [(s, 1) for s in starts] + [(s + length, -1) for s in starts]
    )
    cur = peak = 0
    for _, d in bounds:
        cur += d
        peak = max(peak, cur)
    assert (pk["peak_concurrent"], pk["n_intervals"]) == (
        peak,
        len(starts),
    )
