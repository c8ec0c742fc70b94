"""Wave-34 tests: TWAP and OHLC resampling vs python twins.

Claims pinned:
* time_weighted_avg equals an exact-Fraction python recomputation of
  Σ value·dur / span per user (Fraction arithmetic sidesteps float
  summation order entirely, so the twin is stronger than the engines'
  own float paths), and lies within [min value, max value] per user.
* resample_ohlc equals a python recomputation over (ts, event_id)-
  ordered events per (day, type); high ≥ {open, close} ≥ low holds on
  every bar.
"""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"
_EPOCH = dt.datetime(1970, 1, 1)


def _us(ts: dt.datetime) -> int:
    d = ts - _EPOCH
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


def _events(spark):
    return [
        r
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
        if r["value"] is not None
    ]


def test_twap_python_twin(spark):
    rows = _events(spark)
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (_us(r["ts"]), r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(
            (_us(r["ts"]), r["value"])
        )
    got = {
        r["user_id"]: (r["twap"], r["span_us"], r["n_events"])
        for r in REGISTRY["time_weighted_avg"].fn(spark, SF).collect()
    }
    multi = {u: evs for u, evs in by_user.items() if len(evs) > 1}
    assert set(got) == set(multi)
    for uid, evs in multi.items():
        # engines quantize value to DECIMAL(20,4) before weighting
        q = [
            (t, Fraction(round(v * 10000), 10000)) for t, v in evs
        ]
        wsum = sum(
            v * (q[i + 1][0] - t) for i, (t, v) in enumerate(q[:-1])
        )
        span = q[-1][0] - q[0][0]
        want = round(float(wsum / span), 6)
        twap, span_us, n_ev = got[uid]
        assert span_us == span and n_ev == len(evs)
        assert twap == want, (uid, twap, want)
        vals = [float(v) for _, v in q]
        assert min(vals) - 1e-9 <= twap <= max(vals) + 1e-9


def test_ohlc_python_twin(spark):
    rows = _events(spark)
    bars: dict = {}
    for r in sorted(rows, key=lambda r: (_us(r["ts"]), r["event_id"])):
        key = (r["ts"].strftime("%Y-%m-%d"), r["event_type"])
        b = bars.get(key)
        if b is None:
            bars[key] = [r["value"], r["value"], r["value"], r["value"], 1]
        else:
            b[1] = max(b[1], r["value"])
            b[2] = min(b[2], r["value"])
            b[3] = r["value"]
            b[4] += 1
    got = {
        (r["day"], r["event_type"]): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["n"],
        )
        for r in REGISTRY["resample_ohlc"].fn(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in bars.items()}
    for o, h, l, c, _ in got.values():
        assert l <= o <= h and l <= c <= h
