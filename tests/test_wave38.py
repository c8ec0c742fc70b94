"""Wave-38 tests: distribution drift vs a python twin.

Claims pinned:
* distribution_drift equals an exact-integer python recomputation
  (binning, cross-multiplied L1, intdiv ppm, lowest-bin tie break).
* l1_ppm is bounded by the theoretical maximum (2·10^6) and a planted
  fully-disjoint drift hits exactly that bound through the same code
  path (operator-level check on a constructed frame).
"""

from __future__ import annotations

from map_v2_etl_spark.plans.queries_wave38 import _BIN_W, _N_BINS, _SPLIT
from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def test_drift_python_twin(spark):
    import datetime as dt

    split = dt.datetime.fromisoformat(_SPLIT)
    rows = [
        r
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
        if r["value"] is not None
    ]
    hist: dict = {}
    for r in rows:
        b = min(int(r["value"] // _BIN_W), _N_BINS - 1)
        key = (r["event_type"], r["ts"] <= split)
        h = hist.setdefault(key, [0] * _N_BINS)
        h[b] += 1
    types = {t for t, _ in hist}
    want = {}
    for t in types:
        ca = hist.get((t, True), [0] * _N_BINS)
        cb = hist.get((t, False), [0] * _N_BINS)
        na, nb = sum(ca), sum(cb)
        diffs = [abs(ca[i] * nb - cb[i] * na) for i in range(_N_BINS)]
        ppm = (sum(diffs) * 1_000_000) // (na * nb)
        most = max(range(_N_BINS), key=lambda i: (diffs[i], -i))
        want[t] = (na, nb, ppm, most)
    got = {
        r["event_type"]: (
            r["n_first"],
            r["n_second"],
            r["l1_ppm"],
            r["most_drifted_bin"],
        )
        for r in REGISTRY["distribution_drift"].fn(spark, SF).collect()
    }
    assert got == want
    for _, _, ppm, _ in got.values():
        assert 0 <= ppm <= 2_000_000


def test_drift_disjoint_hits_theoretical_max(spark, monkeypatch):
    """Fully disjoint halves (all mass in bin 0 vs bin 19) must land
    at exactly 2,000,000 ppm through the registered plan."""
    import map_v2_etl_spark.plans.queries_wave38 as w38

    rows = []
    for i in range(50):
        rows.append((i, "2024-01-10 00:00:00", "x", 1.0))  # bin 0, first
        rows.append((1000 + i, "2024-01-20 00:00:00", "x", 999.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).selectExpr(
        "event_id",
        "CAST(ts_s AS TIMESTAMP_NTZ) AS ts",
        "event_type",
        "value",
    )
    monkeypatch.setattr(
        w38, "load_table", lambda spark, name, sf_dir: df
    )
    out = w38.q_distribution_drift.__wrapped__(spark, SF) if hasattr(
        w38.q_distribution_drift, "__wrapped__"
    ) else w38.q_distribution_drift(spark, SF)
    r = out.collect()[0]
    assert (r["l1_ppm"], r["most_drifted_bin"]) == (2_000_000, 0)
