"""Wave-30 tests: Merkle segment-checksum replica reconciliation.

Claims pinned:
* The segmented protocol finds EXACTLY the keys a direct (unsegmented)
  full-outer diff finds — segmentation is result-invisible — and all
  three statuses (only_a / only_b / changed) are exercised by the
  deterministic divergence.
* Pruning is real: most segments match (equal checksum+count) and are
  excluded from the drill-down; every differing key lives in a segment
  flagged mismatched.
* Identical replicas reconcile with ZERO mismatched segments (the
  healthy-pair fast path), and the checksum is order-insensitive
  (permuting replica rows cannot change a segment summary).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_v2_etl_spark.plans.queries_wave30 import (
    _CORRUPT_MOD,
    _MISSING_MOD,
    _N_SEG,
    _lww_state,
    _perturbed_replica,
    _seg_summary,
    _segmented,
)
from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.01"


def _states(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a_state = _lww_state(ev)
    a = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in a_state.collect()
    }
    b = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in _perturbed_replica(a_state).collect()
    }
    return a, b


def test_merkle_diff_equals_direct_diff(spark):
    a, b = _states(spark)
    direct = {}
    for uid in set(a) | set(b):
        if uid not in b:
            direct[uid] = "only_a"
        elif uid not in a:
            direct[uid] = "only_b"
        elif a[uid] != b[uid]:
            direct[uid] = "changed"
    out = REGISTRY["replica_merkle_diff"].fn(spark, SF).collect()
    assert {r["user_id"]: r["status"] for r in out} == direct
    assert set(direct.values()) == {"only_a", "only_b", "changed"}
    for r in out:
        # Spark/DuckDB % is C-style truncated division (sign of the
        # dividend), unlike Python's floored % — mirror it
        uid = r["user_id"]
        c_mod = uid % _N_SEG if uid >= 0 else -((-uid) % _N_SEG)
        assert r["seg"] == c_mod
        if r["status"] == "only_b":
            assert r["user_id"] == -1
        elif r["status"] == "only_a":
            assert r["user_id"] % _MISSING_MOD == 0
        else:
            assert r["user_id"] % _CORRUPT_MOD == 0


def test_merkle_pruning_is_real(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a_state = _lww_state(ev)
    sa = {
        r["seg"]: (r["cks"], r["n"])
        for r in _seg_summary(_segmented(a_state)).collect()
    }
    sb = {
        r["seg"]: (r["cks"], r["n"])
        for r in _seg_summary(
            _segmented(_perturbed_replica(a_state))
        ).collect()
    }
    matching = {s for s in sa if s in sb and sa[s] == sb[s]}
    mismatched = (set(sa) | set(sb)) - matching
    # sparse divergence ⇒ the summary stage must prune MOST segments
    assert len(matching) > len(mismatched), (len(matching), len(mismatched))
    diff_segs = {
        r["seg"]
        for r in REGISTRY["replica_merkle_diff"].fn(spark, SF).collect()
    }
    assert diff_segs <= mismatched
    assert not (diff_segs & matching)


def test_identical_replicas_and_order_insensitivity(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = _segmented(_lww_state(ev))
    a = {(r["seg"]): (r["cks"], r["n"]) for r in _seg_summary(rows).collect()}
    b = {
        (r["seg"]): (r["cks"], r["n"])
        for r in _seg_summary(rows.orderBy(F.rand(seed=7))).collect()
    }
    # order-insensitive fold + healthy pair: zero mismatched segments
    assert a == b
