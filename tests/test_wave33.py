"""Wave-33 tests: media near-dup detection and grouped robust stats.

Claims pinned:
* media_near_dups equals a brute-force python recomputation of the
  full two-gate definition (low-nibble histogram → gradient signature
  → hamming ≤ 2 AND cross-multiplied L1 ≤ τ) over every pair — i.e.
  the pigeonhole banding is LOSSLESS for the hamming gate and the
  verify-join drops nothing.
* The signature actually discriminates on this corpus (many distinct
  signatures — the regression that motivated the low-nibble feature:
  the value-bucket histogram yielded 2 signatures over 500 docs).
* robust_stats equals python statistics.median-based recomputation
  (median, MAD, 1.5-MAD outlier counts) per group.
"""

from __future__ import annotations

import statistics

from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def _low_hist(payload: bytes) -> list[int]:
    h = [0] * 16
    for b in payload:
        h[b & 0x0F] += 1
    return h


def _sig(h: list[int]) -> int:
    return sum(
        (1 << i) for i in range(16) if h[i] > h[(i + 1) % 16]
    )


def test_media_near_dups_bruteforce_twin(spark):
    from map_v2_etl_spark.operators.multimodal import synth_media
    from map_v2_etl_spark.plans.queries_wave33 import _HAM_MAX, _TAU_INV

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = {
        r["media_id"]: bytes(r["payload"])
        for r in synth_media(docs).collect()
    }
    hists = {k: _low_hist(p) for k, p in media.items()}
    sigs = {k: _sig(h) for k, h in hists.items()}
    assert len(set(sigs.values())) > 20, "signature lost discrimination"
    ids = sorted(media)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham > _HAM_MAX:
                continue
            na, nb = len(media[a]), len(media[b])
            num = sum(
                abs(x * nb - y * na) for x, y in zip(hists[a], hists[b])
            )
            if num * _TAU_INV <= na * nb:
                want[(a, b)] = ham
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in REGISTRY["media_near_dups"].fn(spark, SF).collect()
    }
    assert got == want
    assert want, "fixture produced no near-dup pairs"


def test_robust_stats_python_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "lang", "n_chars"
    )
    by_lang: dict = {}
    for r in docs.collect():
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    got = {
        r["lang"]: (
            r["n"],
            r["median_chars"],
            r["mad_chars"],
            r["n_outliers"],
        )
        for r in REGISTRY["robust_stats"].fn(spark, SF).collect()
    }
    assert set(got) == set(by_lang)
    saw_outlier = False
    for lang, xs in by_lang.items():
        med = statistics.median(xs)
        adev = [abs(x - med) for x in xs]
        mad = statistics.median(adev)
        n_out = sum(1 for d in adev if 2 * d > 3 * mad)
        assert got[lang] == (len(xs), float(med), float(mad), n_out), lang
        saw_outlier = saw_outlier or n_out > 0
    assert saw_outlier, "no group exercised the outlier branch"
