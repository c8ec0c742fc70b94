"""Wave-10 semantics: vocab induction, OOV rates, temperature
sampling, ANN recall observability."""

from __future__ import annotations

import hashlib
import math

import pytest


def test_vocab_induction_is_ranked_and_cumulative(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave10 import q_vocab_induction

    rows = sorted(
        q_vocab_induction(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    cum = 0
    for r in rows:
        cum += r["count"]
        assert r["cum_count"] == cum
        assert r["corpus_tokens"] >= cum


def test_doc_oov_consistent_with_vocab(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave10 import (
        q_doc_oov_rate,
        q_vocab_induction,
    )

    voc = {r["token"] for r in q_vocab_induction(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: [w for w in r["text"].lower().strip().split() if w]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in q_doc_oov_rate(spark, sf_dir).collect()
    }
    for doc_id, toks in docs.items():
        if not toks:
            assert doc_id not in got
            continue
        n_oov = sum(1 for w in toks if w not in voc)
        assert got[doc_id] == (len(toks), n_oov)


def test_temperature_sampling_upweights_tail_sources(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave10 import (
        _TEMP,
        q_sample_temperature,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_n = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    mx = max(src_n.values())
    out = q_sample_temperature(spark, sf_dir).collect()
    # keep decision replays exactly: md5 nibble < derived rate
    for r in out[:200]:
        nib = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[0], 16)
        want_rate = min(
            16, round(8 * (src_n[r["source"]] / mx) ** (_TEMP - 1))
        )
        assert r["keep_nibbles"] == want_rate
        assert nib < want_rate
    # the largest source keeps its baseline 8/16; strictly smaller
    # sources keep more nibbles
    rates = {r["source"]: r["keep_nibbles"] for r in out}
    mx_src = max(src_n, key=src_n.get)
    if mx_src in rates:
        assert rates[mx_src] == 8
    for s, rate in rates.items():
        if src_n[s] < mx / 2:
            assert rate > 8


def test_ann_recall_bounded_and_sane(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave10 import q_ann_recall_report

    rows = q_ann_recall_report(spark, sf_dir).collect()
    assert rows
    total_k = sum(r["k"] for r in rows)
    total_hit = sum(r["n_hit"] for r in rows)
    for r in rows:
        assert 0 <= r["n_hit"] <= r["k"] <= 5
    # sign-LSH at the test scale recovers a solid majority of the exact
    # neighbors (same bound test_similarity asserts for the operator)
    assert total_hit >= 0.5 * total_k
