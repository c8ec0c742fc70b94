"""Wave-7 semantics: PMI collocations, tf-idf similarity pairs,
duplicated-span scoring, streaming dedup-within-watermark. Pure-Python
twins on small inputs; oracle parity at sf0.01 is the driver gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "new york is big and new york is busy"),
        (1, "new york is big and new york is loud"),
        (2, "los angeles is big and los angeles is warm"),
        (3, "completely different words entirely here now"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pmi_twin(texts, min_pair=1):
    uni, bi = {}, {}
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n1, n2 = sum(uni.values()), sum(bi.values())
    out = {}
    for (a, b), c2 in bi.items():
        if c2 >= min_pair:
            out[(a, b)] = round(
                math.log((c2 * n1 * n1) / (n2 * uni[a] * uni[b])), 6
            )
    return out


def test_collocations_pmi_matches_twin(tiny_docs, monkeypatch):
    import map_v2_etl_spark.plans.queries_wave7 as W7

    bg = W7.doc_bigrams(tiny_docs)
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    n2 = bc.agg(F.sum("c2").cast("long").alias("n2"))
    from map_v2_etl_spark.operators.dedup import tokens

    u = (
        tiny_docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    n1 = u.agg(F.sum("c1").cast("long").alias("n1"))
    got = {
        (r["w1"], r["w2"]): round(r["pmi"], 6)
        for r in bc.join(
            u.select(F.col("w").alias("w1"), F.col("c1").alias("c1a")), "w1"
        )
        .join(u.select(F.col("w").alias("w2"), F.col("c1").alias("c1b")), "w2")
        .crossJoin(n1)
        .crossJoin(n2)
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c2") * F.col("n1") * F.col("n1"))
                    / (F.col("n2") * F.col("c1a") * F.col("c1b"))
                ),
                6,
            ).alias("pmi"),
        )
        .collect()
    }
    want = _pmi_twin([r["text"] for r in tiny_docs.collect()])
    assert got == want
    # 'los angeles' is a tighter collocation than 'is big'
    assert got[("los", "angeles")] > got[("is", "big")]


def test_tfidf_pairs_matches_twin(spark):
    shared = " ".join(f"w{i}" for i in range(12))
    rows = [
        (0, shared + " busy"),
        (1, shared + " loud"),
        # gives busy/loud df=2 so the 0/1 pair's cosine is 12/13 ≈ 0.923
        (2, "busy loud unrelated words over here"),
        (3, "entirely different vocabulary in this document"),
    ]
    tiny_docs = spark.createDataFrame(rows, ["doc_id", "text"])
    texts = {r["doc_id"]: r["text"] for r in tiny_docs.collect()}
    n = len(texts)
    tw, dfq = {}, {}
    for d, t in texts.items():
        for w in t.lower().split():
            tw[(d, w)] = tw.get((d, w), 0) + 1
    for (d, w), _ in tw.items():
        dfq[w] = dfq.get(w, 0) + 1
    wts = {
        (d, w): tf * math.log(n / dfq[w]) for (d, w), tf in tw.items()
    }
    nrm = {}
    for (d, w), v in wts.items():
        nrm[d] = nrm.get(d, 0.0) + v * v
    nrm = {d: math.sqrt(v) for d, v in nrm.items()}
    want = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dp = sum(
                wts[(a, w)] * wts[(b, w)]
                for w in {w for (d, w) in wts if d == a}
                & {w for (d, w) in wts if d == b}
            )
            if nrm[a] and nrm[b]:
                c = round(dp / (nrm[a] * nrm[b]), 6)
                if c >= 0.5:
                    want[(a, b)] = c

    # run the registry query body against the tiny frame via temp parquet
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        tiny_docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/documents.parquet")
        from map_v2_etl_spark.plans import queries_wave7 as W7

        # lower the gate to 0.5 for the tiny corpus by filtering ourselves:
        got_df = W7.q_tfidf_similar_pairs.__wrapped__ if hasattr(
            W7.q_tfidf_similar_pairs, "__wrapped__"
        ) else W7.q_tfidf_similar_pairs
        rows = got_df(tiny_docs.sparkSession, tmp).collect()
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in rows}
    want_gated = {k: v for k, v in want.items() if v >= 0.9}
    assert got == want_gated
    assert (0, 1) in got  # the two near-identical docs pass the 0.9 gate


def test_dup_span_score_counts_cross_doc_grams(spark):
    base = "a b c d e f g h i j k l m n o p"  # 16 tokens -> 9 8-grams
    rows = [
        (0, base),
        (1, base + " q r s"),  # shares the first 9 8-grams with doc 0
        (2, "z y x w v u t s r q p o n m l k"),  # unique grams
        (3, "too short"),  # < 8 tokens -> excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(
            f"{tmp}/documents.parquet"
        )
        from map_v2_etl_spark.plans.queries_wave7 import q_dup_span_score

        got = {
            r["doc_id"]: (r["n_grams"], r["n_shared"], r["keep"])
            for r in q_dup_span_score(spark, tmp).collect()
        }
    assert got[0] == (9, 9, 0)  # every gram of doc 0 is inside doc 1
    assert got[1] == (12, 9, 0)  # 9 shared + 3 tail-only grams
    assert got[2] == (9, 0, 1)
    assert 3 not in got


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave7 import q_events_dedup_stream
    from map_v2_etl_spark.sources.registry import load_table

    got = {
        (r["user_id"], r["event_type"])
        for r in q_events_dedup_stream(spark, sf_dir).collect()
    }
    want = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, "events", sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want
