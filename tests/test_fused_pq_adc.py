"""Fused full-corpus PQ-ADC pass (r18, VERDICT r17 item 2 second half):
pq_cosine_topk's fused encode+ADC+partial-cut Arrow pass must be
BIT-IDENTICAL to the unfused pq_encode -> crossJoin(LUT) -> window
plan on every edge the unfused expressions handle — planted NULL
embeddings, zero vectors, colinear duplicates, self-matches,
candidates larger than the corpus — and must fall back to the
unfused plan past the LUT gate without changing results."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import map_v2_etl_spark.operators.similarity as S
from map_v2_etl_spark.operators.similarity import pq_cosine_topk


@pytest.fixture(scope="module")
def fuzz_df(spark):
    random.seed(42)
    dim = 8
    rows = []
    for i in range(200):
        if i % 37 == 0:
            rows.append((i, None))  # NULL embedding
        elif i % 23 == 0:
            rows.append((i, [0.0] * dim))  # zero vector
        elif i % 11 == 0:
            # duplicated/colinear unit basis vectors
            rows.append((i, [float(j == i % dim) for j in range(dim)]))
        else:
            rows.append(
                (i, [random.uniform(-1, 1) for _ in range(dim)])
            )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


@pytest.mark.parametrize(
    "cand,k,m,ksub",
    [(10, 3, 2, 4), (500, 5, 4, 4), (3, 2, 2, 8)],
)
def test_fused_equals_unfused(fuzz_df, cand, k, m, ksub):
    qs = fuzz_df.filter(F.col("vec_id") % 7 == 0)
    a = pq_cosine_topk(
        fuzz_df, qs, k=k, m=m, ksub=ksub, candidates=cand, fused=True
    )
    b = pq_cosine_topk(
        fuzz_df, qs, k=k, m=m, ksub=ksub, candidates=cand, fused=False
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra and ra == rb


def test_gate_fallback_identical(fuzz_df, monkeypatch):
    """Past _FUSED_ADC_MAX_Q the fused entry point must run the
    unfused plan — same rows bit-for-bit."""
    qs = fuzz_df.filter(F.col("vec_id") % 7 == 0)
    monkeypatch.setattr(S, "_FUSED_ADC_MAX_Q", 2)  # |Q| = 29 > 2
    c = pq_cosine_topk(
        fuzz_df, qs, k=3, m=2, ksub=4, candidates=10, fused=True
    )
    rc = sorted(map(tuple, c.collect()))
    monkeypatch.undo()
    d = pq_cosine_topk(
        fuzz_df, qs, k=3, m=2, ksub=4, candidates=10, fused=False
    )
    assert rc == sorted(map(tuple, d.collect()))


def test_empty_queries_empty_result(fuzz_df):
    out = pq_cosine_topk(
        fuzz_df,
        fuzz_df.filter("vec_id < 0"),
        k=3,
        m=2,
        ksub=4,
        candidates=10,
        fused=True,
    )
    assert out.count() == 0


def test_registered_query_shape_on_sf(spark, sf_dir):
    """The registered embedding_pq_topk inputs (mod-50 queries,
    mod-5 training sample) through both regimes on the test SF."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    a = pq_cosine_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50,
        train_sample_mod=5, fused=True,
    )
    b = pq_cosine_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50,
        train_sample_mod=5, fused=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )
