"""Wave-6 semantics: bigram LM scoring, DSIR weights, chunking, PCA,
Z-order layout. Each operator is checked against an independent
pure-Python/NumPy twin on small inputs (oracle parity at sf0.01 is
covered by tools/check_oracle.py / the driver gate)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators import lm as LM
from map_v2_etl_spark.operators.pca import (
    gram_stats,
    pca_project,
    principal_components,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat sat on the hat", "en"),
    (2, "der hund lief durch den park", "de"),
    (3, "one", "en"),  # single token -> no bigrams
    (4, "the the the the", "en"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def _py_bigrams(text):
    toks = [w for w in text.lower().strip().split() if w]
    return list(zip(toks, toks[1:]))


def test_bigram_ll_matches_python_twin(docs_df):
    bc, uc = {}, {}
    vocab = set()
    for _, text, _ in DOCS:
        vocab.update(w for w in text.lower().split() if w)
        for bg in _py_bigrams(text):
            bc[bg] = bc.get(bg, 0) + 1
            uc[bg[0]] = uc.get(bg[0], 0) + 1
    v = len(vocab)
    expected = {}
    for doc_id, text, _ in DOCS:
        bgs = _py_bigrams(text)
        if not bgs:
            expected[doc_id] = (0, None)
            continue
        ll = sum(math.log((bc[b] + 1) / (uc[b[0]] + v)) for b in bgs)
        expected[doc_id] = (
            len(bgs),
            round(-ll / len(bgs) / math.log(2), 6),
        )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_bigram"])
        for r in LM.bigram_ll(docs_df).collect()
    }
    assert got == expected


def test_bigram_ll_orders_repetition_below_novelty(docs_df):
    """'the the the the' is maximally predictable under a corpus where
    'the the' dominates its own context; doc 2 (all-unseen-once German)
    must score strictly higher bits than doc 4."""
    got = {
        r["doc_id"]: r["bits_per_bigram"]
        for r in LM.bigram_ll(docs_df).collect()
    }
    assert got[4] < got[2]


def test_dsir_weights_matches_python_twin(docs_df):
    B = 64
    target = {d for d, _, lang in DOCS if lang == "en"}

    def bucket(w1, w2):
        h = hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8]
        return int(h, 16) % B

    feats = {}  # doc -> [bucket]
    for doc_id, text, _ in DOCS:
        feats[doc_id] = [bucket(*bg) for bg in _py_bigrams(text)]
    tc, rc = {}, {}
    for doc_id, bs in feats.items():
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
            if doc_id in target:
                tc[b] = tc.get(b, 0) + 1
    nt, nr = sum(tc.values()), sum(rc.values())
    lw = {
        b: math.log(
            ((tc.get(b, 0) + 1) / (nt + B)) / ((rc[b] + 1) / (nr + B))
        )
        for b in rc
    }
    expected = {}
    for doc_id, bs in feats.items():
        if not bs:
            expected[doc_id] = (0, None)
        else:
            expected[doc_id] = (len(bs), round(sum(lw[b] for b in bs), 6))
    got = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in LM.dsir_weights(
            docs_df, F.col("lang") == "en", buckets=B
        ).collect()
    }
    assert got == expected
    # English docs should lean positive vs the German doc
    assert got[2][1] < max(got[0][1], got[1][1])


def test_chunking_covers_and_overlaps(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave6 import q_chunk_documents

    chunks = q_chunk_documents(spark, sf_dir).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: [w for w in r["text"].lower().strip().split() if w]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert set(by_doc) == {d for d, t in docs.items() if t}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        toks = docs[doc_id]
        # chunk starts advance by the stride; indices are dense from 0
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        covered = set()
        for r in rows:
            words = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert len(words) == r["n_tokens"] <= 32
            start = r["start_tok"] - 1
            assert words == toks[start : start + r["n_tokens"]]
            covered.update(range(start, start + r["n_tokens"]))
        assert covered == set(range(len(toks)))  # every token in >=1 chunk


def test_gram_stats_and_pca_match_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.randn(300, 6) @ np.diag([5, 3, 2, 1, 0.5, 0.1]) + rng.randn(6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    n, mean, cov = gram_stats(df, "embedding")
    assert n == 300
    np.testing.assert_allclose(mean, x.mean(0), rtol=1e-9)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-7)

    comps, eigvals = principal_components(cov, 3)
    proj = pca_project(df, k=3, id_col="vec_id", vec_col="embedding")
    got = np.array(
        [
            [r["pc0"], r["pc1"], r["pc2"]]
            for r in proj.orderBy("vec_id").collect()
        ]
    )
    want = (x - x.mean(0)) @ comps.T
    np.testing.assert_allclose(got, np.round(want, 6), atol=2e-6)
    # projections realize the eigenvalue variances (bias=True)
    np.testing.assert_allclose(got.var(0), eigvals, rtol=1e-3)


def _py_morton(xi, yi, bits=16):
    z = 0
    for i in range(bits):
        z |= ((xi >> i) & 1) << (2 * i)
        z |= ((yi >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_is_morton_interleave(spark, sf_dir):
    from map_v2_etl_spark.plans.queries_wave6 import q_zorder_layout

    rows = q_zorder_layout(spark, sf_dir).collect()
    assert rows, "zorder_layout returned nothing"
    for r in rows[:50]:
        assert 0 <= r["x_scaled"] <= 65535 and 0 <= r["y_scaled"] <= 65535
        assert r["zkey"] == _py_morton(r["x_scaled"], r["y_scaled"])
    assert [r["zkey"] for r in rows] == sorted(r["zkey"] for r in rows)


def test_write_zordered_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """The point of the layout: after Z-order clustering, each file's
    min/max envelope covers a small fraction of BOTH dimensions, so
    either predicate prunes. Compare against the same data written with
    the same file count but no clustering."""
    import pyarrow.parquet as pq

    from map_v2_etl_spark.sources.parquet_io import write_zordered

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    b = orders.agg(
        F.min("o_custkey").alias("cmin"), F.max("o_custkey").alias("cmax")
    ).first()
    span = b["cmax"] - b["cmin"]
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    )
    def files_avg_span(path, col):
        import glob

        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(
                    [md.schema.column(c).name for c in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [md.schema.column(c).name for c in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return sum(spans) / len(spans), len(spans)

    keyed = (
        orders.crossJoin(
            F.broadcast(
                orders.agg(
                    F.min("o_custkey").alias("cmin"),
                    F.max("o_custkey").alias("cmax"),
                    F.min(day).alias("dmin"),
                    F.max(day).alias("dmax"),
                )
            )
        )
        .withColumn(
            "xi",
            F.expr(
                "CAST((o_custkey - cmin) * 65535 DIV greatest(cmax - cmin, 1) AS BIGINT)"
            ),
        )
        .withColumn("_d", day)
        .withColumn(
            "yi",
            F.expr(
                "CAST((_d - dmin) * 65535 DIV greatest(dmax - dmin, 1) AS BIGINT)"
            ),
        )
        .withColumn(
            "zkey",
            F.expr(
                "CAST("
                + " | ".join(
                    f"(((xi >> {i}) & 1) << {2 * i}) | "
                    f"(((yi >> {i}) & 1) << {2 * i + 1})"
                    for i in range(16)
                )
                + " AS BIGINT)"
            ),
        )
        .drop("cmin", "cmax", "dmin", "dmax", "_d", "xi", "yi")
    )

    zpath, npath = str(tmp_path / "zord"), str(tmp_path / "plain")
    write_zordered(keyed, zpath, "zkey", num_files=8)
    keyed.drop("zkey").repartition(8).write.parquet(npath)

    z_span, z_files = files_avg_span(zpath, "o_custkey")
    n_span, n_files = files_avg_span(npath, "o_custkey")
    assert z_files >= 4 and n_files >= 4
    # unclustered files each cover ~the whole custkey range; z-ordered
    # files cover a contiguous curve segment — well under half of it
    assert n_span > 0.9 * span
    assert z_span < 0.6 * span
