"""Wave-49 tests (r17): the persisted-signature-store incremental
dedup path (minhash_signature_columns / minhash_lsh_pairs_vs_store)
and its composition with the manifest commit log.

Reference parity: no dedup surface in the reference engine
(build.sh:75-233); MinHash-LSH literature + Iceberg-style commits are
the public blueprints.
"""

import os

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import dedup as D
from map_v2_etl_spark.sources import manifest_log as L
from map_v2_etl_spark.sources.registry import load_table


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in df.collect()
    )


def test_vs_store_decomposition_equals_one_pass(spark, sf_dir):
    """bootstrap self-pairs + per-batch store screens == the one-pass
    full-corpus minhash_lsh_pairs, bit for bit — no pair lost at a
    batch boundary, none duplicated across batches, orientation
    normalized (id_a < id_b throughout)."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text"
    )
    base = docs.filter(F.col("doc_id") % 3 != 0)
    b0 = docs.filter(
        (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)
    )
    b1 = docs.filter(
        (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 1)
    )
    store0 = D.minhash_signature_columns(base)
    inc0 = D.minhash_lsh_pairs_vs_store(b0, store0, docs)
    store1 = store0.unionByName(D.minhash_signature_columns(b0))
    inc1 = D.minhash_lsh_pairs_vs_store(b1, store1, docs)
    got = _pairs(
        D.minhash_lsh_pairs(base, threshold=0.8)
        .unionByName(inc0)
        .unionByName(inc1)
    )
    want = _pairs(D.minhash_lsh_pairs(docs, threshold=0.8))
    assert got == want and len(want) > 0
    for a, b, _ in got:
        assert a < b


def test_signature_store_on_manifest_log(spark, sf_dir, tmp_path):
    """The store as a commit-log table: bootstrap + batch commits are
    batchId-idempotent (a replayed append adds no signature rows), the
    store row count tracks exactly the committed docs, and a screen
    through log_read matches the in-memory store result."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text"
    )
    base = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    root = str(tmp_path / "sig_log")
    L.log_init(root)
    L.log_append(
        D.minhash_signature_columns(base), root, batch_id=-1
    )
    n_base = base.count()
    assert L.log_read(spark, root).count() == n_base
    mem = D.minhash_lsh_pairs_vs_store(
        batch, D.minhash_signature_columns(base), docs
    )
    via_log = D.minhash_lsh_pairs_vs_store(
        batch, L.log_read(spark, root), docs
    )
    assert _pairs(via_log) == _pairs(mem)
    L.log_append(
        D.minhash_signature_columns(batch), root, batch_id=0
    )
    n_all = n_base + batch.count()
    assert L.log_read(spark, root).count() == n_all
    # replayed batch commit: no-op, no duplicate signatures
    L.log_append(
        D.minhash_signature_columns(batch), root, batch_id=0
    )
    assert L.log_read(spark, root).count() == n_all


def test_vs_store_bands_guard():
    """Non-dividing band counts fail fast, same as the one-pass API."""
    import pytest

    with pytest.raises(ValueError, match="bands must divide"):
        D.minhash_lsh_pairs_vs_store(
            None, None, None, num_perm=64, bands=7
        )
