"""Wave-49 surface (r17): incremental near-dup dedup backed by a
PERSISTED signature store on the manifest commit log — the deployment
form of the engine's dedup family composed with its transactional
layer.

* dedup_signature_log — the corpus's MinHash signatures live as a
  commit-log table (sources/manifest_log): a bootstrap commit seeds the
  base corpus's signatures; each arrival batch (a) screens itself
  against the STORE (banded LSH join on stored signatures — the
  existing corpus is never re-shingled) plus within-batch, with exact
  Jaccard verification (operators/dedup.minhash_lsh_pairs_vs_store),
  and (b) appends its own signatures as one batchId-tagged CAS commit
  (replay-idempotent, compaction-safe — the manifest-log guarantees).
  The union of bootstrap self-pairs and per-batch screens must equal
  the FULL-corpus near-dup pairs, so the query certifies against the
  exact n-gram-Jaccard oracle — the strongest check for an
  incremental decomposition: no pair lost at any batch boundary, no
  pair duplicated across batches.

Scale notes: this is how a training-data pipeline deduplicates at
crawl cadence — signatures are computed once per doc at ingest
(64 bigints/doc, ~0.5 KB — a 100 TB corpus's store is ~50 GB of
parquet, joinable in seconds), each increment pays |batch| shingling
plus a same-bucket-only banded join, and the store's commit log gives
concurrent writers/compactions the same CAS safety as the ANN index's
coded table. Reference parity: the reference engine (build.sh:75-233)
has no dedup surface; §2.11 extension.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .queries_ext import _DUCK_JACCARD_PAIRS
from .registry import query


@query(
    "dedup_signature_log",
    _DUCK_JACCARD_PAIRS,
    tags=["dedup", "minhash", "lsh", "incremental", "transactions",
          "manifest"],
)
def q_dedup_signature_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-store incremental dedup (module docstring): base =
    docs with doc_id % 3 != 0 (bootstrap: self-pairs + signature
    commit), then two arrival batches (the % 3 == 0 docs split by
    parity) each screened via the store and committed. Union of the
    three pair sets == full-corpus pairs, value-hashed against the
    exact-Jaccard oracle."""
    from ..operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_vs_store,
        minhash_signature_columns,
    )
    from ..sources.manifest_log import log_append, log_init, log_read
    from .queries_wave43 import _scratch_index_path

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text"
    )
    base = docs.filter(F.col("doc_id") % 3 != 0)
    batches = [
        docs.filter(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == i)
        )
        for i in (0, 1)
    ]
    root = os.path.join(_scratch_index_path(), "sig_log")
    log_init(root)
    log_append(
        minhash_signature_columns(base),
        root,
        note="bootstrap: base signatures",
        batch_id=-1,
    )
    parts = [minhash_lsh_pairs(base, threshold=0.8)]
    for i, batch in enumerate(batches):
        store = log_read(spark, root)
        parts.append(
            minhash_lsh_pairs_vs_store(
                batch, store, docs, threshold=0.8
            )
        )
        log_append(
            minhash_signature_columns(batch),
            root,
            note=f"arrival batch {i}",
            batch_id=i,
        )
    return (
        reduce(lambda a, b: a.unionByName(b), parts)
        .localCheckpoint(eager=True)
    )
