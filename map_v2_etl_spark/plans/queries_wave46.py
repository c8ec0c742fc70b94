"""Wave-46 surface: the MANIFEST COMMIT LOG (sources/manifest_log) —
the minimal transactional table layout that closes the one concurrency
gap r15's index lifecycle documents instead of solving (compaction
racing a concurrent append on a plain directory-of-parquet table), plus
its ANN composition (the inverted lists as the log's first customer).

* manifest_log_commits — the generic lifecycle on the documents table:
  init → commit(A) → commit(B, append) → compact (atomic
  replace-commit) → vacuum (reclaim absorbed files + old manifests) →
  read the final snapshot. The oracle is the plain aggregate the
  snapshot must equal — value-hash certifies that four commits, a
  compaction, and a vacuum preserve the TABLE exactly (and the exposed
  version/file counters pin the manifest arithmetic).

* ann_index_log_topk — streaming adds exactly-once ACROSS compactions:
  quantizers train on the even half (frozen); the odd half streams in
  as micro-batches, each published with ONE batchId-tagged CAS commit;
  a compaction commit absorbs the fragments; the query runs over the
  compacted snapshot. Same value-hash oracle as ann_index_add_topk.
  This is strictly stronger than wave-45's batchId-keyed file names:
  the manifest's stream_batches set survives compaction, so a replay
  AFTER a compaction is still a no-op (test-pinned in
  tests/test_wave46.py — the case the plain layout documents as its
  residual caveat at ann_index_compact).

Scale notes: manifests are O(live files) JSON — bytes, not data;
commits move zero rows; readers plan from the file list (no directory
listing, orphans invisible by construction). Iceberg/Delta are the
public blueprints (optimistic CAS + rebase, expire-snapshots vacuum).
Reference parity: the reference engine (build.sh:75-233) has no table
format; §2 sink extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

_DUCK_LOG_COMMITS = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       3 AS log_version,
       1 AS live_files
FROM documents
GROUP BY lang
"""


@query(
    "manifest_log_commits",
    _DUCK_LOG_COMMITS,
    tags=["sink", "transactions", "manifest", "compaction", "vacuum"],
)
def q_manifest_log_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic manifest-log lifecycle (module docstring): two append
    commits split the lang aggregate, a compaction commit atomically
    replaces them with one file, vacuum reclaims the absorbed files and
    expired manifests, and the final snapshot must equal the plain
    one-shot aggregate — with the version counter at 3 (v0 init, v1/v2
    appends, v3 compaction; vacuum keeps the newest manifest without
    renumbering it) and exactly ONE live file."""
    from ..sources.manifest_log import (
        log_commit,
        log_compact,
        log_current,
        log_init,
        log_read,
        log_vacuum,
        log_write_data,
    )

    # under the swept scratch root (r16, r15 verdict #7): the previous
    # tempfile.mkdtemp leaked one small /tmp dir per gate run; the
    # wave-43 sweeper reclaims this one on a later session instead
    from .queries_wave43 import _scratch_index_path

    # NULL-safe exhaustive split (r16 self-review) — see
    # queries_wave47._lang_agg_split's docstring
    from .queries_wave47 import _lang_agg_split

    root = os.path.join(_scratch_index_path(), "manifest_log")
    log_init(root)
    part_a, part_b = _lang_agg_split(spark, sf_dir)
    log_commit(root, log_write_data(part_a, root), note="append A")
    log_commit(root, log_write_data(part_b, root), note="append B")
    log_compact(spark, root)
    # grace 0: this scratch table has no concurrent writers by
    # construction, so the vacuum demonstration reclaims immediately
    log_vacuum(root, keep_versions=1, orphan_grace_sec=0.0)
    cur = log_current(root)
    out = log_read(spark, root).select(
        "lang",
        "n_docs",
        "sum_chars",
        F.lit(cur["version"]).cast("int").alias("log_version"),
        F.lit(len(cur["files"])).cast("int").alias("live_files"),
    )
    # materialize before the temp dir can be cleaned by the OS; the
    # driver collects lazily after this function returns
    return out.localCheckpoint(eager=True)


def _ann_log_oracle() -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
        sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
        residual=True,
        base_table="(SELECT * FROM embeddings WHERE vec_id % 2 = 0) base_t",
    )


@query(
    "ann_index_log_topk",
    _ann_log_oracle(),
    tags=["similarity", "ann", "index", "streaming", "transactions",
          "manifest"],
)
def q_ann_index_log_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-maintained inverted lists on the MANIFEST COMMIT LOG
    (streaming/ann_maintenance.ann_index_stream_add_log): the even half
    builds the quantizers (frozen); the odd half arrives as 3
    micro-batches, each one batchId-tagged CAS commit (exactly-once
    across compactions — module docstring); a compaction commit absorbs
    the fragments; the query serves from the compacted snapshot via the
    handle's coded frame. Oracle = the incremental-add oracle: the
    transactional layout must preserve the table bit-for-bit through
    seed + 3 commits + compaction. Reference parity: no ANN or table
    format in the reference (build.sh:75-233); §2.10 × §2.11 × sink
    extension."""
    from ..operators.similarity import (
        ann_index_build,
        ann_index_topk,
    )
    from ..sources.manifest_log import log_compact, log_read
    from ..streaming.ann_maintenance import ann_index_stream_add_log
    from .queries_wave43 import _scratch_index_path

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    log_path = os.path.join(_scratch_index_path(), "coded_log")
    arrivals = os.path.join(os.path.dirname(log_path), "_arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)
    index = ann_index_stream_add_log(spark, index, log_path, arrivals)
    log_compact(spark, log_path)
    index = {**index, "coded": log_read(spark, log_path)}
    return ann_index_topk(index, qs, emb, k=5, candidates=50, nprobe=4)
