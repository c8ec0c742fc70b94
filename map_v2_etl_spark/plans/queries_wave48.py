"""Wave-48 surface (r17): the transactional layer's last two gaps from
the r16 verdict, closed as registered value-hash queries.

* ann_index_rebuild_ptr_topk — the whole-index swap made ATOMIC
  (r16 verdict #1, the last non-atomic pointer flip in the engine):
  the index is written ``versioned=True`` (generation subdirectory +
  a CAS pointer manifest at the index root, Iceberg's metadata-pointer
  swap), and ann_index_rebuild publishes generation N+1 with ONE CAS
  commit instead of two os.rename calls — a reader planning at any
  instant resolves a complete generation. Same oracle as
  ann_index_rebuild_topk (the full fresh-build emission): the
  value-hash certifies rebuild-through-pointer ≡ fresh build.

* manifest_log_pruned_read — manifests carry per-file column min/max
  stats (r16 verdict #2): log_append records footer stats at write
  time and ``log_read(prune=...)`` plans ONLY the stat-overlapping
  files — the certified manifest_pruned_scan shape (queries_wave31)
  composed INTO the commit log. Oracle = the plain filtered aggregate;
  the query raises if pruning failed to skip any file, and
  tests/test_wave48.py asserts the exact planned-file count.

* ann_routed_manifest_topk — the multi-tenant SERVING story end to
  end (r16 verdict #6): per-tenant indexes each persisted
  ``layout="manifest"`` + ``versioned=True``, per-tenant streaming
  adds as batchId-tagged CAS commits, then per-tenant
  ann_index_read handles under tenancy routing (``route=``). Oracle =
  per-tenant incremental-add chains (pq_topk_ctes(base_table=tenant's
  even half, corpus_where=tenant, query_where=tenant)).

Scale notes: the pointer manifest is O(bytes) planning metadata — a
rebuild at 100 TB moves zero data rows at publish time; stats-based
file skip turns a key-ranged read from open-every-footer into
open-only-the-range (Iceberg's posture); the routed serving plan per
tenant keeps the certified query-only shape (routed BHJ + DPP).
Reference parity: the reference engine (build.sh:75-233) has no ANN
or table format; §2.10/§2.11/sink extensions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .queries_wave47 import _TENANTS
from .registry import query


def _ann_rebuild_ptr_oracle() -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
        sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
        residual=True,
    )


@query(
    "ann_index_rebuild_ptr_topk",
    _ann_rebuild_ptr_oracle(),
    tags=["similarity", "ann", "index", "rebuild", "wap",
          "transactions", "manifest"],
)
def q_ann_index_rebuild_ptr_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ATOMIC index rebuild through the root pointer manifest (module
    docstring): write versioned on the even half (the drifted state),
    rebuild on the full corpus — build, stage as generation N+1,
    audit, then ONE CAS pointer flip — and serve the query through
    pointer resolution. The oracle is the FULL fresh-build emission:
    matching it certifies rebuild-through-pointer ≡ fresh build bit
    for bit, with the superseded generation still on disk for
    in-flight readers (ann_index_vacuum's contract). Reference
    parity: no ANN in the reference (build.sh:75-233); §2.11
    extension."""
    from ..operators.similarity import (
        ann_index_build,
        ann_index_rebuild,
        ann_index_topk,
        ann_index_write,
    )
    from .queries_wave43 import _scratch_index_path

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    path = _scratch_index_path()
    ann_index_write(
        ann_index_build(
            base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
        ),
        path,
        versioned=True,
    )
    index = ann_index_rebuild(
        spark, path, emb, m=4, ksub=16, centroid_stride=10,
        train_sample_mod=5,
    )
    return ann_index_topk(index, qs, emb, k=5, candidates=50, nprobe=4)


_N_LOG_FILES = 8
_LOG_LO, _LOG_HI = 120, 260  # doc_id slice, present at every fixture SF

_DUCK_LOG_PRUNED = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE doc_id BETWEEN {_LOG_LO} AND {_LOG_HI}
GROUP BY lang
"""


@query(
    "manifest_log_pruned_read",
    _DUCK_LOG_PRUNED,
    tags=["scan", "manifest", "pruning", "transactions", "stats"],
)
def q_manifest_log_pruned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stats-based file skip ON the commit log (module docstring):
    log_append range-clustered data files (footer stats recorded in
    the manifest at write time), then ``log_read(prune=...)`` plans
    only the doc_id-range-overlapping files — zero footer reads at
    planning time, the skip decided from manifest JSON alone. The
    real predicate still applies on top (pruning is planning
    metadata, never a filter), so the value-hash against the plain
    filtered aggregate certifies that no overlapping file was
    skipped; the in-query guard raises if pruning skipped NOTHING
    (the range is a strict slice of the key space at every fixture
    SF, so a correct skip always drops files)."""
    from ..sources.manifest_log import (
        log_append,
        log_current,
        log_init,
        log_read,
        prune_files,
    )
    from .queries_wave43 import _scratch_index_path

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "n_chars"
    )
    root = os.path.join(_scratch_index_path(), "pruned_log")
    log_init(root)
    log_append(
        docs.repartitionByRange(_N_LOG_FILES, "doc_id")
        .sortWithinPartitions("doc_id"),
        root,
        note="range-clustered append",
    )
    cur = log_current(root)
    kept = prune_files(cur, {"doc_id": (_LOG_LO, _LOG_HI)})
    if not kept or len(kept) >= len(cur["files"]):
        raise RuntimeError(
            "manifest_log_pruned_read: expected a strict file skip, "
            f"planned {len(kept)} of {len(cur['files'])} files"
        )
    pruned = log_read(
        spark, root, prune={"doc_id": (_LOG_LO, _LOG_HI)}
    )
    return (
        pruned.filter(F.col("doc_id").between(_LOG_LO, _LOG_HI))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .localCheckpoint(eager=True)
    )


def _ann_routed_manifest_oracle() -> str:
    """Per-tenant incremental-add chains under tenancy routing: each
    tenant's index TRAINS on its own even half (base_table — the
    frozen quantizers), codes the whole tenant slice (corpus_where —
    build plus the streamed odd half), and answers only its own
    queries (query_where). Disjoint routes need no re-rank: the
    local rank is the global one."""
    from .duck_vec import pq_topk_ctes

    branches = "\n  UNION ALL\n".join(
        f"  SELECT '{name}' AS index_id, q_id, nn_id, rank, cosine "
        "FROM ("
        + pq_topk_ctes(
            m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
            sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
            residual=True,
            base_table=(
                "(SELECT * FROM embeddings WHERE "
                f"({pred}) AND vec_id % 2 = 0) base_t"
            ),
            corpus_where=pred.replace("vec_id", "c.vec_id"),
            query_where=pred,
        )
        + f") s_{name}"
        for name, pred in _TENANTS
    )
    return (
        "SELECT index_id, q_id, nn_id, CAST(rank AS INTEGER) AS rank, "
        f"cosine FROM (\n{branches}\n)"
    )


@query(
    "ann_routed_manifest_topk",
    _ann_routed_manifest_oracle(),
    tags=["similarity", "ann", "index", "multi-tenant", "routing",
          "streaming", "transactions", "manifest"],
)
def q_ann_routed_manifest_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The multi-tenant SERVING story (module docstring): each tenant's
    index is built on its even half, PERSISTED versioned on the
    manifest layout (coded lists = a commit-log table, pointer
    manifest at the root), grows by streaming adds (the tenant's odd
    half as 2 micro-batches, each one batchId-tagged CAS commit),
    and serves through an ann_index_read handle under ``route=``
    predicates — wave-47's fan-out/routing features composed with the
    persisted transactional lifecycle, which is the deployment shape
    (resident per-tenant shards, maintained live). The oracle replays
    both tenants' incremental-add chains with the routing predicate;
    the value-hash certifies per-tenant training isolation, the
    streamed commits, pointer resolution, and routing in one go.
    Reference parity: no ANN in the reference (build.sh:75-233);
    §2.10 x §2.11 extension."""
    from ..operators.similarity import (
        ann_index_build,
        ann_index_write,
        ann_index_read,
        ann_multi_index_topk,
    )
    from ..streaming.ann_maintenance import ann_index_stream_add
    from .queries_wave43 import _scratch_index_path

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    scratch = _scratch_index_path()
    handles = {}
    for name, pred in _TENANTS:
        tenant = emb.filter(F.expr(pred))
        path = os.path.join(scratch, f"tenant_{name}")
        ann_index_write(
            ann_index_build(
                tenant.filter(F.col("vec_id") % 2 == 0),
                m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
            ),
            path,
            partition_by_cell=True,
            layout="manifest",
            versioned=True,
        )
        arrivals = os.path.join(scratch, f"arrivals_{name}")
        tenant.filter(F.col("vec_id") % 2 == 1).repartition(
            2
        ).write.mode("overwrite").parquet(arrivals)
        ann_index_stream_add(spark, path, arrivals)
        handles[name] = ann_index_read(spark, path)
    return ann_multi_index_topk(
        handles, qs, emb, k=5, candidates=50, nprobe=4,
        route={name: F.expr(pred) for name, pred in _TENANTS},
    )
