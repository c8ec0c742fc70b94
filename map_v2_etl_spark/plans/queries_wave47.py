"""Wave-47 surface: the persisted ANN index ON the manifest commit log
— ``ann_index_write(layout="manifest")`` (r16, r15 verdict #4: the
DEFAULT index lifecycle's compaction-vs-append and compaction-vs-reader
races were solved only for the side-channel ann_index_stream_add_log
composition; this closes them for the index itself).

* ann_index_manifest_topk — the COMPLETE lifecycle on the manifest
  layout, per-cell partitioned: build (even half, frozen quantizers) →
  write with the coded inverted lists as a manifest-log table
  (hive ``cent_id=*/`` data files, so the routed query keeps its DPP
  file skip) → stream-add the odd half as 3 micro-batches, each ONE
  batchId-tagged CAS commit → compact (ONE replace-commit — atomic for
  readers, rebase-safe for racing appends) → reload → query. Oracle =
  the incremental-add oracle (pq_topk_ctes(base_table=even)): the
  value-hash certifies that build + 3 commits + compaction preserve
  the lists bit-for-bit through the transactional layout.

Scale notes: identical query plan to the plain partitioned layout
(routed BHJ + DPP — asserted in tests/test_wave47.py); what changes is
WHO lists the files (an immutable manifest instead of the directory),
which is exactly the Iceberg/Delta posture at 100 TB — planning reads
bytes of JSON, commits move zero rows, and maintenance (compact,
stream add) can run concurrently with queries and with each other.
Reference parity: the reference engine (build.sh:75-233) has no ANN or
table format; §2.10 × §2.11 × sink extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query


#: tenant split: vec_id % 4 < 2 vs >= 2 — chosen (over a parity split)
#: so BOTH tenants contain vec_id % 10 == 0 rows, i.e. both strided
#: coarse codebooks are non-empty (20 % 4 = 0 lands in A, 10 % 4 = 2
#: in B)
_TENANTS = (("lo", "vec_id % 4 < 2"), ("hi", "vec_id % 4 >= 2"))


def _ann_multi_oracle() -> str:
    """Fan-out twin: one full residual-chain emission PER index —
    tenant t's index trains on its own rows (base_table) and codes only
    its own rows (corpus_where over the coded alias), exactly the Spark
    side's per-tenant ann_index_build — then the per-index local top-5
    lists union under an index_id label and ONE k-bounded window takes
    the global top-5 (ties impossible beyond nn_id: the tenant corpora
    are disjoint, so nn_id is unique across the union)."""
    from .duck_vec import pq_topk_ctes

    def emission(pred: str) -> str:
        return pq_topk_ctes(
            m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
            sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
            residual=True,
            base_table=(
                f"(SELECT * FROM embeddings WHERE {pred}) base_t"
            ),
            corpus_where=pred.replace("vec_id", "c.vec_id"),
        )

    branches = "\n    UNION ALL\n".join(
        f"    SELECT '{name}' AS index_id, q_id, nn_id, cosine "
        f"FROM ({emission(pred)}) s_{name}"
        for name, pred in _TENANTS
    )
    return f"""
SELECT index_id, q_id, nn_id, CAST(rank AS INTEGER) AS rank, cosine
FROM (
  SELECT index_id, q_id, nn_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, nn_id ASC) AS rank
  FROM (
{branches}
  )
) WHERE rank <= 5
"""


@query(
    "ann_multi_index_topk",
    _ann_multi_oracle(),
    tags=["similarity", "ann", "index", "multi-tenant", "fanout"],
)
def q_ann_multi_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated fan-out over two per-tenant indexes (disjoint vec_id
    halves, each with its OWN frozen quantizers — the case
    ann_index_merge cannot serve): every query hits both indexes'
    certified query-only paths, the local top-5 lists union under an
    index_id label, and a k-bounded window merges them into the global
    top-5 per query. The oracle replays both residual chains end to
    end and the same merge — the value-hash certifies per-tenant
    training isolation, per-tenant corpus restriction, and the merge
    order in one go. Reference parity: no ANN in the reference
    (build.sh:75-233); §2.11 extension."""
    from ..operators.similarity import (
        ann_index_build,
        ann_multi_index_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    indexes = {
        name: ann_index_build(
            emb.filter(F.expr(pred)),
            m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
        )
        for name, pred in _TENANTS
    }
    return ann_multi_index_topk(
        indexes, qs, emb, k=5, candidates=50, nprobe=4, merge_k=5,
    )


def _lang_agg_split(spark: SparkSession, sf_dir: str):
    """The manifest demos' shared corpus: the per-lang documents
    aggregate split into two commit slices on lang < 'm'. The second
    slice takes NULL langs too (``~coalesce(lang < 'm', false)``) so
    the split is exhaustive — a plain ``~(lang < 'm')`` drops
    NULL-lang rows from BOTH slices while the oracles aggregate every
    row (r16 self-review; latent until the testdata grows a NULL
    lang). Returns (slice_a, slice_b)."""
    docs = load_table(spark, "documents", sf_dir)
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    is_a = F.coalesce(F.col("lang") < "m", F.lit(False))
    return agg.filter(is_a), agg.filter(~is_a)


def _ann_routed_oracle() -> str:
    """Routing twin: per-tenant emission with BOTH sides of the tenant
    predicate — base_table/corpus_where restrict the index to the
    tenant's rows (as in the fan-out oracle) and query_where restricts
    the QUERY set to the tenant's own queries (the routing). The union
    needs no re-rank: routes are disjoint, so each query's rows come
    from exactly one index and the local rank IS the global one."""
    from .duck_vec import pq_topk_ctes

    branches = "\n  UNION ALL\n".join(
        f"  SELECT '{name}' AS index_id, q_id, nn_id, rank, cosine "
        "FROM ("
        + pq_topk_ctes(
            m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
            sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
            residual=True,
            base_table=(
                f"(SELECT * FROM embeddings WHERE {pred}) base_t"
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
    "ann_routed_index_topk",
    _ann_routed_oracle(),
    tags=["similarity", "ann", "index", "multi-tenant", "routing"],
)
def q_ann_routed_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenancy ROUTING over two per-tenant indexes (the other half of
    the multi-index roadmap item — contrast ann_multi_index_topk's
    broadcast fan-out): each tenant's queries hit ONLY that tenant's
    index (`route=` predicates), so a query's neighbors come from its
    own corpus slice with its own frozen quantizers — the vector-store
    resident-shard shape. The oracle replays both tenant residual
    chains with the SAME routing predicate on the query set
    (pq_topk_ctes(query_where=...)) and unions them — no re-rank
    needed, routes are disjoint. Reference parity: no ANN in the
    reference (build.sh:75-233); §2.11 extension."""
    from ..operators.similarity import (
        ann_index_build,
        ann_multi_index_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    indexes = {
        name: ann_index_build(
            emb.filter(F.expr(pred)),
            m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
        )
        for name, pred in _TENANTS
    }
    return ann_multi_index_topk(
        indexes, qs, emb, k=5, candidates=50, nprobe=4,
        route={name: F.expr(pred) for name, pred in _TENANTS},
    )


_DUCK_TIME_TRAVEL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       1 AS version_read,
       4 AS n_versions
FROM documents
WHERE lang < 'm'
GROUP BY lang
"""


@query(
    "manifest_log_time_travel",
    _DUCK_TIME_TRAVEL,
    tags=["sink", "transactions", "manifest", "time-travel"],
)
def q_manifest_log_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (r16): after two append commits AND a
    compaction that absorbed both files, reading version 1 must replay
    the FIRST append exactly — manifests are immutable and data files
    are never rewritten in place, so any un-vacuumed version is a
    perfect snapshot (Iceberg's snapshot read; the flip side of
    log_vacuum's expire-snapshots contract). The oracle is the plain
    aggregate of the first commit's slice; n_versions pins that the
    compaction's replace-commit created v3 without disturbing v1."""
    from ..sources.manifest_log import (
        log_commit,
        log_compact,
        log_init,
        log_read,
        log_versions,
        log_write_data,
    )
    from .queries_wave43 import _scratch_index_path

    part_a, part_b = _lang_agg_split(spark, sf_dir)
    root = os.path.join(_scratch_index_path(), "tt_log")
    log_init(root)
    log_commit(root, log_write_data(part_a, root), note="append A")
    log_commit(root, log_write_data(part_b, root), note="append B")
    log_compact(spark, root)
    n_versions = len(log_versions(root))
    out = log_read(spark, root, version=1).select(
        "lang",
        "n_docs",
        "sum_chars",
        F.lit(1).cast("int").alias("version_read"),
        F.lit(n_versions).cast("int").alias("n_versions"),
    )
    return out.localCheckpoint(eager=True)


_DUCK_SCHEMA_EVOLUTION = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CASE WHEN lang < 'm' THEN NULL
            ELSE CAST(SUM(n_chars) AS BIGINT) END AS sum_chars,
       3 AS log_version,
       1 AS live_files
FROM documents
GROUP BY lang
"""


@query(
    "manifest_log_schema_evolution",
    _DUCK_SCHEMA_EVOLUTION,
    tags=["sink", "transactions", "manifest", "schema-evolution",
          "compaction"],
)
def q_manifest_log_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Add-column schema evolution through the commit log (r16): commit
    A writes (lang, n_docs); commit B adds a sum_chars column; the
    merged read surfaces pre-evolution rows with NULL in the added
    column (Iceberg's add-column semantics via parquet schema merge);
    a compaction rewrites the UNION schema — log_compact merges
    unconditionally, else Spark would infer from one file and silently
    drop the other files' columns — and the final one-file snapshot
    must still carry the NULLs exactly. Version counter 3 (init, A, B,
    compact) and one live file pin the commit arithmetic."""
    from ..sources.manifest_log import (
        log_commit,
        log_compact,
        log_current,
        log_init,
        log_read,
        log_write_data,
    )
    from .queries_wave43 import _scratch_index_path

    part_a, part_b = _lang_agg_split(spark, sf_dir)
    root = os.path.join(_scratch_index_path(), "evo_log")
    log_init(root)
    log_commit(
        root,
        log_write_data(part_a.select("lang", "n_docs"), root),
        note="append A (pre-evolution schema)",
    )
    log_commit(
        root,
        log_write_data(
            part_b.select("lang", "n_docs", "sum_chars"), root
        ),
        note="append B (adds sum_chars)",
    )
    log_compact(spark, root)
    cur = log_current(root)
    out = log_read(spark, root).select(
        "lang",
        "n_docs",
        "sum_chars",
        F.lit(cur["version"]).cast("int").alias("log_version"),
        F.lit(len(cur["files"])).cast("int").alias("live_files"),
    )
    return out.localCheckpoint(eager=True)


def _ann_manifest_oracle() -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
        sample_mod=5, q_mod=50, centroid_stride=10, nprobe=4,
        residual=True,
        base_table="(SELECT * FROM embeddings WHERE vec_id % 2 = 0) base_t",
    )


@query(
    "ann_index_manifest_topk",
    _ann_manifest_oracle(),
    tags=["similarity", "ann", "index", "streaming", "transactions",
          "manifest", "compaction"],
)
def q_ann_index_manifest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index lifecycle on ``layout="manifest"`` (module
    docstring): write → stream-add (3 CAS commits) → compact (1
    replace-commit) → query, per-cell partitioned throughout. The
    result must be bit-identical to ann_index_add on the plain layout
    — same frozen quantizers, same rows — so it certifies against the
    same incremental-add oracle as ann_index_log_topk."""
    from ..operators.similarity import (
        ann_index_build,
        ann_index_compact,
        ann_index_read,
        ann_index_topk,
        ann_index_write,
    )
    from ..streaming.ann_maintenance import ann_index_stream_add
    from .queries_wave43 import _scratch_index_path

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = os.path.join(_scratch_index_path(), "manifest_index")
    ann_index_write(
        index, path, partition_by_cell=True, layout="manifest"
    )
    arrivals = os.path.join(os.path.dirname(path), "_arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)
    ann_index_stream_add(spark, path, arrivals)
    ann_index_compact(spark, path)
    reloaded = ann_index_read(spark, path)
    return ann_index_topk(reloaded, qs, emb, k=5, candidates=50, nprobe=4)
