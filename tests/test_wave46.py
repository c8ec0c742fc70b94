"""Wave-46 tests: the manifest commit log — CAS linearization under
racing committers, rebase semantics (append vs compact in either
order), replay idempotence that SURVIVES compaction, orphan
invisibility + vacuum, and the streaming ANN composition's
crash → compact → restart exactly-once pin.

Reference parity: the reference engine (build.sh:75-233) has no table
format; Iceberg/Delta are the public blueprints.
"""

import os
import threading

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources import manifest_log as L
from map_v2_etl_spark.sources.registry import load_table
from map_v2_etl_spark.streaming.ann_maintenance import (
    ann_index_stream_add_log,
)


def _mk(spark, tmp_path, n=20):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(n)], "k LONG, v LONG"
    )
    root = str(tmp_path / "log")
    L.log_init(root)
    return df, root


def _vals(spark, root):
    return sorted(
        (r["k"], r["v"]) for r in L.log_read(spark, root).collect()
    )


def test_commit_read_roundtrip_and_versions(spark, tmp_path):
    df, root = _mk(spark, tmp_path)
    f1 = L.log_write_data(df.filter("k < 10"), root)
    L.log_commit(root, f1)
    f2 = L.log_write_data(df.filter("k >= 10"), root)
    m = L.log_commit(root, f2)
    assert m["version"] == 2
    assert _vals(spark, root) == sorted((i, i * 10) for i in range(20))


def test_cas_race_loses_no_commit(spark, tmp_path):
    """N threads race single-file commits; every file must be live in
    the final manifest and versions strictly sequential — the O_EXCL
    CAS linearizes, the rebase preserves."""
    df, root = _mk(spark, tmp_path)
    # pre-write the data files serially (Spark sessions aren't
    # thread-friendly for writes in this harness); race only the CAS
    files = [
        L.log_write_data(df.filter(F.col("k") == i), root)
        for i in range(12)
    ]
    errs = []

    def commit(fs):
        try:
            L.log_commit(root, fs)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=commit, args=(fs,)) for fs in files]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    cur = L.log_current(root)
    assert cur["version"] == 12
    assert set(cur["files"]) == {f for fs in files for f in fs}
    assert _vals(spark, root) == sorted((i, i * 10) for i in range(12))


def test_orphans_invisible_and_vacuumed(spark, tmp_path):
    """Data files written but never committed (the crash window) are
    invisible to readers and reclaimed by vacuum; vacuum also drops
    absorbed files + expired manifests."""
    df, root = _mk(spark, tmp_path)
    L.log_commit(root, L.log_write_data(df.filter("k < 10"), root))
    orphan = L.log_write_data(df.filter("k >= 10"), root)  # no commit
    assert _vals(spark, root) == sorted((i, i * 10) for i in range(10))
    L.log_compact(spark, root)
    deleted = L.log_vacuum(root, keep_versions=1, orphan_grace_sec=0.0)
    assert set(orphan) <= set(deleted)
    data = os.listdir(os.path.join(root, "data"))
    cur = L.log_current(root)
    assert sorted(data) == cur["files"]  # only live files remain
    assert _vals(spark, root) == sorted((i, i * 10) for i in range(10))


def test_replay_idempotent_even_after_compaction(spark, tmp_path):
    """THE upgrade over batchId-keyed file names: a batch commit
    replayed AFTER a compaction absorbed its file is still a no-op —
    the stream_batches set rides the manifests."""
    df, root = _mk(spark, tmp_path)
    batch = df.filter("k < 5")
    L.log_commit(root, L.log_write_data(batch, root), batch_id=7)
    before = _vals(spark, root)
    # plain replay
    L.log_commit(root, L.log_write_data(batch, root), batch_id=7)
    assert _vals(spark, root) == before
    # compaction absorbs the batch's file, then the replay arrives
    L.log_compact(spark, root)
    m = L.log_commit(root, L.log_write_data(batch, root), batch_id=7)
    assert 7 in m["meta"]["stream_batches"]
    assert _vals(spark, root) == before, "replay after compaction duplicated"


def test_append_vs_compact_interleave_converges(spark, tmp_path):
    """Compaction computed from a stale snapshot must rebase over a
    concurrent append: both files' rows survive, in either commit
    order."""
    df, root = _mk(spark, tmp_path)
    L.log_commit(root, L.log_write_data(df.filter("k < 10"), root))
    stale = L.log_current(root)  # compaction's snapshot
    compacted = L.log_write_data(
        L.log_read(spark, root).coalesce(1), root
    )
    # a concurrent append commits FIRST
    L.log_commit(root, L.log_write_data(df.filter("k >= 10"), root))
    # the compaction's commit rebases: removes only the stale files
    L.log_commit(root, compacted, remove_files=stale["files"])
    assert _vals(spark, root) == sorted((i, i * 10) for i in range(20))


def test_conflicting_compactions_raise(spark, tmp_path):
    """Two compactions absorbing the same files: the loser's remove-set
    is no longer live — ConflictError, never a silent drop."""
    df, root = _mk(spark, tmp_path)
    L.log_commit(root, L.log_write_data(df.filter("k < 10"), root))
    stale = L.log_current(root)
    loser_files = L.log_write_data(
        L.log_read(spark, root).coalesce(1), root
    )
    L.log_compact(spark, root)  # winner commits first
    with pytest.raises(L.ConflictError):
        L.log_commit(root, loser_files, remove_files=stale["files"])


def test_ann_log_stream_crash_compact_restart_exactly_once(
    spark, sf_dir, tmp_path
):
    """The strongest streaming pin: crash after batch 0's COMMIT but
    before its checkpoint commits, run a COMPACTION while down (the
    case the wave-45 file-name guard cannot survive, documented at
    ann_index_compact), restart, drain — the final lists must be
    duplicate-free and bit-identical to the one-shot add."""
    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    index = S.ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    log_path = str(tmp_path / "coded_log")
    arrivals = str(tmp_path / "arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)

    with pytest.raises(Exception, match="_test_crash_after_commit"):
        ann_index_stream_add_log(
            spark, index, log_path, arrivals,
            _test_crash_after_commit={0},
        )
    L.log_compact(spark, log_path)  # maintenance runs while stream is down
    grown = ann_index_stream_add_log(spark, index, log_path, arrivals)

    dup = (
        grown["coded"].groupBy("nn_id").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0, "replayed batch duplicated rows through compaction"
    want = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in S.ann_index_add(index, extra)["coded"].collect()
    )
    got = sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in grown["coded"].collect()
    )
    assert got == want


def test_vacuum_grace_spares_inflight_writers(spark, tmp_path):
    """Iceberg's older_than contract: an unreferenced data file younger
    than the grace window is spared (it may belong to a writer that has
    staged data but not yet won its commit CAS); grace 0 reclaims it."""
    df, root = _mk(spark, tmp_path)
    L.log_commit(root, L.log_write_data(df.filter("k < 10"), root))
    inflight = L.log_write_data(df.filter("k >= 10"), root)  # no commit yet
    spared = L.log_vacuum(root, keep_versions=1, orphan_grace_sec=3600)
    assert not (set(inflight) & set(spared))
    # the writer now wins its commit: the table must be whole
    L.log_commit(root, inflight)
    assert _vals(spark, root) == sorted((i, i * 10) for i in range(20))
    # a drained pipeline reclaims at grace 0 (nothing unreferenced left)
    assert L.log_vacuum(root, keep_versions=1, orphan_grace_sec=0.0) == []
