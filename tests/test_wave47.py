"""Wave-47 tests: the persisted ANN index on the manifest commit log
(ann_index_write(layout="manifest")) plus the r16 manifest-log
upgrades — partitioned data files with recovered partition columns and
DPP, byte-target log_compact, manifest age-gated vacuum + .tmp
reclaim, seed-commit idempotence, stream_batches watermark, and the
scratch sweeper's real-age gate.

Reference parity: the reference engine (build.sh:75-233) has no ANN
surface or table format; Iceberg/Delta/Faiss are the public blueprints.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources import manifest_log as L
from map_v2_etl_spark.sources.registry import load_table
from map_v2_etl_spark.streaming.ann_maintenance import (
    ann_index_stream_add,
    ann_index_stream_add_log,
)


def _rows(df):
    return sorted(
        (r["q_id"], r["nn_id"], r["rank"], round(r["cosine"], 9))
        for r in df.collect()
    )


def _coded_rows(index):
    return sorted(
        (r["nn_id"], int(r["cent_id"]), tuple(r["codes"]))
        for r in index["coded"].collect()
    )


def _build(spark, sf_dir, half=True):
    emb = load_table(spark, "embeddings", sf_dir)
    corpus = emb.filter(F.col("vec_id") % 2 == 0) if half else emb
    return emb, S.ann_index_build(
        corpus, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )


def test_manifest_layout_roundtrip_bit_parity(spark, sf_dir, tmp_path):
    """layout='manifest' (flat and per-cell) round-trips the index
    bit-identically to the plain layout: same coded rows, same exact
    cent_id type, same query results."""
    emb, index = _build(spark, sf_dir, half=False)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    plain, mflat, mpart = (
        str(tmp_path / d) for d in ("plain", "mflat", "mpart")
    )
    S.ann_index_write(index, plain)
    S.ann_index_write(index, mflat, layout="manifest")
    S.ann_index_write(
        index, mpart, partition_by_cell=True, layout="manifest"
    )
    r_plain = S.ann_index_read(spark, plain)
    want = _coded_rows(r_plain)
    got_plain = _rows(
        S.ann_index_topk(r_plain, qs, emb, k=5, candidates=50, nprobe=4)
    )
    for path in (mflat, mpart):
        r = S.ann_index_read(spark, path)
        assert r["params"]["layout"] == "manifest"
        assert (
            r["coded"].schema["cent_id"].dataType
            == r_plain["coded"].schema["cent_id"].dataType
        )
        assert _coded_rows(r) == want
        assert _rows(
            S.ann_index_topk(r, qs, emb, k=5, candidates=50, nprobe=4)
        ) == got_plain


def test_manifest_partitioned_layout_keeps_dpp(spark, sf_dir, tmp_path):
    """The DPP file skip survives the manifest layout: data files carry
    the hive cent_id=*/ subpath, log_read recovers the partition column
    via basePath, and the routed query plan shows dynamic partition
    pruning on the coded scan — file-level pruning equivalent to the
    plain hive directory (r15 verdict #4's 'DPP-equivalent file pruning
    asserted')."""
    emb, index = _build(spark, sf_dir, half=False)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "mpart")
    S.ann_index_write(
        index, path, partition_by_cell=True, layout="manifest"
    )
    cur = L.log_current(path + "/coded")
    assert cur["files"] and all(
        f.startswith("cent_id=") for f in cur["files"]
    ), cur["files"]
    df = S.ann_index_topk(
        S.ann_index_read(spark, path), qs, emb, k=5, candidates=50,
        nprobe=4,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan


def test_manifest_stream_add_compact_query_lifecycle(
    spark, sf_dir, tmp_path
):
    """write -> stream-add (3 batchId-tagged CAS commits) -> compact
    (one replace-commit) -> query on the manifest layout equals
    ann_index_add on the in-memory handle; compaction collapses the
    per-batch files per cell and replay-after-compact stays a no-op
    (the stream_batches set survives compaction)."""
    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = S.ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = str(tmp_path / "midx")
    S.ann_index_write(
        index, path, partition_by_cell=True, layout="manifest"
    )
    arrivals = str(tmp_path / "arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)
    grown = ann_index_stream_add(spark, path, arrivals)
    assert grown["n_stream_batches"] == 3
    # versions: v0 init, v1 build, v2..v4 stream commits
    pre = L.log_current(path + "/coded")
    assert pre["version"] == 4
    assert sorted(pre["meta"]["stream_batches"]) == [0, 1, 2]
    want = _coded_rows(S.ann_index_add(index, extra))
    assert _coded_rows(grown) == want
    n_files_pre = len(pre["files"])
    compacted = S.ann_index_compact(spark, path)
    post = L.log_current(path + "/coded")
    assert post["version"] == 5
    assert len(post["files"]) < n_files_pre
    # per-cell shape: exactly one file per live cell
    cells = {f.split("/")[0] for f in post["files"]}
    assert len(post["files"]) == len(cells)
    # replay idempotence SURVIVES the compaction
    assert sorted(post["meta"]["stream_batches"]) == [0, 1, 2]
    replay = L.log_commit(
        path + "/coded", ["phantom.parquet"], batch_id=1
    )
    assert replay["version"] == 5  # no-op
    assert _coded_rows(compacted) == want
    got = _rows(
        S.ann_index_topk(
            compacted, qs, emb, k=5, candidates=50, nprobe=4
        )
    )
    flat = S.ann_index_add(index, extra)
    assert got == _rows(
        S.ann_index_topk(flat, qs, emb, k=5, candidates=50, nprobe=4)
    )


def test_manifest_rebuild_preserves_layout(spark, sf_dir, tmp_path):
    """ann_index_rebuild on a manifest-layout index writes the staged
    replacement in the SAME layout (deployment contract, not a build
    parameter) and the rebuilt index equals a fresh build."""
    emb, index = _build(spark, sf_dir, half=True)
    path = str(tmp_path / "midx")
    S.ann_index_write(
        index, path, partition_by_cell=True, layout="manifest"
    )
    rebuilt = S.ann_index_rebuild(
        spark, path, emb, m=4, ksub=16, centroid_stride=10,
        train_sample_mod=5,
    )
    assert rebuilt["params"]["layout"] == "manifest"
    assert rebuilt["params"]["partitioned_by_cell"] is True
    fresh = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    assert _coded_rows(rebuilt) == _coded_rows(fresh)


def test_log_compact_byte_target_file_counts(spark, tmp_path):
    """log_compact writes ceil(live bytes / target) files: a
    super-target corpus compacts to >1 file, a sub-target corpus to
    exactly 1 (r15 verdict #5's done criterion)."""
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
    )
    root = str(tmp_path / "log")
    L.log_init(root)
    for i in range(4):
        L.log_commit(
            root, L.log_write_data(df.filter(F.col("k") % 4 == i), root)
        )
    total = sum(
        os.path.getsize(os.path.join(root, "data", f))
        for f in L.log_current(root)["files"]
    )
    # force ~4 output files
    target = max(1, total // 4)
    m = L.log_compact(spark, root, target_bytes=target)
    import math

    assert len(m["files"]) == math.ceil(total / target)
    assert len(m["files"]) > 1
    m2 = L.log_compact(spark, root, target_bytes=1 << 40)
    assert len(m2["files"]) == 1
    got = sorted(r["k"] for r in L.log_read(spark, root).collect())
    assert got == list(range(20000))


def test_log_write_partitioned_and_read_recovers_column(spark, tmp_path):
    """partition_by writes hive-pathed data files; log_read recovers
    the partition column via basePath with full row parity."""
    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(30)], "k LONG, p LONG, v LONG"
    )
    root = str(tmp_path / "log")
    L.log_init(root)
    files = L.log_write_data(df, root, partition_by=["p"])
    assert all(f.startswith("p=") for f in files), files
    L.log_commit(root, files)
    back = L.log_read(spark, root)
    assert "p" in back.columns
    assert sorted(
        (r["k"], int(r["p"]), r["v"]) for r in back.collect()
    ) == [(i, i % 3, i * 10) for i in range(30)]
    # compaction preserves the partitioned shape: one file per value
    m = L.log_compact(spark, root, partition_by=["p"])
    assert sorted({f.split("/")[0] for f in m["files"]}) == [
        "p=0", "p=1", "p=2",
    ]
    assert len(m["files"]) == 3


def test_log_vacuum_manifest_grace_and_tmp_reclaim(spark, tmp_path):
    """Superseded manifests are age-gated by the same grace as data
    files (a reader that just picked a version can still open it), and
    aged .tmp-* leftovers from a crashed commit are reclaimed (r15
    ADVICE #2)."""
    df = spark.createDataFrame([(1, 1)], "k LONG, v LONG")
    root = str(tmp_path / "log")
    L.log_init(root)
    L.log_commit(root, L.log_write_data(df, root))
    L.log_commit(root, L.log_write_data(df, root))
    mdir = os.path.join(root, "_manifests")
    # a crashed commit's tmp leftover
    leak = os.path.join(mdir, "v9.json.tmp-deadbeef")
    with open(leak, "w") as f:
        f.write("{}")
    # fresh: grace spares superseded manifests AND the tmp file
    L.log_vacuum(root, keep_versions=1, orphan_grace_sec=3600.0)
    assert os.path.exists(os.path.join(mdir, "v0.json"))
    assert os.path.exists(os.path.join(mdir, "v1.json"))
    assert os.path.exists(leak)
    # age everything past the horizon: now reclaimable
    old = time.time() - 7200
    for fn in os.listdir(mdir):
        os.utime(os.path.join(mdir, fn), (old, old))
    L.log_vacuum(root, keep_versions=1, orphan_grace_sec=3600.0)
    assert not os.path.exists(os.path.join(mdir, "v0.json"))
    assert not os.path.exists(os.path.join(mdir, "v1.json"))
    assert not os.path.exists(leak)
    assert os.path.exists(os.path.join(mdir, "v2.json"))
    # the table still reads
    assert L.log_read(spark, root).count() == 2
    # a crashed writer's staging dir is the same orphan class
    stg = os.path.join(root, "_staging_deadbeef")
    os.makedirs(stg)
    L.log_vacuum(root, keep_versions=1, orphan_grace_sec=3600.0)
    assert os.path.exists(stg)  # young: spared
    os.utime(stg, (old, old))
    L.log_vacuum(root, keep_versions=1, orphan_grace_sec=3600.0)
    assert not os.path.exists(stg)  # aged: reclaimed


def test_log_vacuum_spared_manifest_keeps_its_data(spark, tmp_path):
    """Liveness is the union over every manifest still ON DISK after
    expiry, not just the newest keep_versions (r16 self-review): a
    file absorbed by a compaction a moment ago is unreferenced by the
    new version but may be mtime-old — if its (age-spared, still
    listed) manifest survives, the file must too, or time travel and
    the just-picked-version reader race both break."""
    df = spark.createDataFrame([(1, 1)], "k LONG, v LONG")
    root = str(tmp_path / "log")
    L.log_init(root)
    f1 = L.log_write_data(df, root)
    L.log_commit(root, f1)  # v1
    L.log_compact(spark, root)  # v2 absorbs f1's file
    data_dir = os.path.join(root, "data")
    # age every DATA file past the grace; manifests stay young
    old = time.time() - 7200
    for r, _d, fs in os.walk(data_dir):
        for fn in fs:
            os.utime(os.path.join(r, fn), (old, old))
    L.log_vacuum(root, keep_versions=1, orphan_grace_sec=3600.0)
    # v1 was spared (young) -> its file must survive and replay
    assert os.path.exists(os.path.join(data_dir, f1[0]))
    assert L.log_read(spark, root, version=1).count() == 1
    # once the manifests age out, the file is reclaimable
    mdir = os.path.join(root, "_manifests")
    for fn in os.listdir(mdir):
        os.utime(os.path.join(mdir, fn), (old, old))
    deleted = L.log_vacuum(root, keep_versions=1, orphan_grace_sec=3600.0)
    assert f1[0] in deleted
    assert L.log_read(spark, root).count() == 1  # current still fine


def test_multi_index_merge_dedups_overlapping_corpora(spark, sf_dir):
    """Overlapping-corpus fan-out (the same index passed twice — the
    degenerate full overlap): the merged top-k must contain each
    (q_id, nn_id) once, labeled with the lexicographically smallest
    index_id, and equal the single-index top-k values."""
    emb, index = _build(spark, sf_dir, half=False)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    merged = S.ann_multi_index_topk(
        {"b": index, "a": index}, qs, emb, k=5, candidates=50,
        nprobe=4, merge_k=5,
    ).collect()
    pairs = [(r["q_id"], r["nn_id"]) for r in merged]
    assert len(pairs) == len(set(pairs))
    assert {r["index_id"] for r in merged} == {"a"}
    single = {
        (r["q_id"], r["nn_id"], r["rank"])
        for r in S.ann_index_topk(
            index, qs, emb, k=5, candidates=50, nprobe=4
        ).collect()
    }
    assert {(r["q_id"], r["nn_id"], r["rank"]) for r in merged} == single


def test_multi_index_route_restricts_queries(spark, sf_dir):
    """route= predicates: every result row's query satisfies its
    answering index's predicate (tenancy isolation), and an index
    whose route matches no query contributes zero rows."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    idx = {
        name: S.ann_index_build(
            emb.filter(F.expr(pred)),
            m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
        )
        for name, pred in (
            ("lo", "vec_id % 4 < 2"), ("hi", "vec_id % 4 >= 2"),
        )
    }
    out = S.ann_multi_index_topk(
        idx, qs, emb, k=5, candidates=50, nprobe=4,
        route={
            "lo": F.col("vec_id") % 4 < 2,
            # route NOTHING to hi: empty-route indexes answer nothing
            "hi": F.lit(False),
        },
    ).collect()
    assert out, "lo tenant must answer"
    assert {r["index_id"] for r in out} == {"lo"}
    assert all(r["q_id"] % 4 < 2 for r in out)


def test_seed_commit_idempotent_across_drivers(spark, sf_dir, tmp_path):
    """Two drivers racing an empty log both pass the files-empty check;
    the second seed commit must NO-OP on the reserved batch id -1
    instead of duplicating every seeded row (r15 ADVICE #5)."""
    emb, index = _build(spark, sf_dir, half=True)
    root = str(tmp_path / "log")
    arrivals = str(tmp_path / "arrivals")
    emb.filter(F.col("vec_id") % 2 == 1).limit(5).write.mode(
        "overwrite"
    ).parquet(arrivals)
    grown = ann_index_stream_add_log(spark, index, root, arrivals)
    n = grown["coded"].count()
    # driver B, which read files-empty just before driver A's seed won:
    # its commit carries the same reserved id and must no-op
    dup_files = L.log_write_data(index["coded"], root)
    m = L.log_commit(root, dup_files, batch_id=-1, note="seed: dup")
    assert -1 in m["meta"]["stream_batches"]
    assert L.log_read(spark, root).count() == n  # no duplication


def test_stream_batches_watermark_bounds_manifest(tmp_path):
    """stream_batches retains only the newest _STREAM_BATCH_RETAIN ids
    — manifest size is O(live files + const), not O(total batches ever)
    (r15 ADVICE #4). Newest ids survive; a replay of a recent batch
    still no-ops."""
    root = str(tmp_path / "log")
    L.log_init(root)
    n = L._STREAM_BATCH_RETAIN + 30
    for i in range(n):
        L.log_commit(root, [], batch_id=i)
    cur = L.log_current(root)
    ids = cur["meta"]["stream_batches"]
    assert len(ids) == L._STREAM_BATCH_RETAIN
    assert max(ids) == n - 1
    assert min(ids) == n - L._STREAM_BATCH_RETAIN
    v = cur["version"]
    replay = L.log_commit(root, ["phantom.parquet"], batch_id=n - 1)
    assert replay["version"] == v  # no-op on a retained id


def test_log_time_travel_reads_old_snapshot(spark, tmp_path):
    """log_read(version=N) replays an un-vacuumed snapshot exactly,
    even after a compaction absorbed its files; expired/unknown
    versions raise with the readable range."""
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "k LONG, v LONG"
    )
    root = str(tmp_path / "log")
    L.log_init(root)
    L.log_commit(root, L.log_write_data(df.filter("k < 5"), root))
    L.log_commit(root, L.log_write_data(df.filter("k >= 5"), root))
    L.log_compact(spark, root)
    assert L.log_versions(root) == [0, 1, 2, 3]
    old = sorted(
        (r["k"], r["v"])
        for r in L.log_read(spark, root, version=1).collect()
    )
    assert old == [(i, i * 10) for i in range(5)]
    cur = sorted(
        (r["k"], r["v"]) for r in L.log_read(spark, root).collect()
    )
    assert cur == [(i, i * 10) for i in range(10)]
    with pytest.raises(FileNotFoundError, match="available"):
        L.log_read(spark, root, version=99)


def test_log_schema_evolution_merge_and_compact(spark, tmp_path):
    """Add-column evolution: merged reads surface NULLs for
    pre-evolution rows; compaction rewrites the UNION schema (it
    merges unconditionally — without it Spark infers from one file
    and the rewrite drops the added column)."""
    root = str(tmp_path / "log")
    L.log_init(root)
    a = spark.createDataFrame([(1, 10)], "k LONG, v LONG")
    b = spark.createDataFrame([(2, 20, 200)], "k LONG, v LONG, w LONG")
    L.log_commit(root, L.log_write_data(a, root))
    L.log_commit(root, L.log_write_data(b, root))
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in L.log_read(spark, root, merge_schema=True).collect()
    )
    assert got == [(1, 10, None), (2, 20, 200)]
    L.log_compact(spark, root)
    # post-compact: one file carries the union schema, no merge needed
    m = L.log_current(root)
    assert len(m["files"]) == 1
    got2 = sorted(
        (r["k"], r["v"], r["w"])
        for r in L.log_read(spark, root).collect()
    )
    assert got2 == [(1, 10, None), (2, 20, 200)]


def test_cas_publish_seam_conditional_put(spark, tmp_path, monkeypatch):
    """The commit CAS is a pluggable seam (CAS_PUBLISH): a simulated
    object-store conditional PUT — copy-if-absent with a racing writer
    injected mid-commit — must drive the SAME rebase loop to the same
    linearized result as the hardlink default. Pins that everything
    above the seam is storage-agnostic (the r15 'object-store CAS'
    gap, closed at the seam)."""
    import shutil as sh

    df = spark.createDataFrame([(1, 1)], "k LONG, v LONG")
    root = str(tmp_path / "log")
    L.log_init(root)
    f1 = L.log_write_data(df, root)
    f2 = L.log_write_data(df, root)
    calls = {"n": 0}

    def conditional_put(tmp, target):
        # object-store semantics: full-body write iff key absent
        calls["n"] += 1
        if calls["n"] == 1:
            # inject a racing writer that claims THIS version first
            # (the precondition-failure path a real store returns 412 on)
            with open(target, "w") as f:
                json.dump(
                    {
                        "version": int(
                            os.path.basename(target)[1:-5]
                        ),
                        "files": sorted(f2),
                        "meta": {},
                    },
                    f,
                )
        if os.path.exists(target):
            return False
        sh.copyfile(tmp, target)
        return True

    monkeypatch.setattr(L, "CAS_PUBLISH", conditional_put)
    m = L.log_commit(root, f1)
    # the injected racer won v1 with f2; our commit rebased to v2 and
    # kept BOTH file sets — nothing lost, versions linear
    assert m["version"] == 2
    assert set(m["files"]) == set(f1) | set(f2)
    assert calls["n"] >= 2
    assert L.log_read(spark, root).count() == 2
    # no stray tmp files left behind
    mdir = os.path.join(root, "_manifests")
    assert not [fn for fn in os.listdir(mdir) if ".tmp-" in fn]


def test_manifest_stream_add_races_live_compactions(
    spark, sf_dir, tmp_path
):
    """TRUE concurrency on the unified path: a background thread
    compacts the manifest-layout index's coded log in a loop (retrying
    on ConflictError — the documented caller contract) while the REAL
    streaming add commits its 3 batches. Whatever the interleaving,
    the final table must equal ann_index_add of the whole arrivals set
    and every batch id must be present exactly once."""
    import threading

    from map_v2_etl_spark.sources.manifest_log import ConflictError

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    index = S.ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = str(tmp_path / "midx")
    S.ann_index_write(index, path, layout="manifest")
    arrivals = str(tmp_path / "arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)
    stop = threading.Event()
    compactions = {"done": 0, "conflicts": 0}

    def compact_loop():
        while not stop.is_set():
            try:
                S.ann_index_compact(spark, path)
                compactions["done"] += 1
            except ConflictError:
                compactions["conflicts"] += 1
            stop.wait(0.05)

    t = threading.Thread(target=compact_loop, daemon=True)
    t.start()
    try:
        grown = ann_index_stream_add(spark, path, arrivals)
    finally:
        stop.set()
        t.join(timeout=60)
    assert grown["n_stream_batches"] == 3
    assert compactions["done"] >= 1  # the race actually happened
    cur = L.log_current(path + "/coded")
    assert sorted(cur["meta"]["stream_batches"]) == [0, 1, 2]
    want = _coded_rows(S.ann_index_add(index, extra))
    assert _coded_rows(S.ann_index_read(spark, path)) == want


def test_scratch_sweep_real_age_gate(tmp_path, monkeypatch):
    """The wave-43 scratch sweeper only reclaims dirs that are BOTH
    pre-session and older than _SWEEP_MIN_AGE_SEC — a concurrent
    session's live dirs (recent mtime, earlier process start) are safe
    (r15 verdict #6 / ADVICE #1)."""
    from map_v2_etl_spark.plans import queries_wave43 as W

    root = os.path.join(str(tmp_path), "spark-warehouse", "ann_index")
    os.makedirs(os.path.join(root, "stale_old"))
    os.makedirs(os.path.join(root, "concurrent_live"))
    old = time.time() - W._SWEEP_MIN_AGE_SEC - 600
    os.utime(os.path.join(root, "stale_old"), (old, old))
    # concurrent_live: created before THIS process start (simulated
    # below) but recent in real age — an overlapping session may still
    # reference it
    recent = time.time() - 120
    os.utime(os.path.join(root, "concurrent_live"), (recent, recent))
    monkeypatch.setattr(W, "_REPO_ROOT", str(tmp_path), raising=True)
    # make "mtime before my session start" true for BOTH dirs — the
    # pre-r16 sweeper would reclaim both
    monkeypatch.setattr(W, "_SESSION_T0", time.time() + 10, raising=True)
    p = W._scratch_index_path()
    assert p.startswith(root)
    assert not os.path.exists(os.path.join(root, "stale_old"))
    assert os.path.exists(os.path.join(root, "concurrent_live"))
