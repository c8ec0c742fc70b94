"""Wave-45 tests: index lifecycle closers (compaction, rebuild),
exactly-once streaming add (batchId-keyed WAP publish), the layout
guard for partitioned indexes, the family-wide NULL-query contract,
and the pq_topk_ctes(base_table=...) × kmeans_cells DuckDB emission
(r14 verdict #5).

Reference parity: the reference engine (build.sh:75-233) has no ANN
surface; §2.11 training-pipeline extension.
"""

import glob
import os
import random

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources.registry import load_table
from map_v2_etl_spark.streaming.ann_maintenance import ann_index_stream_add


def _rows(df):
    return sorted(
        (r["q_id"], r["nn_id"], r["rank"], r["cosine"])
        for r in df.collect()
    )


def _coded_rows(index):
    return sorted(
        (r["nn_id"], r["cent_id"], tuple(r["codes"]))
        for r in index["coded"].collect()
    )


def _parquet_files(d):
    return [
        p
        for p in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        if not os.path.basename(p).startswith(("_", "."))
    ]


def _build_and_write(spark, sf_dir, path, half=True, partition=False):
    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0) if half else emb
    S.ann_index_write(
        S.ann_index_build(
            base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
        ),
        path,
        partition_by_cell=partition,
    )
    return emb


# --------------------------------------------------------------------------
# exactly-once streaming add
# --------------------------------------------------------------------------


def test_stream_add_crash_replay_no_duplicates(spark, sf_dir, tmp_path):
    """THE exactly-once pin (r14 verdict #2): kill the stream AFTER a
    batch publishes but BEFORE its checkpoint commits (the window in
    which r14's plain parquet append duplicated rows), restart it, and
    require the final coded set to be duplicate-free and bit-identical
    to a single batch ann_index_add of the whole arrivals set."""
    path = str(tmp_path / "idx")
    emb = _build_and_write(spark, sf_dir, path)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    arrivals = str(tmp_path / "arrivals")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)

    with pytest.raises(Exception, match="_test_crash_after_publish"):
        ann_index_stream_add(
            spark, path, arrivals, _test_crash_after_publish={1}
        )
    # restart: the checkpoint replays the killed batch; its
    # batchId-keyed files must be overwritten, not appended to
    grown = ann_index_stream_add(spark, path, arrivals)

    ids = grown["coded"].groupBy("nn_id").count()
    dup = ids.filter(F.col("count") > 1).count()
    assert dup == 0, "replayed batch duplicated coded rows"

    # exact reference: fresh build on the even half + one-shot add
    fresh = S.ann_index_build(
        emb.filter(F.col("vec_id") % 2 == 0),
        m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    want = _coded_rows(S.ann_index_add(fresh, extra))
    assert _coded_rows(grown) == want


def test_stream_add_partitioned_layout(spark, sf_dir, tmp_path):
    """ADVICE r14 #1: a stream add against a partition_by_cell index
    must write hive-partitioned files (cent_id=*/ subdirs), keeping the
    coded directory readable, and the grown index must equal the
    one-shot add bit for bit."""
    path = str(tmp_path / "idxp")
    emb = _build_and_write(spark, sf_dir, path, partition=True)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    arrivals = str(tmp_path / "arrivalsp")
    extra.repartition(2).write.mode("overwrite").parquet(arrivals)

    grown = ann_index_stream_add(spark, path, arrivals)
    # every published stream file must live under a cent_id=*/ dir
    stream_files = [
        p
        for p in _parquet_files(os.path.join(path, "coded"))
        if os.path.basename(p).startswith("stream-batch-")
    ]
    assert stream_files, "stream published no files"
    assert all(
        os.path.basename(os.path.dirname(p)).startswith("cent_id=")
        for p in stream_files
    ), "flat files leaked into a hive-partitioned coded dir"

    fresh = S.ann_index_build(
        emb.filter(F.col("vec_id") % 2 == 0),
        m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    assert _coded_rows(grown) == _coded_rows(S.ann_index_add(fresh, extra))


def test_params_record_layout_flag(spark, sf_dir, tmp_path):
    """The layout is part of the persisted contract: write records
    partitioned_by_cell, read exposes it on the handle."""
    for flag in (False, True):
        path = str(tmp_path / f"idx_{flag}")
        _build_and_write(spark, sf_dir, path, partition=flag)
        got = S.ann_index_read(spark, path)["params"]["partitioned_by_cell"]
        assert got is flag


def test_write_overwrite_rotates_stream_checkpoint(spark, sf_dir, tmp_path):
    """ADVICE r14 #2: rebuilding an index at the same path must NOT
    inherit the previous index's streaming source log — after an
    overwrite ann_index_write, a stream add over the SAME arrivals
    directory re-consumes every file."""
    path = str(tmp_path / "idxc")
    emb = _build_and_write(spark, sf_dir, path)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    arrivals = str(tmp_path / "arrivalsc")
    extra.repartition(2).write.mode("overwrite").parquet(arrivals)

    first = ann_index_stream_add(spark, path, arrivals)
    assert first["n_stream_batches"] == 2

    # rebuild-by-overwrite at the same path: fresh index, fresh log
    _build_and_write(spark, sf_dir, path)
    second = ann_index_stream_add(spark, path, arrivals)
    assert second["n_stream_batches"] == 2, (
        "stale _stream_add_ckpt made the rebuilt index skip "
        "previously-seen arrivals"
    )


# --------------------------------------------------------------------------
# compaction
# --------------------------------------------------------------------------


def test_compact_flat_bit_parity_and_file_count(spark, sf_dir, tmp_path):
    """Flat layout: streaming adds fragment coded/ into one file per
    batch; compaction must collapse to the byte-target file count with
    the coded table bit-identical before/after."""
    path = str(tmp_path / "idxf")
    emb = _build_and_write(spark, sf_dir, path)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    arrivals = str(tmp_path / "arrivalsf")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)
    grown = ann_index_stream_add(spark, path, arrivals)
    before = _coded_rows(grown)
    n_before = len(_parquet_files(os.path.join(path, "coded")))
    assert n_before >= 4  # base write + 3 stream batches

    compacted = S.ann_index_compact(spark, path)
    n_after = len(_parquet_files(os.path.join(path, "coded")))
    assert n_after == 1  # tiny table, far under target_bytes
    assert _coded_rows(compacted) == before
    assert not os.path.exists(os.path.join(path, "_coded_compacting"))
    assert not os.path.exists(os.path.join(path, "_coded_precompact"))


def test_compact_partitioned_one_file_per_cell(spark, sf_dir, tmp_path):
    """Per-cell layout: compaction must leave exactly ONE file per cell
    directory (the Faiss inverted-list shape) and preserve both the
    hive layout and the table bits."""
    path = str(tmp_path / "idxpc")
    emb = _build_and_write(spark, sf_dir, path, partition=True)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    arrivals = str(tmp_path / "arrivalspc")
    extra.repartition(2).write.mode("overwrite").parquet(arrivals)
    grown = ann_index_stream_add(spark, path, arrivals)
    before = _coded_rows(grown)

    compacted = S.ann_index_compact(spark, path)
    coded_dir = os.path.join(path, "coded")
    cells = [
        d for d in os.listdir(coded_dir) if d.startswith("cent_id=")
    ]
    assert cells
    for c in cells:
        files = _parquet_files(os.path.join(coded_dir, c))
        assert len(files) == 1, f"cell {c} has {len(files)} files"
    assert _coded_rows(compacted) == before
    assert compacted["params"]["partitioned_by_cell"] is True


# --------------------------------------------------------------------------
# rebuild
# --------------------------------------------------------------------------


def test_rebuild_equals_fresh_build_and_swaps_atomically(
    spark, sf_dir, tmp_path
):
    """Rebuild ≡ fresh build on the current corpus (coded table AND
    query results bit-identical), staging/old dirs gone after the
    swap, and the layout preserved by default."""
    path = str(tmp_path / "idxr")
    emb = _build_and_write(spark, sf_dir, path, partition=True)
    qs = emb.filter(F.col("vec_id") % 50 == 0)

    rebuilt = S.ann_index_rebuild(
        spark, path, emb, m=4, ksub=16, centroid_stride=10,
        train_sample_mod=5,
    )
    fresh = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    assert _coded_rows(rebuilt) == _coded_rows(fresh)
    assert rebuilt["params"]["partitioned_by_cell"] is True  # preserved
    assert not os.path.exists(path + "__rebuild_staging")
    assert not os.path.exists(path + "__pre_rebuild")

    got = _rows(S.ann_index_topk(rebuilt, qs, emb, k=5, candidates=50,
                                 nprobe=4))
    want = _rows(S.ann_index_topk(fresh, qs, emb, k=5, candidates=50,
                                  nprobe=4))
    assert got == want


def test_rebuild_failure_leaves_live_index(spark, sf_dir, tmp_path):
    """A failed rebuild (all-NULL corpus → build raises) must leave the
    live index untouched and still queryable."""
    path = str(tmp_path / "idxrf")
    emb = _build_and_write(spark, sf_dir, path)
    before = _coded_rows(S.ann_index_read(spark, path))
    bad = spark.createDataFrame(
        [(i, None) for i in range(10)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError):
        S.ann_index_rebuild(spark, path, bad, m=4, ksub=16)
    assert _coded_rows(S.ann_index_read(spark, path)) == before


# --------------------------------------------------------------------------
# family-wide NULL-query contract
# --------------------------------------------------------------------------


def _null_query_corpus(spark, tmp_path, name):
    """30 rows, dim 8; id 9 (a q_mod=9 query id) has a NULL embedding —
    the docs/ROUND14.md §9 corner: its all-NULL distances ordered
    differently across engines in the ASC candidate cuts."""
    rng = random.Random(15)
    rows = [
        (i, None if i == 9 else
         [round(rng.uniform(-1, 1), 3) for _ in range(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    pq = str(tmp_path / f"{name}.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    return df, pq


def _duck(pq):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{pq}/*.parquet')"
    )
    return con


def test_null_query_rows_produce_no_output_family_wide(spark, tmp_path):
    """The r15 contract: a NULL-embedding QUERY row yields zero output
    rows in every family operator (it has no geometry), instead of
    k engine-ordering-dependent rows."""
    df, _ = _null_query_corpus(spark, tmp_path, "embx")
    qs = df.filter(F.col("vec_id") % 9 == 0)  # ids 0, 9(NULL), 18, 27
    outs = {
        "cosine": S.cosine_topk(df, qs, k=3),
        "lsh": S.lsh_cosine_topk(df, qs, k=3, planes=2, tables=2),
        "ivf": S.ivf_cosine_topk(df, qs, k=3, centroid_stride=10,
                                 nprobe=2),
        "pq": S.pq_cosine_topk(df, qs, k=3, m=2, ksub=4, candidates=10),
        "ivf_pq": S.ivf_pq_topk(df, qs, k=3, m=2, ksub=4, candidates=10,
                                centroid_stride=10, nprobe=2),
        "residual": S.ivf_pq_residual_topk(
            df, qs, k=3, m=2, ksub=4, candidates=10,
            centroid_stride=10, nprobe=2,
        ),
        "sq": S.ivf_sq_topk(df, qs, k=3, candidates=10,
                            centroid_stride=10, nprobe=2),
    }
    for name, out in outs.items():
        q_ids = {r["q_id"] for r in out.select("q_id").collect()}
        assert 9 not in q_ids, f"{name}: NULL query produced rows"
        assert q_ids & {0, 18, 27}, f"{name}: non-null queries vanished"


def test_null_query_oracle_parity_routed_and_residual(spark, tmp_path):
    """Spark ≡ fixed DuckDB oracle on the NULL-query corpus for both
    routed PQ shapes — and the PRE-r15 qu frame (re-emitted inline)
    shows the divergence the fix closes: it returns rows for q_id 9."""
    from map_v2_etl_spark.plans.duck_vec import pq_topk_ctes

    df, pq = _null_query_corpus(spark, tmp_path, "embp")
    qs = df.filter(F.col("vec_id") % 9 == 0)
    con = _duck(pq)

    for residual in (False, True):
        got = _rows(
            (S.ivf_pq_residual_topk if residual else S.ivf_pq_topk)(
                df, qs, k=3, m=2, ksub=4, candidates=10,
                centroid_stride=10, nprobe=2,
            )
        )
        sql = pq_topk_ctes(
            m=2, ksub=4, iters=2, dim=8, candidates=10, k=3,
            sample_mod=1, q_mod=9, centroid_stride=10, nprobe=2,
            residual=residual,
        )
        want = sorted(
            (q, n, r, c) for q, n, r, c in con.sql(sql).fetchall()
        )
        assert got == want, f"residual={residual}"
        assert all(q != 9 for q, _, _, _ in want)
        # the pre-fix frame kept the NULL query: prove the corner was
        # real by re-emitting the old qu/iprobes predicates
        old_sql = sql.replace(
            "vec_id % 9 = 0 AND embedding IS NOT NULL", "vec_id % 9 = 0"
        ).replace(
            "q.vec_id % 9 = 0 AND q.embedding IS NOT NULL",
            "q.vec_id % 9 = 0",
        )
        assert old_sql != sql
        old = con.sql(old_sql).fetchall()
        assert any(q == 9 for q, _, _, _ in old), (
            "expected the pre-r15 oracle to emit rows for the NULL query"
        )


def test_null_query_oracle_parity_sq(spark, tmp_path):
    """Same parity pin for the SQ8 chain."""
    from map_v2_etl_spark.plans.duck_vec import ivf_sq_ctes

    df, pq = _null_query_corpus(spark, tmp_path, "embs")
    qs = df.filter(F.col("vec_id") % 9 == 0)
    con = _duck(pq)
    got = _rows(
        S.ivf_sq_topk(df, qs, k=3, candidates=10, centroid_stride=10,
                      nprobe=2, train_sample_mod=1)
    )
    sql = ivf_sq_ctes(
        dim=8, candidates=10, k=3, sample_mod=1, q_mod=9,
        centroid_stride=10, nprobe=2,
    )
    want = sorted((q, n, r, c) for q, n, r, c in con.sql(sql).fetchall())
    assert got == want
    assert all(q != 9 for q, _, _, _ in want)


# --------------------------------------------------------------------------
# pq_topk_ctes(base_table=...) × kmeans_cells (r14 verdict #5)
# --------------------------------------------------------------------------


def test_pq_oracle_kmeans_base_table_executes(spark, sf_dir):
    """The builder-flagged untested emission: lloyd_ctes over a
    base_table SUBQUERY must execute green on DuckDB with sane output
    invariants (it is emitted but unexercised by any registered
    query)."""
    import duckdb

    from map_v2_etl_spark.plans.duck_vec import pq_topk_ctes

    sql = pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=20, k=3,
        sample_mod=5, q_mod=50, kmeans_cells=8, kmeans_iters=2,
        nprobe=2, residual=True,
        base_table="(SELECT * FROM embeddings WHERE vec_id % 2 = 0) base_t",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    rows = con.sql(sql).fetchall()
    assert rows, "kmeans × base_table emission returned no rows"
    assert all(q % 50 == 0 and 1 <= r <= 3 for q, _n, r, _c in rows)


# --------------------------------------------------------------------------
# sharded encode + merge
# --------------------------------------------------------------------------


def test_merge_shard_bit_identical_to_add(spark, sf_dir):
    """merge(index, encode_shard(index, rows)) ≡ add(index, rows) bit
    for bit — the parallel-ingest contract."""
    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    index = S.ann_index_build(
        base, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    shard = S.ann_index_encode_shard(index, extra)
    merged = S.ann_index_merge(index, shard)
    added = S.ann_index_add(index, extra)
    assert _coded_rows(merged) == _coded_rows(added)


def test_merge_rejects_foreign_artifacts(spark, sf_dir):
    """Merging indexes from DIFFERENT training passes must raise —
    codes are meaningless across codebooks."""
    emb = load_table(spark, "embeddings", sf_dir)
    a = S.ann_index_build(
        emb.filter(F.col("vec_id") % 2 == 0),
        m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    b = S.ann_index_build(  # full corpus: different training pass
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    with pytest.raises(ValueError, match="centroids|codebooks"):
        S.ann_index_merge(a, b)
    c = S.ann_index_build(
        emb.filter(F.col("vec_id") % 2 == 0),
        m=2, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    with pytest.raises(ValueError, match="params"):
        S.ann_index_merge(a, c)


# --------------------------------------------------------------------------
# reinforcement pins (r15 self-review): crash-point fuzz + DPP survival
# --------------------------------------------------------------------------


def test_stream_add_crash_fuzz_every_batch_once(spark, sf_dir, tmp_path):
    """Exactly-once under ARBITRARY crash points, not just the one the
    unit pin chooses: kill the stream after the publish of EVERY batch
    in turn (batch 0, then 1, then 2 on successive restarts), then let
    a final run drain the source. The coded set must end duplicate-free
    and bit-identical to the one-shot add — the replay path exercised
    at every batch boundary."""
    path = str(tmp_path / "idxz")
    emb = _build_and_write(spark, sf_dir, path)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    arrivals = str(tmp_path / "arrivalsz")
    extra.repartition(3).write.mode("overwrite").parquet(arrivals)

    for crash_batch in (0, 1, 2):
        with pytest.raises(Exception, match="_test_crash_after_publish"):
            ann_index_stream_add(
                spark, path, arrivals,
                _test_crash_after_publish={crash_batch},
            )
    grown = ann_index_stream_add(spark, path, arrivals)

    dup = (
        grown["coded"].groupBy("nn_id").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0
    fresh = S.ann_index_build(
        emb.filter(F.col("vec_id") % 2 == 0),
        m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    assert _coded_rows(grown) == _coded_rows(S.ann_index_add(fresh, extra))


def test_compact_preserves_dpp(spark, sf_dir, tmp_path):
    """Compaction must not cost the partitioned layout its file-level
    skip: the routed query over a COMPACTED per-cell index still shows
    dynamic partition pruning on the coded scan, with results
    bit-identical to the flat layout."""
    path = str(tmp_path / "idxdpp")
    emb = _build_and_write(spark, sf_dir, path, half=False, partition=True)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = S.ann_index_compact(spark, path)
    df = S.ann_index_topk(index, qs, emb, k=5, candidates=50, nprobe=4)
    flat = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    want = _rows(S.ann_index_topk(flat, qs, emb, k=5, candidates=50,
                                  nprobe=4))
    assert _rows(df) == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan
