"""partition_by_cell coded-write clustering (r18, VERDICT r17 item 5):
the coded inverted lists must land as a BOUNDED number of files per
cell (<= salt buckets k), not one file per (task, cell), and the salted
layout must keep bit-identical query results and the DPP file skip."""

import glob
import os

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import similarity as S
from map_v2_etl_spark.sources.registry import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _files_per_cell(path: str) -> dict:
    cells = [
        d
        for d in os.listdir(os.path.join(path, "coded"))
        if d.startswith("cent_id=")
    ]
    return {
        d: len(glob.glob(os.path.join(path, "coded", d, "*.parquet")))
        for d in cells
    }


def test_coded_files_bounded_one_per_cell(spark, sf_dir, tmp_path):
    """Default sizing at test scale: k=1, so exactly ONE file per cell
    (the pre-r18 layout left one file per task-cell intersection)."""
    emb = load_table(spark, "embeddings", sf_dir)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    path = str(tmp_path / "parted")
    S.ann_index_write(index, path, partition_by_cell=True)
    per_cell = _files_per_cell(path)
    assert per_cell, "no cell directories written"
    assert max(per_cell.values()) == 1, per_cell


def test_coded_salt_fans_out_and_stays_bounded(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Forced multi-bucket regime: >1 but <=k files per cell, results
    and the dynamic-partition-pruning plan unchanged."""
    monkeypatch.setattr(S, "_CODED_SALT_TARGET_BYTES", 4 << 10)  # 4 KB
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    index = S.ann_index_build(
        emb, m=4, ksub=16, centroid_stride=10, train_sample_mod=5,
    )
    flat, parted = str(tmp_path / "flat"), str(tmp_path / "parted")
    S.ann_index_write(index, flat)
    S.ann_index_write(index, parted, partition_by_cell=True)
    src = os.path.getsize(os.path.join(sf_dir, "embeddings.parquet"))
    k = -(-src // (4 << 10))
    per_cell = _files_per_cell(parted)
    assert max(per_cell.values()) > 1, per_cell  # the salt fans out
    assert max(per_cell.values()) <= k, per_cell  # and stays bounded
    r_flat = S.ann_index_read(spark, flat)
    r_part = S.ann_index_read(spark, parted)
    got_flat = _rows(
        S.ann_index_topk(r_flat, qs, emb, k=5, candidates=50, nprobe=4)
    )
    df_part = S.ann_index_topk(
        r_part, qs, emb, k=5, candidates=50, nprobe=4
    )
    assert _rows(df_part) == got_flat
    plan = df_part._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
