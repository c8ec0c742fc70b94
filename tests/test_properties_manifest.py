"""Model-based property test for the manifest commit log (r16): drive
random interleavings of append / streaming-append / replay / compact /
vacuum against a pure-Python reference model of the table contract —

  * the snapshot equals exactly the committed rows (no loss, no dup),
  * a replayed batch id is a no-op forever (across compactions),
  * versions are strictly monotonic,
  * vacuum(grace=0, keep_versions=1) never changes the CURRENT snapshot.

Data files are written with pyarrow directly (one tiny file per
append) so the random walk costs no Spark jobs; Spark reads the final
snapshot once per example, and compaction (a Spark rewrite) is
exercised through the same log_compact the engine uses.

Complements the directed race/crash matrix in tests/test_wave46/47 —
the matrix pins the known-hard interleavings, the walk hunts unknown
ones.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_v2_etl_spark.sources import manifest_log as L


def _raw_file(root: str, tag: int) -> list[str]:
    """One single-row data file bearing ``tag``, written without Spark
    (manifests track names + bytes; the log does not care who wrote
    the parquet)."""
    name = f"{uuid.uuid4().hex}-00000.parquet"
    pq.write_table(
        pa.table({"tag": pa.array([tag], type=pa.int64())}),
        os.path.join(root, "data", name),
    )
    return [name]


ACTION = st.one_of(
    st.tuples(st.just("append")),
    st.tuples(st.just("stream"), st.integers(0, 3)),  # batch id 0..3
    st.tuples(st.just("compact")),
    st.tuples(st.just("vacuum")),
)


@pytest.mark.usefixtures("spark")
@given(st.lists(ACTION, min_size=1, max_size=7))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_manifest_log_random_walk_matches_model(spark, tmp_path_factory, actions):
    root = str(tmp_path_factory.mktemp("mlog"))
    L.log_init(root)
    model_tags: list[int] = []  # multiset of committed row tags
    model_batches: set[int] = set()
    next_tag = 0
    last_version = 0
    for act in actions:
        if act[0] == "append":
            L.log_commit(root, _raw_file(root, next_tag))
            model_tags.append(next_tag)
            next_tag += 1
        elif act[0] == "stream":
            bid = act[1]
            files = _raw_file(root, next_tag)
            L.log_commit(root, files, batch_id=bid)
            if bid not in model_batches:
                # first delivery commits; any later same-id commit is
                # a replay and must be a manifest-level no-op
                model_batches.add(bid)
                model_tags.append(next_tag)
            next_tag += 1
        elif act[0] == "compact":
            L.log_compact(spark, root)
        elif act[0] == "vacuum":
            L.log_vacuum(root, keep_versions=1, orphan_grace_sec=0.0)
        cur = L.log_current(root)
        assert cur["version"] >= last_version
        assert (
            cur["version"] > last_version
            or act[0] in ("stream", "vacuum", "compact")
        )
        last_version = cur["version"]
        # committed stream ids always present (watermark >> 4 ids)
        assert model_batches <= set(
            cur["meta"].get("stream_batches", [])
        )
    cur = L.log_current(root)
    if not cur["files"]:
        assert model_tags == []
        return
    got = sorted(
        r["tag"] for r in L.log_read(spark, root).collect()
    )
    assert got == sorted(model_tags)
