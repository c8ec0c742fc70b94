"""Property tests for wave-22/23 primitives.

* count-min: est ≥ true for EVERY key under arbitrary multisets — the
  one-sided error guarantee the sketch's docstring claims, exercised
  through the exact Spark expression the query uses (not a Python
  re-model).
* replay partition tiling: for arbitrary (start, end, tasks) the
  slices tile the range exactly — no gap, no overlap, full cover.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300
    )
)
def test_countmin_never_underestimates(spark, keys):
    from collections import Counter

    from map_v2_etl_spark.plans.queries_wave22 import _CM_DEPTH, _cm_bucket

    true = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    grid = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"), _cm_bucket(F.col("k"), d).alias("b")
                )
                for d in range(_CM_DEPTH)
            ]
        )
    ).alias("p")
    sketch = (
        df.select(grid).groupBy("p.d", "p.b").agg(F.count(F.lit(1)).alias("cnt"))
    )
    est = (
        df.distinct()
        .select("k", grid)
        .select("k", "p.d", "p.b")
        .join(F.broadcast(sketch), ["d", "b"])
        .groupBy("k")
        .agg(F.min("cnt").alias("est"))
        .collect()
    )
    assert {r["k"] for r in est} == set(true)
    for r in est:
        assert r["est"] >= true[r["k"]], (r, true[r["k"]])


@settings(max_examples=50, deadline=None)
@given(
    start=st.integers(min_value=0, max_value=5_000),
    width=st.integers(min_value=1, max_value=5_000),
    tasks=st.integers(min_value=1, max_value=16),
)
def test_replay_partitions_tile_exactly(start, width, tasks):
    from map_v2_etl_spark.sources.pystream import ParquetReplayStreamReader

    r = ParquetReplayStreamReader.__new__(ParquetReplayStreamReader)
    r.path, r.columns, r.tasks = "unused", None, tasks
    spans = sorted(
        (p.start, p.end)
        for p in ParquetReplayStreamReader.partitions(
            r, {"row": start}, {"row": start + width}
        )
    )
    assert spans[0][0] == start and spans[-1][1] == start + width
    for (_, b), (c, _) in zip(spans, spans[1:]):
        assert b == c, "gap or overlap in the tiling"
    assert all(b > a for a, b in spans), "empty slice emitted"
