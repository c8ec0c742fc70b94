"""Property test for the KMV prefilter's same-rows-out contract (r10).

The r9 advice showed the starvation self-heal had a reachable hole
(fully-starved groups vanished). Beyond the deterministic regression
test in test_wave28.py, this drives the contract across randomized
group shapes and headrooms — including headrooms far below 1 where
starvation is the COMMON case — and asserts the prefiltered sketch is
byte-identical to the plain path every time. Data is built driver-side
(hypothesis generates the spec, Spark the frame), with one shared
session; examples are capped because each draw runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import sketches as S

# (group sizes, k, headroom): sizes up to a few thousand distincts keep
# each example ~1s; headroom spans starved (<1) through production (8)
SPEC = st.tuples(
    st.lists(st.integers(min_value=1, max_value=3000), min_size=1, max_size=4),
    st.sampled_from([1, 4, 64]),
    st.sampled_from([1e-18, 0.05, 0.5, 1.0, 8.0]),
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(SPEC)
def test_prefilter_equals_plain_for_any_shape(spark, spec):
    sizes, k, headroom = spec
    frames = []
    for g, n in enumerate(sizes):
        frames.append(
            spark.range(n).select(
                F.lit(f"g{g}").alias("g"),
                # offset per group so values overlap across groups too
                (F.col("id") * 7 + g * 1000).alias("v"),
            )
        )
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    plain = _rows(S.kmv_sketch(df, "g", "v", k))
    pre = _rows(
        S.kmv_sketch(df, "g", "v", k, prefilter=True, headroom=headroom)
    )
    assert pre == plain
    # every group must appear: the r9 bug class was silent group loss
    assert {r[0] for r in pre} == {f"g{g}" for g in range(len(sizes))}
