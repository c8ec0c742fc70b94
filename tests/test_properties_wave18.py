"""Property-based checks for the wave 17-18 operators (hypothesis,
continuing the SURVEY §5 strategy).

* spatial_join equals the brute-force ray cast on random diamonds +
  random fractional points (grid phase loses nothing, refine phase
  rejects bbox-only hits);
* training_order is always a permutation and invariant to input
  partitioning (the two-phase rank has no partition-order dependence);
* cdc_apply equals a per-key python replay for arbitrary event
  interleavings with duplicated timestamps (id tiebreak decides).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_spark = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark


# --------------------------------------------------------------------------
# spatial join vs brute force
# --------------------------------------------------------------------------

coords = st.integers(min_value=0, max_value=15)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    centers=st.lists(
        st.tuples(coords, coords), min_size=1, max_size=6, unique=True
    ),
    pts=st.lists(
        st.tuples(coords, coords), min_size=1, max_size=20
    ),
)
def test_spatial_join_equals_bruteforce(centers, pts):
    from map_v2_etl_spark.operators.geo import spatial_join

    r = 2.0
    polys = _spark.createDataFrame(
        [
            (
                i,
                '{"type":"Polygon","coordinates":[[[%f,%f],[%f,%f],'
                "[%f,%f],[%f,%f],[%f,%f]]]}"
                % (cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r,
                   cx + r, cy),
            )
            for i, (cx, cy) in enumerate(centers)
        ],
        ["pid", "geometry"],
    )
    # .25/.5 offsets keep every point strictly off diamond boundaries
    pdata = [
        (j, px + 0.25, py + 0.5) for j, (px, py) in enumerate(pts)
    ]
    pdf = _spark.createDataFrame(pdata, ["pt", "x", "y"])
    got = {
        (row["pt"], row["pid"])
        for row in spatial_join(pdf, polys, cell_size=3.0).collect()
    }
    expect = {
        (j, i)
        for j, x, y in pdata
        for i, (cx, cy) in enumerate(centers)
        if abs(x - cx) + abs(y - cy) < r
    }
    assert got == expect


# --------------------------------------------------------------------------
# training order: permutation + partitioning invariance
# --------------------------------------------------------------------------

@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1, max_size=40, unique=True,
    ),
    parts=st.integers(min_value=1, max_value=7),
)
def test_training_order_permutation_partition_invariant(ids, parts):
    import hashlib
    import os
    import tempfile

    import map_v2_etl_spark.plans.queries_wave17 as w17

    d = tempfile.mkdtemp()
    _spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in ids],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).repartition(parts).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        r["doc_id"]: r["ord"]
        for r in w17.q_training_order(_spark, d).collect()
    }
    ref_sorted = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    assert got == {i: pos + 1 for pos, i in enumerate(ref_sorted)}


# --------------------------------------------------------------------------
# cdc replay vs python
# --------------------------------------------------------------------------

@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),     # user
            st.integers(min_value=0, max_value=5),     # ts bucket (dups!)
            st.sampled_from(["click", "view", "error"]),
        ),
        min_size=1, max_size=30,
    )
)
def test_cdc_apply_equals_python_replay(evs):
    from map_v2_etl_spark.operators import dedup  # noqa: F401  (session warm)

    rows = [
        (eid, u, float(ts), ts * 1000000, f"u{u}", t)
        for eid, (u, ts, t) in enumerate(evs)
    ]
    df = _spark.createDataFrame(
        [(eid, u, ts, t, v) for eid, u, tsf, ts, _k, t in rows
         for v in [float(eid)]],
        "event_id long, user_id long, ts long, event_type string, "
        "value double",
    ).withColumn("ts", F.timestamp_micros(F.col("ts")))
    last = df.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_type", "value"), F.struct("ts", "event_id")
        ).alias("s")
    )
    got = {
        r["user_id"]: (r["s"]["event_type"], r["s"]["value"])
        for r in last.collect()
        if r["s"]["event_type"] != "error"
    }
    state = {}
    for eid, (u, ts, t) in enumerate(evs):
        state.setdefault(u, []).append((ts, eid, t))
    expect = {}
    for u, lst in state.items():
        ts, eid, t = max(lst)
        if t != "error":
            expect[u] = (t, float(eid))
    assert got == expect


# --------------------------------------------------------------------------
# incremental merge == recompute on arbitrary splits
# --------------------------------------------------------------------------

@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # day bucket
            st.sampled_from(["a", "b"]),                    # type
            st.one_of(                                      # cents or NULL
                st.none(),
                st.integers(min_value=-10**6, max_value=10**6),
            ),
            st.booleans(),                                  # in delta?
        ),
        min_size=1, max_size=40,
    )
)
def test_incremental_merge_equals_recompute_random(vals):
    rows = [
        (d, t, None if c is None else c / 100.0, is_delta)
        for d, t, c, is_delta in vals
    ]
    df = _spark.createDataFrame(
        rows, "day int, typ string, value double, is_delta boolean"
    )

    def rollup(x):
        return x.groupBy("day", "typ").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("decimal(20,4)").alias("s"),
        )

    b = rollup(df.filter(~F.col("is_delta"))).alias("b")
    d = rollup(df.filter(F.col("is_delta"))).alias("d")
    bs, ds = F.col("b.s"), F.col("d.s")
    # the query's null-preserving merge: SUM of an all-NULL group is
    # NULL, and merge must reproduce that (not coalesce it to 0)
    s_merged = (
        F.when(bs.isNull(), ds).when(ds.isNull(), bs).otherwise(bs + ds)
    )
    merged = {
        (r["day"], r["typ"]): (r["n"], r["s"])
        for r in b.join(d, ["day", "typ"], "full_outer")
        .select(
            "day", "typ",
            (F.coalesce(F.col("b.n"), F.lit(0))
             + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
            s_merged.cast("decimal(20,4)").alias("s"),
        )
        .collect()
    }
    full = {
        (r["day"], r["typ"]): (r["n"], r["s"])
        for r in rollup(df).collect()
    }
    assert merged == full
