"""as-of join and bucketed range join (operators/joins.py) semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from map_v2_etl_spark.operators.joins import asof_join, bucketed_range_join


def ts(s):
    return datetime.fromisoformat(s)


def make_asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01 10:00:00")),   # after r1/r2 -> r2
            (2, "u1", ts("2024-01-01 09:00:00")),   # exactly at r1 -> tie match
            (3, "u1", ts("2024-01-01 08:00:00")),   # before any right -> null
            (4, "u2", ts("2024-01-01 10:00:00")),   # other key -> r3
            (5, "u3", ts("2024-01-01 10:00:00")),   # key with no right rows
        ],
        ["event_id", "uid", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01 09:00:00"), 1.0),   # r1
            ("u1", ts("2024-01-01 09:30:00"), None),  # r2: null payload wins
            ("u2", ts("2024-01-01 09:45:00"), 3.0),   # r3
        ],
        ["uid", "ts", "val"],
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = make_asof_frames(spark)
    out = {
        r.event_id: (r.ts_right, r.val)
        for r in asof_join(
            left, right, ["uid"], "ts", "ts", ["val"]
        ).collect()
    }
    assert out[1] == (ts("2024-01-01 09:30:00"), None)  # latest row, null val
    assert out[2] == (ts("2024-01-01 09:00:00"), 1.0)   # tie: equal ts matches
    assert out[3] == (None, None)                        # nothing prior
    assert out[4] == (ts("2024-01-01 09:45:00"), 3.0)
    assert out[5] == (None, None)                        # key absent on right
    assert len(out) == 5                                 # left rows preserved


def test_asof_join_tolerance(spark):
    left, right = make_asof_frames(spark)
    out = {
        r.event_id: r.ts_right
        for r in asof_join(
            left, right, ["uid"], "ts", "ts", ["val"],
            tolerance=F.lit(20 * 60.0),  # 20 minutes, in seconds
        ).collect()
    }
    assert out[4] == ts("2024-01-01 09:45:00")  # 15 min gap: kept
    assert out[2] == ts("2024-01-01 09:00:00")  # 0 gap: kept
    assert out[1] is None                        # 30 min gap: dropped


def test_bucketed_range_join_matches_between(spark):
    left = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(200)], ["lid", "v"]
    )
    right = spark.createDataFrame(
        [(b, b * 10.0, b * 10.0 + 14.0) for b in range(10)],
        ["band", "lo", "hi"],
    )
    got = {
        (r.lid, r.band)
        for r in bucketed_range_join(
            left, right, "v", "lo", "hi", bucket_width=10.0
        ).collect()
    }
    want = {
        (lid, band)
        for lid, v in ((i, i * 7 % 100) for i in range(200))
        for band, lo, hi in ((b, b * 10, b * 10 + 14) for b in range(10))
        if lo <= v <= hi
    }
    assert got == want


def test_cogroup_asof_matches_jvm_asof(spark, sf_dir):
    """The pandas cogroup formulation and the union+window JVM
    formulation implement the same operator — outputs must be equal on
    real event data."""
    from map_v2_etl_spark.operators.groups import cogroup_asof
    from map_v2_etl_spark.sources.registry import load_table

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    jvm = asof_join(
        purchases, clicks, ["user_id"], "ts", "ts", ["value"]
    )
    pandas_side = cogroup_asof(
        purchases, clicks, ["user_id"], "ts", "ts", ["value"]
    )
    cols = ["event_id", "user_id", "ts", "ts_right", "value"]
    a = {tuple(r[c] for c in cols) for r in jvm.collect()}
    b = {tuple(r[c] for c in cols) for r in pandas_side.collect()}
    assert a == b


import pytest


@pytest.mark.parametrize("small_gate", [0, 10**6])
def test_connected_components(spark, small_gate):
    """Chain, triangle, and singletons resolve to min-id clusters —
    on BOTH the distributed min-label loop (small_gate=0) and the
    gate-bounded union-find fast path."""
    from map_v2_etl_spark.operators.dedup import connected_components

    vertices = spark.createDataFrame([(i,) for i in range(1, 10)], ["id"])
    # chain 1-2-3-4, triangle 5-6-7, singletons 8, 9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 5)], ["src", "dst"]
    )
    got = {
        r.id: r.cluster
        for r in connected_components(
            vertices, edges, small_graph_vertices=small_gate
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 8, 9: 9}


def test_bucketed_range_join_plans_hash_join(spark):
    """The point of bucketing: the physical plan must be a shuffle/broadcast
    HASH join on the bucket key, never BroadcastNestedLoopJoin."""
    left = spark.createDataFrame([(1, 5.0)], ["lid", "v"])
    right = spark.createDataFrame([(1, 0.0, 9.0)], ["band", "lo", "hi"])
    plan = bucketed_range_join(
        left, right, "v", "lo", "hi", bucket_width=10.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_bucketed_range_join_left_outer_keeps_unmatched(spark):
    """The BETWEEN residual lives in the join condition, so outer joins
    keep unmatched left rows (a post-join filter would drop them — the
    null lo/hi makes BETWEEN evaluate to null)."""
    left = spark.createDataFrame(
        [(1, 5.0), (2, 55.0), (3, 999.0)], ["lid", "v"]
    )
    right = spark.createDataFrame(
        [(10, 0.0, 9.0), (20, 50.0, 59.0)], ["band", "lo", "hi"]
    )
    got = {
        (r.lid, r.band)
        for r in bucketed_range_join(
            left, right, "v", "lo", "hi", bucket_width=10.0, how="left"
        ).collect()
    }
    assert got == {(1, 10), (2, 20), (3, None)}


def test_connected_components_self_loops(spark):
    """Self-loop edges are inert: clusters unchanged, and a self-loop-only
    graph converges without violating the round-1 skip invariant."""
    from map_v2_etl_spark.operators.dedup import connected_components

    vertices = spark.createDataFrame([(i,) for i in range(1, 5)], ["id"])
    edges = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 4), (4, 4)], ["src", "dst"]
    )
    got = {
        r.id: r.cluster
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 3}


def test_connected_components_star_matches_label_prop(spark):
    """Star CC agrees with min-label propagation on a mixed random graph
    (chain + triangle + singletons + a random component)."""
    import random

    from map_v2_etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    n = 60
    vertices = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    pairs = [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 5), (8, 8)]
    pairs += [
        (rng.randrange(20, n), rng.randrange(20, n)) for _ in range(40)
    ]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    a = {
        r.id: r.cluster
        for r in connected_components(vertices, edges).collect()
    }
    b = {
        r.id: r.cluster
        for r in connected_components_star(vertices, edges).collect()
    }
    assert a == b


def test_connected_components_star_long_chain_few_rounds(spark):
    """A 200-node chain (diameter 199) converges within 8 alternating
    rounds — the O(log d) posture label propagation cannot match
    (it would need ~199 rounds)."""
    from map_v2_etl_spark.operators.dedup import connected_components_star

    n = 200
    vertices = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["src", "dst"]
    )
    got = {
        r.id: r.cluster
        for r in connected_components_star(
            vertices, edges, max_iter=8
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_cc_paths_agree_on_endpoints_outside_vertices(spark):
    """Edge endpoints absent from `vertices` must label identically on
    all THREE implementations (local union-find, iterative min-label,
    star) — previously the iterative path could neither adopt them as
    min labels nor propagate through them, and star dropped them."""
    from map_v2_etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    vertices = spark.createDataFrame([(5,)], "id LONG")
    edges = spark.createDataFrame([(5, 3)], "src LONG, dst LONG")
    want = {(5, 3), (3, 3)}
    local = {
        tuple(r)
        for r in connected_components(vertices, edges).collect()
    }
    assert local == want
    iterative = {
        tuple(r)
        for r in connected_components(
            vertices, edges, small_graph_vertices=0
        ).collect()
    }
    assert iterative == want
    star = {
        tuple(r)
        for r in connected_components_star(vertices, edges).collect()
    }
    assert star == want

    # chain whose true min label (0) enters only via endpoints
    vertices = spark.createDataFrame([(1,)], "id LONG")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 0)], "src LONG, dst LONG"
    )
    for impl in (
        lambda: connected_components(vertices, edges),
        lambda: connected_components(
            vertices, edges, small_graph_vertices=0
        ),
        lambda: connected_components_star(vertices, edges),
    ):
        got = {tuple(r) for r in impl().collect()}
        assert got == {(0, 0), (1, 0), (2, 0), (3, 0)}, got


def test_cc_three_paths_fuzz_equivalence(spark):
    """Randomized equivalence net over ALL THREE connected-components
    code paths — the gated driver union-find, the distributed min-label
    loop, and large-star/small-star — against a pure-Python reference,
    on adversarial shapes: chains (diameter stress), self-loops,
    duplicate and reversed edges, endpoint-only vertices (absent from
    the vertex frame), isolated vertices. The r12 BPE fuzzer found two
    equivalence holes that every example-based test had missed; this
    applies the same discipline to the other gated regime switch."""
    import random

    from map_v2_etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    def py_cc(vert_ids, edge_list):
        ids = set(vert_ids)
        for a, b in edge_list:
            ids.add(a)
            ids.add(b)
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_list:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp = {}
        for i in ids:
            comp.setdefault(find(i), []).append(i)
        want = {}
        for members in comp.values():
            m = min(members)
            for i in members:
                want[i] = m
        return want

    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(2, 18)
        verts = [i for i in range(n) if rng.random() < 0.8]
        n_edges = rng.randint(0, 2 * n)
        edge_list = []
        for _ in range(n_edges):
            a, b = rng.randrange(n + 3), rng.randrange(n + 3)
            edge_list.append((a, b))
            if rng.random() < 0.3:  # duplicates / reversals
                edge_list.append((b, a))
        if not edge_list:  # keep the edges frame non-empty: a self-loop
            a = verts[0] if verts else 0  # never changes any label
            edge_list.append((a, a))
        want = py_cc(verts, edge_list)
        vertices = (
            spark.createDataFrame([(i,) for i in verts], "id LONG")
            if verts
            else None
        )
        edges = spark.createDataFrame(edge_list, "src LONG, dst LONG")
        for label, impl in (
            ("union-find", lambda: connected_components(vertices, edges)),
            (
                "min-label",
                lambda: connected_components(
                    vertices, edges, small_graph_vertices=0
                ),
            ),
            ("star", lambda: connected_components_star(vertices, edges)),
        ):
            got = {r.id: r.cluster for r in impl().collect()}
            assert got == want, (
                f"trial {trial} path={label}: verts={verts} "
                f"edges={edge_list}\n got={got}\n want={want}"
            )


def test_cc_unconverged_raises_not_silent(spark):
    """A diameter bigger than max_iter must raise, not silently return
    a split component."""
    import pytest

    from map_v2_etl_spark.operators.dedup import connected_components

    n = 8
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src LONG, dst LONG"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            vertices, edges, max_iter=3, small_graph_vertices=0
        )
    # the same graph converges fine via the star path's O(log d) rounds
    from map_v2_etl_spark.operators.dedup import connected_components_star

    got = {
        tuple(r)
        for r in connected_components_star(vertices, edges).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def test_minhash_lsh_band_validation(spark):
    import pytest

    from map_v2_etl_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="bands must divide"):
        minhash_lsh_pairs(df, num_perm=64, bands=10)
    with pytest.raises(ValueError, match="bands must divide"):
        minhash_lsh_pairs(df, num_perm=8, bands=16)


def test_asof_null_ts_and_null_key_semantics(spark):
    """SQL equi/range null semantics: a right row with null key or null
    ts never matches; a left row with null ts keeps null payloads —
    previously Spark's nulls-first window ordering made the null-ts
    right row a universal fallback match and null keys matched each
    other."""
    from map_v2_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"),
         (2, "u1", None),
         (3, None, "2024-01-01 10:00:00")],
        "event_id LONG, user_id STRING, ts STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u1", None, 99.0),            # null ts: never a match
         (None, "2024-01-01 09:00:00", 77.0),  # null key: never a match
         ("u1", "2024-01-01 09:30:00", 1.5)],
        "user_id STRING, ts STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: (r["ts_right"], r["value"])
        for r in asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_cols=["value"],
        ).collect()
    }
    assert got[1][1] == 1.5          # real match
    assert got[2] == (None, None)    # null left ts -> no match
    assert got[3] == (None, None)    # null left key -> no match
    assert len(got) == 3             # every left row kept


def test_asof_output_collision_raises(spark):
    import pytest

    from map_v2_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00", 5.0)],
        "event_id LONG, user_id STRING, ts STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 09:00:00", 1.0)],
        "user_id STRING, ts STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="duplicate column"):
        asof_join(left, right, on=["user_id"], left_ts="ts",
                  right_ts="ts", right_cols=["value"])


def test_range_join_guards(spark):
    import pytest

    from map_v2_etl_spark.operators.joins import bucketed_range_join

    left = spark.createDataFrame([(5.0,)], "v DOUBLE")
    right = spark.createDataFrame(
        [("a", 0.0, 10.0), ("bad", 1e9, 0.0)],  # one inverted interval
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    # inverted interval filtered (no sequence explosion), match correct
    got = bucketed_range_join(left, right, "v", "lo", "hi", 10.0).collect()
    assert [(r["v"], r["band"]) for r in got] == [(5.0, "a")]
    with pytest.raises(ValueError, match="right/full outer"):
        bucketed_range_join(left, right, "v", "lo", "hi", 10.0, how="full")
    with pytest.raises(ValueError, match="bucket_width"):
        bucketed_range_join(left, right, "v", "lo", "hi", 0.0)
