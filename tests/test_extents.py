"""Extents operator: R-7 quantile golden tests (SURVEY.md §2.4 A2-A5, §5.1)."""

import numpy as np
import pytest

from map_v2_etl_spark.operators.extents import column_extents


def test_extents_r7_quantiles(spark):
    # values 1..10: R-7 q(0.01) = 1.09, q(0.99) = 9.91 (hand-computed:
    # h=(n-1)p, x[floor h] + frac*(x[floor h +1]-x[floor h]))
    rows = [("g%02d" % i, "nm", "pl", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["GEOID", "n", "pl", "m-00"])
    out = {r["id"]: r for r in column_extents(df).collect()}
    r = out["m-00"]
    assert r["min"] == 1.0 and r["max"] == 10.0
    assert r["q1"] == pytest.approx(1.09, abs=1e-12)
    assert r["q99"] == pytest.approx(9.91, abs=1e-12)
    # cross-check against numpy's default (R-7 linear) interpolation
    vals = np.arange(1.0, 11.0)
    assert r["q1"] == pytest.approx(np.percentile(vals, 1), abs=1e-12)
    assert r["q99"] == pytest.approx(np.percentile(vals, 99), abs=1e-12)


def test_extents_ignores_nulls_and_junk(spark):
    # blanks and non-numeric strings are dropped per cell, not per row
    # (extract-extents.js:24-27); engine: cast -> null -> aggs ignore
    rows = [
        ("01", "a", "x", "1", "5"),
        ("02", "b", "x", "", "junk"),
        ("03", "c", "x", "3", "7"),
    ]
    df = spark.createDataFrame(rows, ["GEOID", "n", "pl", "m-00", "k-00"])
    out = {r["id"]: r for r in column_extents(df).collect()}
    assert out["m-00"]["min"] == 1.0 and out["m-00"]["max"] == 3.0
    assert out["k-00"]["min"] == 5.0 and out["k-00"]["max"] == 7.0


def test_extents_row_order_follows_column_order(spark):
    rows = [("01", "a", "x", 1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, ["GEOID", "n", "pl", "z-00", "a-00", "m-00"])
    ids = [r["id"] for r in column_extents(df).collect()]
    assert ids == ["z-00", "a-00", "m-00"]


def test_extents_bounds_property(spark):
    rng = np.random.RandomState(7)
    vals = rng.lognormal(0, 2, size=200)
    df = spark.createDataFrame(
        [("g%03d" % i, "n", "p", float(v)) for i, v in enumerate(vals)],
        ["GEOID", "n", "pl", "m-00"],
    )
    r = column_extents(df).collect()[0]
    assert r["min"] <= r["q1"] <= r["q99"] <= r["max"]
    assert r["q1"] == pytest.approx(np.percentile(vals, 1), rel=1e-9)
    assert r["q99"] == pytest.approx(np.percentile(vals, 99), rel=1e-9)


def test_extents_four_paths_fuzz_bit_identical(spark):
    """Randomized bit-equality net over ALL FOUR extents layouts —
    exact percentile agg (auto/wide/melt), sketch-bracketed selection,
    and the Arrow two-pass path — on adversarial columns: heavy ties,
    constants, non-numeric and 'NaN' strings, nulls, row counts on both
    sides of the bracket path's 4*accuracy exact-direct gate. Same
    discipline as the r12 regime-switch fuzz sweep."""
    import random

    from map_v2_etl_spark.operators.extents import (
        arrow_extents,
        sketch_extents,
    )

    rng = random.Random(9)

    def gen_cell(kind):
        r = rng.random()
        if r < 0.08:
            return None
        if r < 0.12:
            return "not-a-number"
        if r < 0.16:
            return "NaN"
        if kind == "ties":
            return str(rng.choice([1.0, 2.0, 2.0, 3.5, 100.0]))
        if kind == "const":
            return "7.25"
        if kind == "int":
            return str(rng.randint(-50, 50))
        return repr(round(rng.uniform(-1e6, 1e6), 4))

    for trial in range(3):
        ncols = rng.randint(2, 5)
        nrows = rng.choice([8, 150])  # below / above the bracket gate
        kinds = [
            rng.choice(["ties", "const", "int", "cont"])
            for _ in range(ncols)
        ]
        cols = [f"m{i}" for i in range(ncols)]
        rows = [
            tuple([f"g{j}"] + [gen_cell(kinds[i]) for i in range(ncols)])
            for j in range(nrows)
        ]
        df = spark.createDataFrame(rows, ["GEOID"] + cols)
        base = [tuple(r) for r in column_extents(df).collect()]
        for label, alt in (
            ("sketch", sketch_extents(df, accuracy=25)),
            ("arrow", arrow_extents(df)),
            ("wide-layout", column_extents(df, layout="wide")),
            ("melt-layout", column_extents(df, layout="melt")),
        ):
            got = [tuple(r) for r in alt.collect()]
            assert got == base, (
                f"trial {trial} path={label} kinds={kinds} "
                f"rows={nrows}:\n base={base}\n got={got}"
            )


def test_sketch_extents_bit_identical_bracket_path(spark):
    # accuracy=25 forces n=200 columns through the bracket path
    # (4*25=100 < 200) — results must be BIT-identical to the exact agg
    rng = np.random.RandomState(11)
    rows = [
        (
            "g%03d" % i,
            "n",
            "p",
            float(rng.lognormal(0, 2)),
            float(rng.randint(0, 5)),  # heavy duplicates
            7.5,  # constant column (zero-width bracket shortcut)
            float(i),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, ["GEOID", "n", "pl", "a-00", "b-00", "c-00", "d-00"]
    )
    from map_v2_etl_spark.operators.extents import sketch_extents

    exact = [tuple(r) for r in column_extents(df, layout="melt").collect()]
    sk = [tuple(r) for r in sketch_extents(df, accuracy=25).collect()]
    assert sk == exact


def test_sketch_extents_edge_columns(spark):
    # all-null, single-value, and two-value columns (small-n exact path)
    rows = [
        ("01", "n", "p", None, 4.0, 1.0),
        ("02", "n", "p", None, None, 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "GEOID string, n string, pl string, "
        "`x-00` double, `y-00` double, `z-00` double",
    )
    from map_v2_etl_spark.operators.extents import sketch_extents

    exact = [tuple(r) for r in column_extents(df, layout="melt").collect()]
    sk = [tuple(r) for r in sketch_extents(df).collect()]
    assert sk == exact
    assert sk[0][1] is None  # all-null column: min is null


def test_arrow_extents_matches_melt_bit_for_bit(spark):
    """The Arrow two-pass path must reproduce the melt layout exactly,
    including NaN-drop, all-null columns, constant columns (zero-width
    brackets), and fractional-rank interpolation."""
    import math

    from pyspark.sql import functions as F

    from map_v2_etl_spark.operators.extents import (
        arrow_extents,
        column_extents,
    )

    rows = []
    for i in range(997):
        rows.append(
            (
                str(i),
                float(i) * 1.7 - 100.0,          # spread values
                5.0,                              # constant column
                float("nan") if i % 7 == 0 else math.sin(i) * 1e6,
                None,                             # all-null column
                float(i % 13),                    # heavy ties
            )
        )
    df = spark.createDataFrame(
        rows, "GEOID string, a double, b double, c double, d double, e double"
    )
    melt = column_extents(df, layout="melt").collect()
    arrow = arrow_extents(df).collect()
    assert [tuple(r) for r in melt] == [tuple(r) for r in arrow]


def test_arrow_extents_heavy_tie_counts_only_no_fallback(spark):
    """A column whose q1 sits inside a large tie mass produces a
    zero-width envelope; the fix ships tie COUNTS (no value gather) and
    must solve it WITHOUT the exact fallback — and still bit-match the
    melt layout."""
    import random

    import map_v2_etl_spark.operators.extents as X

    rng = random.Random(3)
    # ~30% zeros scattered everywhere -> every batch's [p-d, p+d]
    # quantiles at p=0.01 are 0.0 -> zero-width envelope
    rows = [
        (0.0 if rng.random() < 0.3 else rng.uniform(1.0, 100.0),)
        for _ in range(20000)
    ]
    df = spark.createDataFrame(rows, "m DOUBLE").repartition(8)

    calls: list = []
    orig = X._exact_melt_quantiles

    def spy(*a, **k):
        calls.append(a[1])
        return orig(*a, **k)

    X._exact_melt_quantiles = spy
    try:
        arrow = X.arrow_extents(df, exclude=()).collect()
    finally:
        X._exact_melt_quantiles = orig
    assert calls == []  # counts-only path solved it, zero fallback
    melt = X.column_extents(df, exclude=(), layout="melt").collect()
    assert [tuple(r) for r in arrow] == [tuple(r) for r in melt]
    assert arrow[0]["q1"] == 0.0


def test_arrow_extents_value_clustered_overflow_falls_back_exact(spark):
    """Value-clustered (range-partitioned) input makes the candidate
    envelope span nearly the whole column; the per-batch gather cap
    must flag overflow and route the column to the exact aggregate —
    results still bit-match melt instead of OOMing the driver."""
    import random

    import map_v2_etl_spark.operators.extents as X
    from pyspark.sql import functions as F

    rng = random.Random(5)
    rows = [(rng.uniform(0.0, 1000.0),) for _ in range(40000)]
    df = (
        spark.createDataFrame(rows, "m DOUBLE")
        .repartitionByRange(8, F.col("m"))  # batches = value ranges
    )

    calls: list = []
    orig = X._exact_melt_quantiles

    def spy(*a, **k):
        calls.append(list(a[1]))
        return orig(*a, **k)

    X._exact_melt_quantiles = spy
    try:
        arrow = X.arrow_extents(df, exclude=()).collect()
    finally:
        X._exact_melt_quantiles = orig
    assert calls == [["m"]]  # overflow detected -> exact fallback ran
    melt = X.column_extents(df, exclude=(), layout="melt").collect()
    assert [tuple(r) for r in arrow] == [tuple(r) for r in melt]


def test_sketch_extents_presolved_side_gathers_nothing(spark):
    """A heavy tie mass pre-solves q1 with a zero-width bracket; the
    solved side's NULL bounds must keep pass B from gathering its tie
    run, and the (value,count) compression bounds the other side.
    Result bit-matches the exact layout."""
    import random

    from map_v2_etl_spark.operators.extents import (
        column_extents,
        sketch_extents,
    )

    rng = random.Random(7)
    # accuracy=100 -> n > 4*accuracy engages the sketch path at n=20k;
    # 35% zeros pre-solve q1; q99 needs the bracket gather
    rows = [
        (0.0 if rng.random() < 0.35 else rng.uniform(1.0, 500.0),)
        for _ in range(20000)
    ]
    df = spark.createDataFrame(rows, "m DOUBLE").repartition(8)
    sk = [tuple(r) for r in sketch_extents(df, exclude=(), accuracy=100).collect()]
    ex = [tuple(r) for r in column_extents(df, exclude=(), layout="melt").collect()]
    assert sk == ex
    assert sk[0][3] == 0.0  # q1 from the tie mass


def test_auto_dispatch_byte_gate_switches_off_wide(spark, tmp_path, monkeypatch):
    """r17: auto-dispatch must abandon the wide layout above the input
    byte gate (its exact percentile buffers every cell on ONE final
    reducer) — all-numeric file-backed inputs go to the Arrow path,
    mixed-type ones to melt — and the results stay bit-identical."""
    import map_v2_etl_spark.operators.extents as X

    num = spark.createDataFrame(
        [(float(i), float(i % 7)) for i in range(500)], "a double, b double"
    )
    p_num = str(tmp_path / "num.parquet")
    num.write.parquet(p_num)
    num_df = spark.read.parquet(p_num)

    # below the gate (default 2 GiB): wide layout (lazy, stack reshape)
    wide_out = X.column_extents(num_df, exclude=())
    assert "stack" in wide_out._jdf.queryExecution().analyzed().toString()

    monkeypatch.setattr(X, "WIDE_AGG_MAX_BYTES", 1)
    # above the gate, all-numeric: Arrow two-pass (eager local frame)
    arrow_out = X.column_extents(num_df, exclude=())
    assert "stack" not in arrow_out._jdf.queryExecution().analyzed().toString()
    assert [tuple(r) for r in arrow_out.collect()] == [
        tuple(r) for r in wide_out.collect()
    ]

    # above the gate, mixed types: melt (lazy, per-column reducers)
    mix = spark.createDataFrame(
        [(float(i), str(i % 5)) for i in range(500)], "a double, s string"
    )
    p_mix = str(tmp_path / "mix.parquet")
    mix.write.parquet(p_mix)
    mix_df = spark.read.parquet(p_mix)
    melt_out = X.column_extents(mix_df, exclude=())
    plan = melt_out._jdf.queryExecution().analyzed().toString()
    assert "stack" not in plan
    monkeypatch.setattr(X, "WIDE_AGG_MAX_BYTES", 2 << 30)
    assert [tuple(r) for r in melt_out.collect()] == [
        tuple(r) for r in X.column_extents(mix_df, exclude=()).collect()
    ]

    # non-file-backed frames never switch (byte estimate is 0)
    monkeypatch.setattr(X, "WIDE_AGG_MAX_BYTES", 1)
    local_out = X.column_extents(num, exclude=())
    assert "stack" in local_out._jdf.queryExecution().analyzed().toString()


def test_byte_gate_remote_scheme_sizes_via_hadoop(spark, tmp_path, monkeypatch):
    """r18 (VERDICT r17 item 1): the byte gate must work off the local
    filesystem. Non-``file:`` URIs are statted through the Hadoop
    FileSystem API — exercised here through a ``viewfs://`` mount over
    the local test directory (a real non-file scheme Hadoop resolves
    without a cluster) — and a scheme Hadoop cannot resolve makes the
    size UNKNOWN, which the exact few-column branch treats as BIG
    (bounded layout), never as small."""
    import map_v2_etl_spark.operators.extents as X

    num = spark.createDataFrame(
        [(float(i), float(i % 7)) for i in range(500)], "a double, b double"
    )
    p_num = str(tmp_path / "num_remote.parquet")
    num.write.parquet(p_num)
    num_df = spark.read.parquet(p_num)
    real_files = num_df.inputFiles()

    spark._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.extcell.link./data", f"file://{p_num}"
    )
    mock_files = [
        "viewfs://extcell/data/" + f.rsplit("/", 1)[1] for f in real_files
    ]
    monkeypatch.setattr(
        type(num_df), "inputFiles", lambda self: mock_files
    )

    # Hadoop-resolvable remote scheme: sizes add up to the real bytes
    sz = X._input_file_bytes(num_df)
    import os
    expect = sum(
        os.path.getsize(f.removeprefix("file:")) for f in real_files
    )
    assert sz == expect

    # gate fires through the remote sizing exactly like the local path
    monkeypatch.setattr(X, "WIDE_AGG_MAX_BYTES", 1)
    out = X.column_extents(num_df, exclude=())
    assert "stack" not in out._jdf.queryExecution().analyzed().toString()

    # unresolvable scheme: UNKNOWN (-1), and the exact few-column
    # branch goes bounded even below the byte gate (fail safe)
    bad_files = [f.replace("file:", "nosuchfs://x") for f in real_files]
    monkeypatch.setattr(
        type(num_df), "inputFiles", lambda self: bad_files
    )
    assert X._input_file_bytes(num_df) == -1
    monkeypatch.setattr(X, "WIDE_AGG_MAX_BYTES", 2 << 30)
    out2 = X.column_extents(num_df, exclude=())
    assert "stack" not in out2._jdf.queryExecution().analyzed().toString()

    # results are unchanged by the dispatch — bit-identical to wide
    wide_out = X.column_extents(
        spark.read.parquet(p_num), exclude=(), layout="wide"
    )
    assert sorted(map(tuple, out2.collect())) == sorted(
        map(tuple, wide_out.collect())
    )
