"""Golden-output tests for the long->wide pivot (SURVEY.md §2.4 A1, §5.1)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from map_v2_etl_spark.operators.pivot import pivot_long_to_wide
from map_v2_etl_spark.schemas import COL_MAP_RAW, long_schema, wide_columns


def make_long(spark, rows):
    """rows: list of dicts with subset of long columns; missing -> None."""
    schema = long_schema("raw")
    full = [{f.name: r.get(f.name) for f in schema.fields} for r in rows]
    return spark.createDataFrame([Row(**r) for r in full], schema)


def test_basic_pivot_shape_and_values(spark):
    df = make_long(
        spark,
        [
            {"id": "01", "year": "2000", "name": "Alabama",
             "parent_location": "United States", "population": 100.0,
             "filing_rate": 1.5},
            {"id": "01", "year": "2001", "name": "Alabama",
             "parent_location": "United States", "population": 110.0},
            {"id": "02", "year": "2000", "name": "Alaska",
             "parent_location": "United States", "population": 50.0},
        ],
    )
    wide = pivot_long_to_wide(df, "raw", years=["2000", "2001"])
    rows = {r["GEOID"]: r.asDict() for r in wide.collect()}
    assert rows["01"]["p-00"] == 100.0
    assert rows["01"]["p-01"] == 110.0
    assert rows["01"]["efr-00"] == 1.5
    assert rows["01"]["efr-01"] is None
    assert rows["02"]["p-00"] == 50.0
    assert rows["02"]["p-01"] is None
    assert rows["01"]["n"] == "Alabama"
    # deterministic total schema: every metric x every year present
    assert set(wide.columns) == set(wide_columns("raw", ["2000", "2001"]))


def test_duplicate_rows_last_write_wins(spark):
    # later file row overwrites, even with a blank (null) cell —
    # object-spread semantics of shape-data.js:96-101
    df = make_long(
        spark,
        [
            {"id": "01", "year": "2000", "name": "A", "parent_location": "X",
             "population": 1.0, "filing_rate": 9.0},
            {"id": "01", "year": "2000", "name": "A2", "parent_location": "X",
             "population": 2.0, "filing_rate": None},
        ],
    )
    wide = pivot_long_to_wide(df, "raw", years=["2000"])
    r = wide.collect()[0].asDict()
    assert r["p-00"] == 2.0
    assert r["efr-00"] is None  # blank overwrites 9.0
    assert r["n"] == "A2"  # year-invariant cols also last-write-wins


def test_parent_location_falsy_fill(spark):
    df = make_long(
        spark,
        [
            {"id": "01", "year": "2000", "name": "A", "parent_location": None},
            {"id": "02", "year": "2000", "name": "B", "parent_location": ""},
            {"id": "03", "year": "2000", "name": "C", "parent_location": "Texas"},
        ],
    )
    wide = pivot_long_to_wide(df, "raw", years=["2000"])
    pls = {r["GEOID"]: r["pl"] for r in wide.collect()}
    assert pls == {"01": "United States", "02": "United States", "03": "Texas"}


def test_leading_zero_geoids_survive(spark):
    df = make_long(
        spark,
        [{"id": "04013", "year": "2016", "name": "Maricopa",
          "parent_location": "Arizona", "population": 4e6}],
    )
    wide = pivot_long_to_wide(df, "raw", years=["2016"])
    r = wide.collect()[0]
    assert r["GEOID"] == "04013"
    assert r["p-16"] == 4e6


def test_modeled_map_differs(spark):
    cols = wide_columns("modeled", ["2000"])
    assert "lf-00" not in cols  # low_flag is raw-only
    assert "e-00" in cols
    assert COL_MAP_RAW["judgements"] == "e"


def test_pivot_generic_callable_aggs(spark):
    """pivot_generic takes aggregate-building callables per column and
    emits {column}-{value} outputs."""
    from map_v2_etl_spark.operators.pivot import pivot_generic

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 5.0), ("a", "x", 3.0),
         ("b", "y", 2.0)],
        "g STRING, k STRING, price DOUBLE",
    )
    out = {
        r["g"]: r
        for r in pivot_generic(
            df, ["g"], "k", ["x", "y"], {"price": F.max}
        ).collect()
    }
    assert out["a"]["price-x"] == 3.0
    assert out["a"]["price-y"] == 5.0
    assert out["b"]["price-x"] is None
    assert out["b"]["price-y"] == 2.0


def test_pivot_empty_years_is_identity_only(spark):
    """years=[] means NO metric years (identity columns only) — not the
    default full year set."""
    rows = [Row(**{f.name: None for f in long_schema("raw").fields})]
    row = rows[0].asDict()
    row.update(id="01", year="2000", name="Alpha", parent_location="P")
    df = spark.createDataFrame([Row(**row)], long_schema("raw"))
    wide = pivot_long_to_wide(df, "raw", years=[])
    assert wide.columns == ["GEOID", "n", "pl"]
    assert wide.collect()[0]["n"] == "Alpha"


def test_pivot_cross_century_years_fail_fast(spark):
    import pytest

    from map_v2_etl_spark.operators.pivot import pivot_long_to_wide

    row = {f.name: None for f in long_schema("raw").fields}
    row.update(id="01", year="1999", name="A", parent_location="P")
    df = spark.createDataFrame([Row(**row)], long_schema("raw"))
    with pytest.raises(ValueError, match="duplicate 2-digit"):
        pivot_long_to_wide(df, "raw", years=["1999", "2099"])
