"""CSV source/sink conventions (SURVEY.md §2.1 S2/S3/S5)."""

import gzip
import os

from map_v2_etl_spark.operators.pivot import pivot_long_to_wide
from map_v2_etl_spark.schemas import long_schema
from map_v2_etl_spark.sources.csv_io import read_long_csv, write_sorted_csv


def test_read_binds_by_header_name_not_position(spark, tmp_path):
    # columns deliberately NOT in schema order + an unmapped junk column:
    # values must land by header name (PapaParse semantics), junk dropped
    src = tmp_path / "long.csv"
    src.write_text(
        "id,year,name,parent_location,population,filing_rate,junk_col\n"
        "01,2000,Alabama,United States,100,1.5,zzz\n"
    )
    df = read_long_csv(spark, str(src), long_schema("raw"))
    r = df.collect()[0]
    assert r["population"] == 100.0
    assert r["filing_rate"] == 1.5
    assert "junk_col" not in df.columns
    assert r["renter_homes_pct"] is None  # declared but absent -> null


def test_gz_roundtrip_pivot_to_sorted_csv(spark, tmp_path):
    src = tmp_path / "long.csv.gz"
    with gzip.open(src, "wt") as f:
        f.write("id,year,name,parent_location,population,filing_rate,junk\n")
        f.write("02,2000,Alaska,,50,0.5,z\n")
        f.write("01,2000,Alabama,United States,100,1.5,z\n")
        f.write("01,2001,Alabama,United States,110,,z\n")
    long_df = read_long_csv(spark, str(src), long_schema("raw"))
    wide = pivot_long_to_wide(long_df, "raw", years=["2000", "2001"])
    out = str(tmp_path / "wide.csv")
    write_sorted_csv(
        wide.select("GEOID", "n", "pl", "p-00", "p-01", "efr-00", "efr-01"),
        out, ["GEOID"],
    )
    lines = open(out).read().splitlines()
    assert lines[0] == "GEOID,n,pl,p-00,p-01,efr-00,efr-01"
    assert lines[1] == "01,Alabama,United States,100.0,110.0,1.5,"
    assert lines[2] == "02,Alaska,United States,50.0,,0.5,"


def test_blank_and_junk_cells_null(spark, tmp_path):
    src = tmp_path / "long.csv"
    src.write_text(
        "id,year,name,parent_location,population\n"
        "01,2000,A,X,\n"
        "02,2000,B,X,notanumber\n"
    )
    df = read_long_csv(spark, str(src), long_schema("raw"))
    vals = {r["id"]: r["population"] for r in df.collect()}
    assert vals == {"01": None, "02": None}


def test_read_header_with_quoted_comma(spark, tmp_path):
    """Quoted header names containing commas must parse as ONE column
    (csv.reader semantics), not split naively on ','."""
    from pyspark.sql import types as T

    src = tmp_path / "quoted.csv"
    src.write_text(
        '"name, full",id,value\n'
        "alpha,01,3.5\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name, full", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = read_long_csv(spark, str(src), schema)
    r = df.collect()[0]
    assert r["id"] == "01"
    assert r["name, full"] == "alpha"
    assert r["value"] == 3.5


def test_read_multi_file_header_mismatch_raises(spark, tmp_path):
    """A directory mixing column orders must raise — positional binding
    to the first file's header would silently cross-map values."""
    import pytest
    from pyspark.sql import types as T

    d = tmp_path / "csvs"
    d.mkdir()
    (d / "part1.csv").write_text("id,name\n01,alpha\n")
    (d / "part2.csv").write_text("name,id\nbeta,02\n")
    schema = T.StructType(
        [T.StructField("id", T.StringType()),
         T.StructField("name", T.StringType())]
    )
    with pytest.raises(ValueError, match="inconsistent CSV headers"):
        read_long_csv(spark, str(d), schema)
    # consistent headers across files read fine
    (d / "part2.csv").write_text("id,name\n02,beta\n")
    rows = {r["id"]: r["name"]
            for r in read_long_csv(spark, str(d), schema).collect()}
    assert rows == {"01": "alpha", "02": "beta"}


def test_read_custom_separator_header(spark, tmp_path):
    """**options (sep) must apply to the header peek too."""
    from pyspark.sql import types as T

    p = tmp_path / "semi.csv"
    p.write_text("id;name\n01;alpha\n")
    schema = T.StructType(
        [T.StructField("id", T.StringType()),
         T.StructField("name", T.StringType())]
    )
    rows = read_long_csv(spark, str(p), schema, sep=";").collect()
    assert [(r["id"], r["name"]) for r in rows] == [("01", "alpha")]


def test_read_dotted_column_name(spark, tmp_path):
    from pyspark.sql import types as T

    p = tmp_path / "dots.csv"
    p.write_text("id,pop.total\n01,5\n")
    schema = T.StructType(
        [T.StructField("id", T.StringType()),
         T.StructField("pop.total", T.DoubleType())]
    )
    rows = read_long_csv(spark, str(p), schema).collect()
    assert rows[0]["pop.total"] == 5.0


def test_read_empty_file_raises_clearly(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    p = tmp_path / "empty.csv"
    p.write_text("")
    schema = T.StructType([T.StructField("id", T.StringType())])
    with pytest.raises(ValueError, match="empty CSV"):
        read_long_csv(spark, str(p), schema)


def test_write_sorted_csv_refuses_directory_target(spark, tmp_path):
    import pytest

    d = tmp_path / "existing"
    d.mkdir()
    df = spark.createDataFrame([("a",)], "x STRING")
    with pytest.raises(ValueError, match="existing directory"):
        write_sorted_csv(df, str(d), ["x"])


def test_stdout_sink_matches_file_sink_bytes(spark, tmp_path):
    """S6: the stdout sink must emit byte-for-byte what the single-file
    sink writes (the reference's no-output-arg fallback streams the
    same CSV to stdout — shape-data.js:82, extract-extents.js:58)."""
    import io

    from map_v2_etl_spark.sources.csv_io import (
        write_csv_stdout,
        write_sorted_csv,
    )

    df = spark.createDataFrame(
        [("02", 'quo"te', 1.5), ("10", "comma, inside", None),
         ("001", "", 2.0)],
        "GEOID string, name string, er double",
    )
    p = str(tmp_path / "ref.csv")
    write_sorted_csv(df, p, ["GEOID"])
    buf = io.StringIO()
    write_csv_stdout(df, ["GEOID"], out=buf)
    assert buf.getvalue() == open(p, encoding="utf-8").read()
    assert buf.getvalue().splitlines()[0] == "GEOID,name,er"
