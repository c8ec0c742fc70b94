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
