"""GeoJSON source/sink (SURVEY.md §2.1 S4, §2.6 O2).

Reads a FeatureCollection (or newline-delimited features) into a DataFrame
of (properties..., geometry-as-JSON-string). Geometry stays an opaque
string column operated on by operators/geo.py; properties are surfaced as
typed columns. The sink writes sorted newline-delimited GeoJSON — the
byte-ordered (`LC_ALL=C sort`) tile-ready stream the reference pipes into
tippecanoe (/root/reference/build.sh:111-118,139-144).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson(
    spark: SparkSession, path: str, property_cols: list[str] | None = None
) -> DataFrame:
    """FeatureCollection -> one row per feature.

    multiLine JSON scan -> explode(features). Geometry is re-serialized to
    a canonical JSON string column `geometry`; requested property columns
    are lifted out of `properties`. For newline-delimited feature files
    use ``read_geojsonl``.
    """
    raw = spark.read.option("multiLine", True).json(path)
    feats = raw.select(F.explode("features").alias("f"))
    cols = []
    if property_cols:
        cols += [F.col(f"f.properties.{c}").alias(c) for c in property_cols]
    else:
        cols += [F.col("f.properties.*")]
    cols.append(F.to_json(F.col("f.geometry")).alias("geometry"))
    return feats.select(*cols)


def read_geojsonl(
    spark: SparkSession, path: str, property_cols: list[str] | None = None
) -> DataFrame:
    """Newline-delimited GeoJSON features (the scale-friendly layout)."""
    raw = spark.read.json(path)
    cols = []
    if property_cols:
        cols += [F.col(f"properties.{c}").alias(c) for c in property_cols]
    else:
        cols += [F.col("properties.*")]
    cols.append(F.to_json(F.col("geometry")).alias("geometry"))
    return raw.select(*cols)


def feature_json(df: DataFrame, property_cols: list[str]) -> DataFrame:
    """Assemble a GeoJSON Feature JSON string per row -> column `feature`."""
    # keep null attributes (parity with tippecanoe --empty-csv-columns-are-null)
    props = F.to_json(
        F.struct(*[F.col(c) for c in property_cols]),
        {"ignoreNullFields": "false"},
    )
    return df.withColumn(
        "feature",
        F.concat(
            F.lit('{"type":"Feature","properties":'),
            props,
            F.lit(',"geometry":'),
            F.col("geometry"),
            F.lit("}"),
        ),
    )


def write_geojsonl(
    df: DataFrame, path: str, property_cols: list[str], sort_cols: list[str]
) -> None:
    """Sorted newline-delimited GeoJSON (tile-ready; O2 byte-order sort).

    Range-partitioned so part files are globally ordered — a downstream
    concatenation preserves the `LC_ALL=C sort` contract without a
    single-node sort."""
    (
        feature_json(df, property_cols)
        .repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .select("feature")
        .write.mode("overwrite")
        .text(path)
    )
