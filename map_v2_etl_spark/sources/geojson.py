"""GeoJSON source/sink (SURVEY.md §2.1 S4, §2.6 O2).

Reads a FeatureCollection (or newline-delimited features) into a DataFrame
of (properties..., geometry-as-JSON-string). Geometry stays an opaque
string column operated on by operators/geo.py; properties are surfaced as
typed columns. The sink writes sorted newline-delimited GeoJSON — the
byte-ordered (`LC_ALL=C sort`) tile-ready stream the reference pipes into
tippecanoe (/root/reference/build.sh:111-118,139-144).

Geometry is read as a RAW JSON STRING via a patched read schema (a
StringType field makes Spark's JSON source hand back the object's JSON
text verbatim): letting the reader INFER the geometry struct and
re-serializing with to_json corrupts any file mixing geometry types —
Polygon + MultiPolygon coordinates unify to string-element arrays and
come back with every number quoted. US census shapes routinely mix the
two, so the string passthrough is load-bearing, not a nicety.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _geometry_as_string(schema: T.StructType) -> T.StructType:
    """Copy of an inferred feature schema with the geometry field's type
    replaced by StringType (at top level and inside a `features` array)."""

    def patch_struct(st: T.StructType) -> T.StructType:
        return T.StructType(
            [
                T.StructField("geometry", T.StringType(), True)
                if f.name == "geometry"
                else f
                for f in st.fields
            ]
        )

    fields = []
    for f in schema.fields:
        if f.name == "features" and isinstance(f.dataType, T.ArrayType):
            fields.append(
                T.StructField(
                    "features",
                    T.ArrayType(patch_struct(f.dataType.elementType)),
                    True,
                )
            )
        else:
            fields.append(f)
    return patch_struct(T.StructType(fields))


def _lift_properties(
    props: F.Column, schema: T.StructType, property_cols: list[str]
) -> list[F.Column]:
    """Requested property columns via getField (a property literally
    named "addr.city" must not parse as nested access); properties
    absent from the whole file become typed-null string columns — the
    same missing-declared-column contract as the CSV reader, instead of
    an UNRESOLVED_COLUMN explosion deep in Catalyst."""
    present = set(schema.fieldNames()) if schema else set()
    out = []
    for c in property_cols:
        if c in present:
            out.append(props.getField(c).alias(c))
        else:
            out.append(F.lit(None).cast("string").alias(c))
    return out


def _props_schema(dt) -> T.StructType | None:
    return dt if isinstance(dt, T.StructType) else None


def read_geojson(
    spark: SparkSession, path: str, property_cols: list[str] | None = None
) -> DataFrame:
    """FeatureCollection -> one row per feature.

    multiLine JSON scan -> explode(features). Geometry passes through as
    the RAW JSON string column `geometry` (see module docstring);
    requested property columns are lifted out of `properties`. For
    newline-delimited feature files use ``read_geojsonl``.
    """
    inferred = spark.read.option("multiLine", True).json(path).schema
    raw = (
        spark.read.option("multiLine", True)
        .schema(_geometry_as_string(inferred))
        .json(path)
    )
    feats = raw.select(F.explode("features").alias("f"))
    elem = [f for f in inferred.fields if f.name == "features"][
        0
    ].dataType.elementType
    pschema = _props_schema(
        dict(zip(elem.fieldNames(), [f.dataType for f in elem.fields])).get(
            "properties"
        )
    )
    cols = []
    if property_cols:
        cols += _lift_properties(
            F.col("f.properties"), pschema, property_cols
        )
    else:
        cols += [F.col("f.properties.*")]
    cols.append(F.col("f.geometry").alias("geometry"))
    return feats.select(*cols)


def read_geojsonl(
    spark: SparkSession, path: str, property_cols: list[str] | None = None
) -> DataFrame:
    """Newline-delimited GeoJSON features (the scale-friendly layout)."""
    inferred = spark.read.json(path).schema
    raw = spark.read.schema(_geometry_as_string(inferred)).json(path)
    pschema = _props_schema(
        dict(
            zip(
                inferred.fieldNames(),
                [f.dataType for f in inferred.fields],
            )
        ).get("properties")
    )
    cols = []
    if property_cols:
        cols += _lift_properties(F.col("properties"), pschema, property_cols)
    else:
        cols += [F.col("properties.*")]
    cols.append(F.col("geometry").alias("geometry"))
    return raw.select(*cols)


def feature_json(df: DataFrame, property_cols: list[str]) -> DataFrame:
    """Assemble a GeoJSON Feature JSON string per row -> column `feature`."""
    # keep null attributes (parity with tippecanoe --empty-csv-columns-are-null)
    props = F.to_json(
        F.struct(*[F.col(f"`{c}`") for c in property_cols]),
        {"ignoreNullFields": "false"},
    )
    return df.withColumn(
        "feature",
        F.concat(
            F.lit('{"type":"Feature","properties":'),
            props,
            F.lit(',"geometry":'),
            # RFC 7946 allows "geometry": null — a null column must
            # render the literal, not null-propagate the whole concat
            # into a silent blank line that loses the feature
            F.coalesce(F.col("geometry"), F.lit("null")),
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
