"""End-to-end region pipeline — the reference's build.sh re-expressed as
lazily planned Spark jobs (SURVEY.md §3).

The reference runs: fetch -> shape-data.js (pivot) -> extract-extents.js ->
mapshaper/tippecanoe tile build with per-decade csvcut + tile-join
(/root/reference/build.sh:69-233). Here each output is ONE declarative plan
— Catalyst prunes/pushes across what used to be process boundaries with
files as the IR. The tippecanoe pbf rasterization stays a post-stage
(image encoding, not query processing — SURVEY §7.5); this pipeline emits
everything tippecanoe consumes: sorted tile-ready GeoJSON lines with
attributes joined and sliced.

Scale posture: per-region plans are independent (embarrassingly parallel);
within a region the pivot is one shuffle, the attribute join broadcasts the
wide table (small per region), and tile grouping is a groupBy(z,x,y).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extents import column_extents
from ..operators.geo import numeric_geoid, with_interior_points
from ..operators.pivot import pivot_long_to_wide
from ..schemas import BUBBLE_VARS, CHOROPLETH_VARS, DECADES, long_schema
from ..sources.csv_io import read_long_csv, write_sorted_csv
from ..sources.geojson import read_geojson, write_geojsonl


def build_wide(
    spark: SparkSession, long_csv: str, dataset_type: str = "raw",
    years: list[str] | None = None,
) -> DataFrame:
    """long CSV -> wide table (shape-data.js equivalent, §3.2)."""
    long_df = read_long_csv(spark, long_csv, long_schema(dataset_type))
    return pivot_long_to_wide(long_df, dataset_type, years=years)


def decade_fields(
    wide_cols: list[str], variables: list[str], decade_yys: list[str]
) -> list[str]:
    """csvcut field list: GEOID,n,pl + var-yy for the decade
    (/root/reference/build.sh:177-184,198-205)."""
    wanted = [f"{v}-{yy}" for v in variables for yy in decade_yys]
    return ["GEOID", "n", "pl"] + [c for c in wanted if c in wide_cols]


def tile_layers(
    wide: DataFrame,
    shapes: DataFrame,
    dataset_type: str = "raw",
    decades: dict[str, list[str]] | None = None,
) -> dict[str, DataFrame]:
    """Per-decade bubble + choropleth tile-feature tables (J1/J2/P3/P5/G1/F7).

    bubble layer: interior points of each polygon + rate variables;
    choropleth: polygons + full variable set. The wide attribute table is
    broadcast — per-region it is small; the polygon side never shuffles."""
    from pyspark import StorageLevel

    decades = decades or DECADES
    # each decade's layer writes are independent actions: without the
    # persists every bubble write re-parses the GeoJSON source and
    # re-runs the per-feature interior-point UDF (the one imperative
    # per-row computation in the pipeline). CACHE CONTRACT: released
    # by session clearCache; shapes/centers are region-sized.
    shapes = shapes.withColumn(
        "id", numeric_geoid(F.col("GEOID"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    centers = with_interior_points(shapes).withColumn(
        "geometry",
        F.concat(
            F.lit('{"type":"Point","coordinates":['),
            F.col("ip_x").cast("string"),
            F.lit(","),
            F.col("ip_y").cast("string"),
            F.lit("]}"),
        ),
    ).drop("ip_x", "ip_y").persist(StorageLevel.MEMORY_AND_DISK)

    out: dict[str, DataFrame] = {}
    for dec_name, yys in decades.items():
        bub_fields = decade_fields(wide.columns, BUBBLE_VARS[dataset_type], yys)
        cho_fields = decade_fields(
            wide.columns, CHOROPLETH_VARS[dataset_type], yys
        )
        bub_attrs = wide.select(*bub_fields)
        cho_attrs = wide.select(*cho_fields)
        # left join: features with no data row keep their geometry
        # (tile-join --if-matched, /root/reference/build.sh:189,210)
        out[f"bubble/{dec_name}"] = centers.join(
            F.broadcast(bub_attrs), "GEOID", "left"
        )
        out[f"choropleth/{dec_name}"] = shapes.join(
            F.broadcast(cho_attrs), "GEOID", "left"
        )
    return out


def run_region(
    spark: SparkSession,
    long_csv: str,
    out_dir: str,
    dataset_type: str = "raw",
    geojson_path: str | None = None,
    years: list[str] | None = None,
    build_extents: bool = True,
) -> dict[str, object]:
    """Full region build: wide CSV, extents CSV, tile-ready GeoJSONL.

    Returns output paths plus ``_metrics`` (row/null counts) gathered via
    ``df.observe`` — zero-cost accumulators riding the job, replacing the
    reference's 10-second driver progress ticks
    (/root/reference/scripts/shape-data.js:22,87-95, SURVEY §2.8 F5)."""
    from pyspark.sql import Observation

    from ..operators.pivot import col_map_inv_name, pivot_long_to_wide
    from ..schemas import COL_MAPS

    outputs: dict[str, object] = {}
    # observe the fill count on the LONG scan, where a blank is still
    # observable: counting wide rows with pl == "United States" would
    # conflate genuinely-sourced national rows (every US state) with
    # the falsy-filled ones
    pl_src = col_map_inv_name(COL_MAPS[dataset_type], "pl")
    long_df = read_long_csv(spark, long_csv, long_schema(dataset_type))
    obs_long = Observation("long_scan")
    long_df = long_df.observe(
        obs_long,
        F.count(
            F.when(
                F.col(pl_src).isNull() | (F.col(pl_src) == ""), 1
            )
        ).alias("pl_filled"),
    )
    wide = pivot_long_to_wide(long_df, dataset_type, years=years)

    obs = Observation("wide_build")
    wide = wide.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
    )

    wide_path = os.path.join(out_dir, "data.wide.csv")
    write_sorted_csv(wide, wide_path, ["GEOID"])
    outputs["wide"] = wide_path
    outputs["_metrics"] = {**obs.get, **obs_long.get}

    if build_extents:
        ext_path = os.path.join(out_dir, "extents.csv")
        # column_extents already orders rows by input column position
        write_sorted_csv(column_extents(wide), ext_path, None)
        outputs["extents"] = ext_path

    if geojson_path:
        shapes = read_geojson(spark, geojson_path, ["GEOID"])
        for layer, df in tile_layers(wide, shapes, dataset_type).items():
            path = os.path.join(out_dir, "tiles", layer.replace("/", "_"))
            props = [c for c in df.columns if c != "geometry"]
            write_geojsonl(df, path, props, ["GEOID"])
            outputs[layer] = path
    return outputs
