"""Geometry operators (SURVEY §2.9), GeoJSON source/sink (S4/O2), and the
end-to-end region pipeline (SURVEY §3) on a miniature fixture region."""

import csv
import json
import math
import os

from pyspark.sql import functions as F

from map_v2_etl_spark.operators.geo import (
    _point_in_rings,
    assign_tiles,
    interior_point_py,
    numeric_geoid,
    per_tile_topk,
)
from map_v2_etl_spark.plans.pipeline import run_region
from map_v2_etl_spark.sources.geojson import read_geojson, read_geojsonl


# --------------------------------------------------------------------------
# interior point (G1)
# --------------------------------------------------------------------------

SQUARE = [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]]]
# U-shape: centroid (1.5, ~1.36) falls in the gap between the arms
U_SHAPE = [[[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [2.0, 3.0], [2.0, 1.0],
            [1.0, 1.0], [1.0, 3.0], [0.0, 3.0], [0.0, 0.0]]]
# square with a hole covering its centroid
DONUT = [
    [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
    [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]],
]


def geom(gtype, coords):
    return json.dumps({"type": gtype, "coordinates": coords})


def test_interior_point_convex_is_centroid():
    x, y = interior_point_py(geom("Polygon", SQUARE))
    assert (x, y) == (1.0, 1.0)


def test_interior_point_concave_lands_inside():
    pt = interior_point_py(geom("Polygon", U_SHAPE))
    assert pt is not None
    assert _point_in_rings(pt[0], pt[1], U_SHAPE)
    # the naive centroid is NOT inside — the scanline fallback had to fire
    assert not _point_in_rings(1.5, 9.5 / 7.0, U_SHAPE)


def test_interior_point_hole_avoided():
    pt = interior_point_py(geom("Polygon", DONUT))
    assert pt is not None
    assert _point_in_rings(pt[0], pt[1], DONUT)


def test_interior_point_multipolygon_uses_largest():
    small = [[[10.0, 10.0], [10.5, 10.0], [10.5, 10.5], [10.0, 10.5],
              [10.0, 10.0]]]
    x, y = interior_point_py(geom("MultiPolygon", [small, SQUARE]))
    assert (x, y) == (1.0, 1.0)


def test_interior_point_passthrough_and_null():
    assert interior_point_py(geom("Point", [5.0, 6.0])) == (5.0, 6.0)
    assert interior_point_py(None) is None
    assert interior_point_py(geom("LineString", [[0, 0], [1, 1]])) is None


def test_simplify_removes_near_collinear_points():
    from map_v2_etl_spark.operators.geo import simplify_py

    saw = [[[0.0, 0.0], [1.0, 0.01], [2.0, 0.0], [2.0, 1.0], [2.0, 2.0],
            [1.0, 2.0], [0.0, 2.0], [0.0, 1.0], [0.0, 0.0]]]
    out = json.loads(simplify_py(geom("Polygon", saw), 0.5))
    # near-collinear and exactly-collinear midpoints all drop
    assert out["coordinates"][0] == [
        [0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]
    ]
    # tolerance 0 keeps genuinely non-collinear points
    out0 = json.loads(simplify_py(geom("Polygon", saw), 0.0))
    assert [1.0, 0.01] in out0["coordinates"][0]
    # ring stays closed and valid
    r = out["coordinates"][0]
    assert r[0] == r[-1] and len(r) >= 4


def test_simplify_preserves_degenerate_rings():
    from map_v2_etl_spark.operators.geo import simplify_py

    tri = [[[0.0, 0.0], [1.0, 0.0], [0.5, 0.1], [0.0, 0.0]]]
    out = json.loads(simplify_py(geom("Polygon", tri), 10.0))
    # over-aggressive tolerance would collapse below 4 points -> keep orig
    assert out["coordinates"][0] == tri[0]


# --------------------------------------------------------------------------
# tile keys (G3) + per-tile top-k (O3) + numeric GEOID (F7)
# --------------------------------------------------------------------------

def slippy(lon, lat, z):
    n = 2 ** z
    x = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
    lat_r = math.radians(lat)
    y = int((1.0 - math.log(math.tan(lat_r) + 1.0 / math.cos(lat_r))
             / math.pi) / 2.0 * n)
    return x, min(max(y, 0), n - 1)


def test_tile_xy_matches_slippy_formula(spark):
    pts = [(0.0, 0.0), (-180.0, 85.0), (179.9, -85.0), (-73.98, 40.75),
           (2.35, 48.86)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    got = assign_tiles(df, "lon", "lat", zoom=4).select(
        "lon", "lat", "tile_x", "tile_y"
    ).collect()
    for r in got:
        assert (r.tile_x, r.tile_y) == slippy(r.lon, r.lat, 4), (r.lon, r.lat)


def test_per_tile_topk(spark):
    rows = [(0, 0, 0, "a", 5.0), (0, 0, 0, "b", 9.0), (0, 0, 0, "c", 7.0),
            (0, 1, 0, "d", 1.0)]
    df = spark.createDataFrame(
        rows, ["tile_z", "tile_x", "tile_y", "gid", "w"]
    )
    kept = {r.gid for r in per_tile_topk(df, "w", 2, ["gid"]).collect()}
    assert kept == {"b", "c", "d"}


def test_numeric_geoid(spark):
    df = spark.createDataFrame([("007",), ("12345",), ("junk",)], ["GEOID"])
    got = df.select(numeric_geoid(F.col("GEOID")).alias("id")).collect()
    assert [r.id for r in got] == [7, 12345, None]


# --------------------------------------------------------------------------
# end-to-end region pipeline (SURVEY §3 / §5 item 3)
# --------------------------------------------------------------------------

LONG_HEADER = ("id,year,name,parent_location,population,judgements,"
               "unmapped_col")
LONG_ROWS = [
    # out-of-order GEOIDs; id 02 has empty parent_location (JS-falsy fill)
    "02,2000,Beta,,200,5,x",
    "01,2000,Alpha,Parentland,100,1,x",
    "01,2001,Alpha,Parentland,110,2,x",
    # duplicate (id, year): last row wins at ROW level — population
    # overwritten to 999, judgements overwritten to blank
    "01,2000,Alpha,Parentland,999,,x",
    # id 03 only has year 2001
    "03,2001,Gamma,Parentland,300,7,x",
]

FEATURES = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "properties": {"GEOID": "01"},
         "geometry": {"type": "Polygon", "coordinates": SQUARE}},
        {"type": "Feature", "properties": {"GEOID": "02"},
         "geometry": {"type": "Polygon", "coordinates": U_SHAPE}},
        # no data row for 09 -> left-join keeps the bare feature
        {"type": "Feature", "properties": {"GEOID": "09"},
         "geometry": {"type": "Polygon", "coordinates": SQUARE}},
    ],
}


def test_run_region_end_to_end(spark, tmp_path):
    long_csv = tmp_path / "long.csv"
    long_csv.write_text("\n".join([LONG_HEADER] + LONG_ROWS) + "\n")
    geo = tmp_path / "shapes.geojson"
    geo.write_text(json.dumps(FEATURES))
    out = str(tmp_path / "out")

    outputs = run_region(
        spark, str(long_csv), out, "raw", geojson_path=str(geo),
        years=["2000", "2001"],
    )

    # --- wide CSV: sorted, total schema, LWW + falsy-fill semantics ---
    with open(outputs["wide"]) as f:
        rows = list(csv.DictReader(f))
    assert [r["GEOID"] for r in rows] == ["01", "02", "03"]
    by_id = {r["GEOID"]: r for r in rows}
    assert by_id["01"]["p-00"] == "999.0"      # last write wins
    assert by_id["01"]["e-00"] == ""           # later blank overwrites
    assert by_id["01"]["p-01"] == "110.0"
    assert by_id["02"]["pl"] == "United States"  # empty -> falsy fill
    assert by_id["03"]["p-00"] == ""           # missing year stays blank
    assert by_id["03"]["p-01"] == "300.0"
    assert "unmapped_col" not in rows[0]       # silently dropped

    # observe() metrics rode the job (F5 progress-tick replacement)
    assert outputs["_metrics"]["rows"] == 3
    assert outputs["_metrics"]["pl_filled"] == 1

    # --- extents CSV: header, input column order, R-7 quantiles ---
    with open(outputs["extents"]) as f:
        ext = list(csv.DictReader(f))
    assert list(ext[0].keys()) == ["id", "min", "max", "q1", "q99"]
    e = {r["id"]: r for r in ext}
    # p-00 values: [999, 200] -> R-7 q1 = 200 + 0.01*799
    assert float(e["p-00"]["min"]) == 200.0
    assert float(e["p-00"]["max"]) == 999.0
    assert abs(float(e["p-00"]["q1"]) - 207.99) < 1e-9
    assert abs(float(e["p-00"]["q99"]) - 991.01) < 1e-9
    # extents rows follow wide column order
    ext_ids = [r["id"] for r in ext]
    assert ext_ids.index("p-00") < ext_ids.index("pro-00")

    # --- tile layers: bubble = interior points, choropleth = polygons ---
    bub = outputs["bubble/00-09"]
    features = [
        json.loads(line)
        for part in sorted(os.listdir(bub)) if part.startswith("part-")
        for line in open(os.path.join(bub, part))
    ]
    assert {f["properties"]["GEOID"] for f in features} == {"01", "02", "09"}
    by_gid = {f["properties"]["GEOID"] for f in features}
    for f in features:
        assert f["geometry"]["type"] == "Point"
    pt01 = next(f for f in features if f["properties"]["GEOID"] == "01")
    assert pt01["geometry"]["coordinates"] == [1.0, 1.0]
    # judgement_rate never appeared in the CSV: column exists, value null
    assert "er-00" in pt01["properties"]
    assert pt01["properties"]["er-00"] is None
    # unmatched feature keeps geometry, null attributes (left join)
    f09 = next(f for f in features if f["properties"]["GEOID"] == "09")
    assert f09["properties"]["n"] is None

    cho = outputs["choropleth/00-09"]
    cho_feats = [
        json.loads(line)
        for part in sorted(os.listdir(cho)) if part.startswith("part-")
        for line in open(os.path.join(cho, part))
    ]
    p01 = next(f for f in cho_feats if f["properties"]["GEOID"] == "01")
    assert p01["geometry"]["type"] == "Polygon"
    assert p01["properties"]["id"] == 1  # id = Number(GEOID)
    assert p01["properties"]["p-00"] == 999.0


def test_read_geojson_roundtrip(spark, tmp_path):
    geo = tmp_path / "fc.geojson"
    geo.write_text(json.dumps(FEATURES))
    df = read_geojson(spark, str(geo), ["GEOID"])
    assert df.columns == ["GEOID", "geometry"]
    rows = {r.GEOID: json.loads(r.geometry) for r in df.collect()}
    assert rows["01"]["type"] == "Polygon"

    # newline-delimited variant
    nd = tmp_path / "features.jsonl"
    nd.write_text(
        "\n".join(json.dumps(f) for f in FEATURES["features"]) + "\n"
    )
    df2 = read_geojsonl(spark, str(nd), ["GEOID"])
    assert {r.GEOID for r in df2.collect()} == {"01", "02", "09"}


def test_malformed_structure_yields_null_not_crash(spark):
    """JSON-valid but structurally broken geometries (empty coords,
    empty rings, 1-element points, missing coordinates) must yield
    null interior points / pass-through simplify — not kill the task."""
    from map_v2_etl_spark.operators.geo import (
        interior_point_py,
        simplify_py,
    )

    bad = [
        '{"type":"Polygon","coordinates":[]}',
        '{"type":"Polygon","coordinates":[[]]}',
        '{"type":"Polygon"}',
        '{"type":"Point","coordinates":[1.0]}',
        '{"type":"MultiPolygon","coordinates":[[[]]]}',
    ]
    for g in bad:
        assert interior_point_py(g) is None, g
        assert simplify_py(g, 1.0) == g, g  # pass-through
    # and through the Spark plan end to end
    feats = spark.createDataFrame(
        [(i, g) for i, g in enumerate(bad)]
        + [(99, '{"type":"Point","coordinates":[1.0,2.0]}')],
        "GEOID LONG, geometry STRING",
    )
    from map_v2_etl_spark.operators.geo import with_interior_points

    rows = {r["GEOID"]: r["ip_x"]
            for r in with_interior_points(feats).collect()}
    assert rows[99] == 1.0
    assert all(rows[i] is None for i in range(len(bad)))


def test_point_in_rings_open_ring_correct(spark):
    """Unclosed rings must still ray-cast correctly (the missing
    closing edge previously broke parity: outside points classified
    inside)."""
    from map_v2_etl_spark.operators.geo import _point_in_rings

    open_square = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
    assert _point_in_rings(5.0, 5.0, [open_square])
    assert not _point_in_rings(-5.0, 5.0, [open_square])


def test_assign_tiles_null_nan_coords_stay_null(spark):
    """NULL coordinates must not clamp to the max tile and NaN must not
    cast to tile 0 — both propagate null for filtering/audit."""
    from map_v2_etl_spark.operators.geo import assign_tiles

    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, None, None), (3, float("nan"), float("nan"))],
        "id LONG, lon DOUBLE, lat DOUBLE",
    )
    rows = {r["id"]: (r["tile_x"], r["tile_y"])
            for r in assign_tiles(df, "lon", "lat", 4).collect()}
    assert rows[1] == slippy(10.0, 20.0, 4)
    assert rows[2] == (None, None)
    assert rows[3] == (None, None)


def test_spatial_join_multipolygon(spark):
    """spatial_join must handle MultiPolygon: bbox via the shared
    walker and containment over every part (previously zero matches +
    Arrow crash)."""
    import json as _json

    from map_v2_etl_spark.operators.geo import spatial_join

    geom = _json.dumps({
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]],
            [[[10.0, 10.0], [14.0, 10.0], [14.0, 14.0], [10.0, 14.0],
              [10.0, 10.0]]],
        ],
    })
    polys = spark.createDataFrame([("mp", geom)], "pid STRING, geometry STRING")
    pts = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 12.0, 12.0), (3, 7.0, 7.0)],
        "id LONG, x DOUBLE, y DOUBLE",
    )
    got = {r["id"] for r in spatial_join(pts, polys).collect()}
    assert got == {1, 2}  # both parts match; the gap point doesn't
