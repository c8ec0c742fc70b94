"""Native MVT/MBTiles sink: the reference's tippecanoe product
(reference build.sh:129-134,214), produced IN-SANDBOX with no external
binary — hand-encoded protobuf verified by an independent decoder, and
a real SQLite .mbtiles artifact."""

from __future__ import annotations

import gzip
import json
import os
import sqlite3

from pyspark.sql import functions as F

from map_v2_etl_spark.sources.mvt import (
    EXTENT,
    _varint,
    _zigzag,
    decode_tile,
    encode_layer,
    encode_tiles,
    lonlat_to_tile_px,
    write_mbtiles,
)


def test_varint_zigzag():
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"  # protobuf docs example
    assert _zigzag(0) == 0
    assert _zigzag(-1) == 1
    assert _zigzag(1) == 2
    assert _zigzag(-2) == 3


def test_encode_decode_polygon_roundtrip():
    # a square around lon 1..2, lat 1..2 at z0 tile (0,0)
    ring = [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]
    feat = {
        "geometry": {"type": "Polygon", "coordinates": [ring]},
        "properties": {"GEOID": "01001", "pop": 42},
        "id": 7,
    }
    blob = encode_layer("states", [feat], 0, 0, 0)
    layers = decode_tile(blob)
    assert len(layers) == 1
    lyr = layers[0]
    assert lyr["name"] == "states"
    assert lyr["extent"] == EXTENT
    assert lyr["keys"] == ["GEOID", "pop"]
    assert lyr["values"] == ["01001", 42]
    (f,) = lyr["features"]
    assert f["id"] == 7
    assert f["type"] == 3  # polygon
    assert f["tags"] == [0, 0, 1, 1]
    move, line, close = f["geometry"]
    assert (move["cmd"], line["cmd"], close["cmd"]) == (
        "move", "line", "close",
    )
    got = move["points"] + line["points"]
    # MVT 4.3.4.4: exterior rings need POSITIVE shoelace area on the
    # y-down tile grid; a GeoJSON-compliant CCW exterior computes
    # negative there, so the encoder rewinds it — the decoded ring is
    # the input reversed (same polygon, spec-correct winding)
    want = [lonlat_to_tile_px(x, y, 0, 0, 0) for x, y in ring[:-1]][::-1]
    assert got == want


def test_encode_decode_point_and_line():
    feats = [
        {
            "geometry": {"type": "Point", "coordinates": [10.0, 20.0]},
            "properties": {"name": "p"},
        },
        {
            "geometry": {
                "type": "LineString",
                "coordinates": [[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]],
            },
            "properties": {"name": "l"},
        },
    ]
    layers = decode_tile(encode_layer("misc", feats, 0, 0, 0))
    f_point, f_line = layers[0]["features"]
    assert f_point["type"] == 1
    assert f_point["geometry"][0]["points"] == [
        lonlat_to_tile_px(10.0, 20.0, 0, 0, 0)
    ]
    assert f_line["type"] == 2
    pts = f_line["geometry"][0]["points"] + f_line["geometry"][1]["points"]
    assert len(pts) == 3


def test_spark_tile_pipeline_to_mbtiles(spark, tmp_path):
    # two small squares in different z6 tiles + their bubble points
    def square(lon, lat, d=0.2):
        return json.dumps(
            {
                "type": "Polygon",
                "coordinates": [
                    [
                        [lon, lat], [lon + d, lat], [lon + d, lat + d],
                        [lon, lat + d], [lon, lat],
                    ]
                ],
            }
        )

    rows = [
        ("01", square(-86.9, 32.5), "choropleth-00"),
        ("02", square(-100.3, 35.7), "choropleth-00"),
        ("01", square(-86.9, 32.5), "bubble-00"),
    ]
    feats = spark.createDataFrame(
        rows, "GEOID STRING, geometry STRING, layer STRING"
    )
    tiles = encode_tiles(feats, zoom=6, id_col=None)
    got = tiles.collect()
    assert len(got) == 2  # two distinct z6 tiles
    for r in got:
        layers = decode_tile(bytes(r["pbf"]))
        names = [l["name"] for l in layers]
        assert "choropleth-00" in names
        for lyr in layers:
            assert lyr["extent"] == EXTENT
            for f in lyr["features"]:
                assert f["geometry"], "empty geometry commands"

    path = str(tmp_path / "states.mbtiles")
    n = write_mbtiles(
        tiles, path, "states", minzoom=6, maxzoom=6,
        layer_fields={
            "choropleth-00": {"GEOID": "String"},
            "bubble-00": {"GEOID": "String"},
        },
    )
    assert n == 2
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert meta["format"] == "pbf"
    assert meta["name"] == "states"
    vl = json.loads(meta["json"])["vector_layers"]
    assert {v["id"] for v in vl} == {"choropleth-00", "bubble-00"}
    stored = con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
    ).fetchall()
    assert len(stored) == 2
    for z, x, tms_y, blob in stored:
        assert z == 6
        # TMS flip: recover slippy y and the original blob
        y = (1 << z) - 1 - tms_y
        raw = gzip.decompress(blob)
        layers = decode_tile(raw)
        assert layers and layers[0]["features"]
        orig = next(
            bytes(r["pbf"]) for r in got if r["x"] == x and r["y"] == y
        )
        assert raw == orig
    con.close()


def test_mbtiles_deterministic_bytes(spark, tmp_path):
    """Same input -> byte-identical .mbtiles (gzip mtime pinned, key/
    value interning order pinned by feature sort)."""
    feats = spark.createDataFrame(
        [
            ("01", '{"type":"Point","coordinates":[1.0,2.0]}', "pts"),
            ("02", '{"type":"Point","coordinates":[1.1,2.1]}', "pts"),
        ],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    p1, p2 = str(tmp_path / "a.mbtiles"), str(tmp_path / "b.mbtiles")
    write_mbtiles(encode_tiles(feats, 4), p1, "t", 4, 4)
    write_mbtiles(encode_tiles(feats, 4), p2, "t", 4, 4)
    t1 = sqlite3.connect(p1).execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles "
        "ORDER BY 1, 2, 3"
    ).fetchall()
    t2 = sqlite3.connect(p2).execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles "
        "ORDER BY 1, 2, 3"
    ).fetchall()
    assert t1 == t2


def test_clip_ring_square():
    from map_v2_etl_spark.sources.mvt import clip_ring

    sq = [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0)]
    clipped = clip_ring(sq, 0, 0, 5, 5)
    assert sorted(clipped) == [(0.0, 0.0), (0.0, 5.0), (5.0, 0.0), (5.0, 5.0)]
    assert clip_ring(sq, 20, 20, 30, 30) == []


def test_polygon_spanning_tiles_clipped_into_both(spark):
    """Clip-and-duplicate: a polygon crossing a tile boundary shows up
    in every overlapped tile, geometry clipped to each tile's buffered
    box (coords within [-buf, extent+buf])."""
    # z1 tile boundary is lon 0; span it widely
    geom = json.dumps(
        {
            "type": "Polygon",
            "coordinates": [
                [
                    [-30.0, -20.0], [30.0, -20.0], [30.0, 20.0],
                    [-30.0, 20.0], [-30.0, -20.0],
                ]
            ],
        }
    )
    feats = spark.createDataFrame(
        [("A", geom, "poly")], "GEOID STRING, geometry STRING, layer STRING"
    )
    tiles = encode_tiles(feats, zoom=1, clip_buf=64).collect()
    xs = sorted((r["x"], r["y"]) for r in tiles)
    assert xs == [(0, 0), (0, 1), (1, 0), (1, 1)]  # 4 tiles at z1
    for r in tiles:
        layers = decode_tile(bytes(r["pbf"]))
        (f,) = layers[0]["features"]
        pts = [
            p
            for part in f["geometry"]
            for p in part["points"]
        ]
        assert pts, "clipped geometry must be non-empty"
        for x, y in pts:
            assert -64 <= x <= EXTENT + 64
            assert -64 <= y <= EXTENT + 64


def test_clip_none_single_tile_assignment(spark):
    geom = json.dumps(
        {
            "type": "Polygon",
            "coordinates": [
                [
                    [-30.0, -20.0], [30.0, -20.0], [30.0, 20.0],
                    [-30.0, 20.0], [-30.0, -20.0],
                ]
            ],
        }
    )
    feats = spark.createDataFrame(
        [("A", geom, "poly")], "GEOID STRING, geometry STRING, layer STRING"
    )
    tiles = encode_tiles(feats, zoom=1, clip_buf=None).collect()
    assert len(tiles) == 1  # representative-point tile only


def test_encode_pyramid_with_density_drop(spark, tmp_path):
    """Multi-zoom pyramid: every zoom present; low zooms keep only the
    heaviest features per tile, deep zooms keep all."""
    import random

    from map_v2_etl_spark.sources.mvt import encode_pyramid

    rng = random.Random(7)
    rows = []
    for i in range(30):
        lon, lat = -120 + rng.random() * 60, 25 + rng.random() * 20
        rows.append(
            (
                f"{i:05d}",
                float(i),
                json.dumps({"type": "Point", "coordinates": [lon, lat]}),
                "bubble",
            )
        )
    feats = spark.createDataFrame(
        rows, "GEOID STRING, pop DOUBLE, geometry STRING, layer STRING"
    )
    pyr = encode_pyramid(
        feats, minzoom=2, maxzoom=6, id_col="GEOID",
        max_per_tile=5, weight_col="pop",
    ).collect()
    by_zoom = {}
    for r in pyr:
        by_zoom.setdefault(r["z"], []).append(r)
    assert set(by_zoom) == {2, 3, 4, 5, 6}
    # z2: the drop rule holds PER TILE — no tile carries more than 5,
    # and the cap actually bit (fewer features than the input total)
    z2_total = 0
    for r in by_zoom[2]:
        n_tile = sum(
            len(lyr["features"]) for lyr in decode_tile(bytes(r["pbf"]))
        )
        assert n_tile <= 5
        z2_total += n_tile
    assert z2_total < 30
    # deep zoom keeps everything (count DISTINCT ids: a point within
    # the clip buffer of a tile edge is encoded in the neighbor tile's
    # buffer zone too — tippecanoe --buffer semantics)
    z6_ids = {
        f["id"]
        for r in by_zoom[6]
        for lyr in decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]
    }
    assert len(z6_ids) == 30

    from map_v2_etl_spark.sources.mvt import write_mbtiles

    path = str(tmp_path / "pyr.mbtiles")
    n = write_mbtiles(
        spark.createDataFrame(pyr), path, "pyr", minzoom=2, maxzoom=6
    )
    assert n == len(pyr)
    meta = dict(
        sqlite3.connect(path).execute("SELECT name, value FROM metadata")
    )
    assert (meta["minzoom"], meta["maxzoom"]) == ("2", "6")


def test_reference_pipeline_native_tileset_and_deploy(spark, tmp_path):
    """The reference's tileset + deploy arc with ZERO external binaries:
    wide table -> tile_layers -> native .mbtiles (S8) -> tile directory
    (S9, mbtiles_to_dir) -> S3 upload manifest (S7) against moto when
    available, LocalObjectStore otherwise."""
    from map_v2_etl_spark.plans.pipeline import build_wide, tile_layers
    from map_v2_etl_spark.plans.tileset import (
        LocalObjectStore,
        build_tileset_native,
        execute_manifest,
        upload_manifest,
    )
    from map_v2_etl_spark.sources.mvt import decode_tile, mbtiles_to_dir

    src = tmp_path / "long.csv"
    src.write_text(
        "id,year,name,parent_location,population,eviction_rate,"
        "eviction_filing_rate,renter_occupied_households\n"
        "01,2000,A,US,100,1.0,2.0,40\n"
        "02,2000,B,US,50,0.5,0.7,20\n"
    )
    wide = build_wide(spark, str(src), "raw")
    shapes = spark.createDataFrame(
        [
            (
                "01",
                '{"type":"Polygon","coordinates":'
                "[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}",
            ),
            (
                "02",
                '{"type":"Polygon","coordinates":'
                "[[[2,0],[3,0],[3,1],[2,1],[2,0]]]}",
            ),
        ],
        ["GEOID", "geometry"],
    )
    layers = tile_layers(wide, shapes, "raw")
    # layer keys are "bubble/00-09" / "choropleth/00-09" etc.
    dec00 = {
        name.split("/")[0] + "-00": df
        for name, df in layers.items()
        if name.endswith("/00-09")
    }
    assert set(dec00) == {"bubble-00", "choropleth-00"}

    mb = str(tmp_path / "states-00.mbtiles")
    n = build_tileset_native(dec00, mb, "states-00", zoom=6, id_col="id")
    assert n >= 1

    tile_dir = str(tmp_path / "states-00")
    assert mbtiles_to_dir(mb, tile_dir) == n
    # the directory mirrors the sqlite content: every pbf decodes and
    # carries both layers' features with GEOID properties
    import glob
    import gzip as _gzip

    pbfs = glob.glob(os.path.join(tile_dir, "**", "*.pbf"), recursive=True)
    assert len(pbfs) == n
    seen_layers = set()
    for p in pbfs:
        with open(p, "rb") as fh:
            layers_dec = decode_tile(_gzip.decompress(fh.read()))
        for lyr in layers_dec:
            seen_layers.add(lyr["name"])
            assert "GEOID" in lyr["keys"]
    assert seen_layers == {"bubble-00", "choropleth-00"}

    m = upload_manifest("states", tile_dirs={"states-00": tile_dir})
    try:
        import boto3
        import moto

        with moto.mock_aws():
            client = boto3.client("s3", region_name="us-east-1")
            client.create_bucket(Bucket="tileset-output")
            n_up = execute_manifest(m, client)
            keys = {
                o["Key"]
                for o in client.list_objects_v2(Bucket="tileset-output")[
                    "Contents"
                ]
            }
    except ImportError:
        store = LocalObjectStore(str(tmp_path / "store"))
        n_up = execute_manifest(m, store)
        keys = set(store.list_objects(Bucket="tileset-output"))
    assert n_up == n + 1  # every pbf + metadata.json
    assert any(k.endswith(".pbf") for k in keys)
    assert "states-00/metadata.json" in keys


def test_build_tileset_native_region_pyramid(spark, tmp_path):
    """region= selects the reference's per-class zoom range (states:
    0-6) and builds the full pyramid in one artifact."""
    from map_v2_etl_spark.plans.tileset import build_tileset_native

    feats = spark.createDataFrame(
        [
            ("01", 9.0, '{"type":"Point","coordinates":[-86.9,32.5]}'),
            ("02", 1.0, '{"type":"Point","coordinates":[-100.3,35.7]}'),
        ],
        "GEOID STRING, pop DOUBLE, geometry STRING",
    )
    mb = str(tmp_path / "states.mbtiles")
    n = build_tileset_native(
        {"states-centers": feats}, mb, "states", region="states",
        max_per_tile=1, weight_col="pop",
    )
    con = sqlite3.connect(mb)
    zooms = sorted(
        z for (z,) in con.execute("SELECT DISTINCT zoom_level FROM tiles")
    )
    assert zooms == list(range(0, 7))
    # z0: one world tile, only the heaviest point survives the cap
    (blob,) = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level = 0"
    ).fetchone()
    layers = decode_tile(gzip.decompress(blob))
    assert sum(len(l["features"]) for l in layers) == 1
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert (meta["minzoom"], meta["maxzoom"]) == ("0", "6")
    con.close()


def test_simplify_px_reduces_vertices(spark):
    """tippecanoe --simplification parity: a sawtooth square encoded
    with a pixel tolerance collapses to its 4 corners at low zoom but
    keeps its detail when encoded without simplification."""
    import math

    pts = []
    for i in range(20):  # noisy top edge: 20 points with tiny jitter
        pts.append([i * 0.5, 0.02 * (i % 2)])
    ring = pts + [[9.5, 10.0], [0.0, 10.0], [0.0, 0.0]]
    geom = json.dumps({"type": "Polygon", "coordinates": [ring]})
    feats = spark.createDataFrame(
        [("A", geom, "poly")], "GEOID STRING, geometry STRING, layer STRING"
    )

    def n_vertices(tiles):
        return sum(
            len(part["points"])
            for r in tiles
            for lyr in decode_tile(bytes(r["pbf"]))
            for f in lyr["features"]
            for part in f["geometry"]
        )

    plain = encode_tiles(feats, zoom=3, clip_buf=None).collect()
    simp = encode_tiles(
        feats, zoom=3, clip_buf=None, simplify_px=8.0
    ).collect()
    assert n_vertices(simp) < n_vertices(plain)
    assert n_vertices(simp) >= 4


def test_polygon_hole_winding():
    """Donut polygon: exterior encodes with positive shoelace area in
    tile coords (y-down screen CW), the hole negative — and a
    wrong-wound input is rewound to the same result (MVT 4.3.4.4 /
    tippecanoe rewind behavior)."""
    outer = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]
    hole = [[3.0, 3.0], [3.0, 6.0], [6.0, 6.0], [6.0, 3.0], [3.0, 3.0]]

    def area2(pts):
        return sum(
            pts[i][0] * pts[(i + 1) % len(pts)][1]
            - pts[(i + 1) % len(pts)][0] * pts[i][1]
            for i in range(len(pts))
        )

    def rings_of(geomdict):
        blob = encode_layer(
            "l",
            [{"geometry": geomdict, "properties": {}}],
            2, 2, 1,
        )
        (f,) = decode_tile(blob)[0]["features"]
        rings, cur = [], None
        for part in f["geometry"]:
            if part["cmd"] == "move":
                cur = list(part["points"])
            elif part["cmd"] == "line":
                cur += part["points"]
            else:
                rings.append(cur)
        return rings

    good = rings_of({"type": "Polygon", "coordinates": [outer, hole]})
    assert area2(good[0]) > 0  # exterior: screen-CW
    assert area2(good[1]) < 0  # hole: screen-CCW
    # same polygon with BOTH rings wound wrong -> identical encoding
    bad = rings_of(
        {"type": "Polygon", "coordinates": [outer[::-1], hole[::-1]]}
    )
    assert area2(bad[0]) > 0
    assert area2(bad[1]) < 0
    assert {tuple(p) for p in bad[0]} == {tuple(p) for p in good[0]}


def test_invalid_geometries_audit(spark):
    """Bad geometries don't crash the tile encode — they drop, and the
    audit surfaces exactly the dropped rows (no-silent-caps)."""
    from map_v2_etl_spark.sources.mvt import invalid_geometries

    feats = spark.createDataFrame(
        [
            # tile-center point: stays a SINGLE encoded copy (a point
            # within 64 px of a tile edge is also encoded into the
            # neighbor's buffer zone, which isn't what this test is
            # counting)
            ("ok", '{"type":"Point","coordinates":[45.0,40.0]}', "l"),
            ("bad-json", "{not json", "l"),
            ("bad-type", '{"type":"Sphere","coordinates":[]}', "l"),
        ],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    tiles = encode_tiles(feats, zoom=2).collect()
    kept = [
        f
        for r in tiles
        for lyr in decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]
    ]
    assert len(kept) == 1
    dropped = {r["GEOID"] for r in invalid_geometries(feats).collect()}
    assert dropped == {"bad-json", "bad-type"}


def test_unsupported_type_with_plausible_coords_drops_not_crashes(spark):
    feats = spark.createDataFrame(
        [
            # tile-center point (edge-adjacent points buffer-duplicate)
            ("ok", '{"type":"Point","coordinates":[45.0,40.0]}', "l"),
            (
                "sphere",
                '{"type":"Sphere","coordinates":[[1.0,2.0],[3.0,4.0]]}',
                "l",
            ),
        ],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    tiles = encode_tiles(feats, zoom=2).collect()  # must not raise
    kept = [
        f
        for r in tiles
        for lyr in decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]
    ]
    assert len(kept) == 1
    from map_v2_etl_spark.sources.mvt import invalid_geometries

    assert {r["GEOID"] for r in invalid_geometries(feats).collect()} == {
        "sphere"
    }


def test_buffer_zone_assignment(spark):
    """A feature within clip_buf px OUTSIDE a tile is still encoded
    into that tile's buffer zone (tippecanoe --buffer): strokes/fills
    must not pop at tile edges. z2 tiles are 90 deg wide; lon 0 is the
    x=1|x=2 boundary, so a point at lon 0.5 (just inside x=2, ~23 px
    from the edge) must also appear in x=1's buffer."""
    feats = spark.createDataFrame(
        [("p", '{"type":"Point","coordinates":[0.5,40.0]}', "l")],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    tiles = {(r["x"], r["y"]): bytes(r["pbf"])
             for r in encode_tiles(feats, zoom=2).collect()}
    assert (2, 1) in tiles  # home tile
    assert (1, 1) in tiles  # buffer-zone neighbor
    # in the neighbor the point sits past the right edge, inside buffer
    (lyr,) = decode_tile(tiles[(1, 1)])
    (f,) = lyr["features"]
    px = f["geometry"][0]["points"][0][0]
    assert EXTENT < px <= EXTENT + 64
    # a tile-CENTER point must NOT duplicate
    feats_c = spark.createDataFrame(
        [("c", '{"type":"Point","coordinates":[45.0,40.0]}', "l")],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    assert len(encode_tiles(feats_c, zoom=2).collect()) == 1


def test_dropped_features_audit(spark):
    """dropped_features surfaces BOTH drop classes with reasons: null
    bbox AND the MAX_TILES_PER_FEATURE span cap (which encode_tiles
    silently enforced before this audit existed)."""
    from map_v2_etl_spark.sources.mvt import (
        MAX_TILES_PER_FEATURE,
        dropped_features,
    )

    world = [[-179.9, -60.0], [179.9, -60.0], [179.9, 60.0],
             [-179.9, 60.0], [-179.9, -60.0]]
    feats = spark.createDataFrame(
        [
            # 45.7 is mid-tile at zoom 8 (45.0 is exactly a z8 tile
            # boundary and would buffer-duplicate)
            ("ok", '{"type":"Point","coordinates":[45.7,40.0]}', "l"),
            ("bad", "{not json", "l"),
            (
                "world",
                json.dumps({"type": "Polygon", "coordinates": [world]}),
                "l",
            ),
        ],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    # zoom 8: the world polygon spans ~256x~200 tiles >> 256 cap
    audit = {
        r["GEOID"]: r["drop_reason"]
        for r in dropped_features(feats, zoom=8).collect()
    }
    assert audit == {
        "bad": "invalid_geometry",
        "world": "tile_span_exceeded",
    }
    # and encode_tiles agrees: only "ok" is encoded
    kept_tags = [
        f
        for r in encode_tiles(feats, zoom=8).collect()
        for lyr in decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]
    ]
    assert len(kept_tags) == 1
    # at zoom 0 the world polygon fits -> audit shrinks to the bad row
    audit0 = {
        r["GEOID"]: r["drop_reason"]
        for r in dropped_features(feats, zoom=0).collect()
    }
    assert audit0 == {"bad": "invalid_geometry"}


def test_encode_tiles_no_props_no_id_deterministic(spark):
    """id_col=None with ZERO property columns must not crash (the old
    sort key indexed prop_cols[0]) and must yield identical bytes
    across runs with different partitioning (composite sort key)."""
    rows = [
        (json.dumps({"type": "Point",
                     "coordinates": [10.0 + i, 40.0 + (i % 7)]}), "l")
        for i in range(40)
    ]
    blobs = []
    for parts in (1, 7):
        feats = spark.createDataFrame(
            rows, "geometry STRING, layer STRING"
        ).repartition(parts)
        tiles = {
            (r["z"], r["x"], r["y"]): bytes(r["pbf"])
            for r in encode_tiles(feats, zoom=3, id_col=None).collect()
        }
        blobs.append(tiles)
    assert blobs[0] == blobs[1]


def test_encode_tiles_duplicate_sort_key_deterministic(spark):
    """Non-unique first property (the old single-column sort key) no
    longer leaves tile bytes shuffle-order-dependent."""
    rows = [
        ("same", f"{i:03d}",
         json.dumps({"type": "Point",
                     "coordinates": [40.0 + i * 0.01, 40.0]}), "l")
        for i in range(50)
    ]
    blobs = []
    for parts in (1, 13):
        feats = spark.createDataFrame(
            rows, "grp STRING, uid STRING, geometry STRING, layer STRING"
        ).repartition(parts)
        tiles = {
            (r["x"], r["y"]): bytes(r["pbf"])
            for r in encode_tiles(feats, zoom=4, id_col=None).collect()
        }
        blobs.append(tiles)
    assert blobs[0] == blobs[1]


def test_multipolygon_with_hole_roundtrip(spark):
    """tippecanoe's --detect-shared-borders / --coalesce flags exist
    for exactly this shape class: a multipolygon whose first part has
    a hole. Decode must give back both parts, ring winding per MVT
    spec 4.3.4.4 (exterior screen-CW = positive area2, hole negative),
    and the hole must be inside its exterior."""
    outer = [[10.0, 10.0], [30.0, 10.0], [30.0, 30.0], [10.0, 30.0],
             [10.0, 10.0]]
    hole = [[15.0, 15.0], [15.0, 25.0], [25.0, 25.0], [25.0, 15.0],
            [15.0, 15.0]]
    island = [[40.0, 12.0], [44.0, 12.0], [44.0, 16.0], [40.0, 16.0],
              [40.0, 12.0]]
    geom = {
        "type": "MultiPolygon",
        "coordinates": [[outer, hole], [island]],
    }
    feats = spark.createDataFrame(
        [("mp", json.dumps(geom), "l")],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    tiles = encode_tiles(feats, zoom=2, id_col=None).collect()
    # pick the tile containing the shape's core
    def rings_from(pbf):
        (lyr,) = decode_tile(bytes(pbf))
        (f,) = lyr["features"]
        assert f["type"] == 3  # POLYGON
        rings, cur = [], None
        for part in f["geometry"]:
            if part["cmd"] == "move":
                cur = list(part["points"])
            elif part["cmd"] == "line":
                cur.extend(part["points"])
            elif part["cmd"] == "close":
                rings.append(cur)
        return rings

    def area2(ring):
        s = 0
        pts = ring + [ring[0]]
        for (ax, ay), (bx, by) in zip(pts, pts[1:]):
            s += ax * by - bx * ay
        return s

    # find the tile where all three rings survive clipping
    full = None
    for r in tiles:
        rings = rings_from(r["pbf"])
        if len(rings) == 3:
            full = rings
            break
    assert full is not None, "no tile carried all three rings"
    signs = [area2(rg) for rg in full]
    # MVT winding: exterior positive (screen-CW), interior negative
    assert signs[0] > 0 and signs[1] < 0 and signs[2] > 0
    # the hole's points sit strictly inside the first exterior's bbox
    ex_xs = [p[0] for p in full[0]]
    ex_ys = [p[1] for p in full[0]]
    for x, y in full[1]:
        assert min(ex_xs) < x < max(ex_xs)
        assert min(ex_ys) < y < max(ex_ys)


def test_antimeridian_adjacent_tract(spark):
    """A polygon hugging the antimeridian (the easternmost z-level
    column) must clip to its home tiles without wrapping into x=0 and
    without vertex overflow past the buffered clip box."""
    ring = [[179.2, 50.0], [179.9, 50.0], [179.9, 53.0], [179.2, 53.0],
            [179.2, 50.0]]
    feats = spark.createDataFrame(
        [("am", json.dumps({"type": "Polygon", "coordinates": [ring]}),
          "l")],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    z = 3
    tiles = encode_tiles(feats, zoom=z, id_col=None).collect()
    xs = {r["x"] for r in tiles}
    assert xs and xs <= {(1 << z) - 1}  # last column only, no x=0 wrap
    for r in tiles:
        (lyr,) = decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]:
            for part in f["geometry"]:
                for x, y in part.get("points", []):
                    assert -64 <= x <= EXTENT + 64
                    assert -64 <= y <= EXTENT + 64


def test_write_tile_dir_matches_collected_path(spark, tmp_path):
    """The distributed z/x/y sink (executor-side foreachPartition, no
    driver collect) produces a directory BYTE-IDENTICAL to the
    collected path (write_mbtiles -> mbtiles_to_dir), metadata.json
    included — so the scale path and the bounded path are
    interchangeable artifacts."""
    import random

    from map_v2_etl_spark.sources.mvt import (
        encode_pyramid,
        mbtiles_to_dir,
        write_tile_dir,
    )

    rng = random.Random(11)
    rows = []
    for i in range(40):
        lon, lat = -120 + rng.random() * 100, 20 + rng.random() * 30
        rows.append(
            (f"{i:04d}",
             json.dumps({"type": "Point", "coordinates": [lon, lat]}),
             "pts")
        )
    feats = spark.createDataFrame(
        rows, "GEOID STRING, geometry STRING, layer STRING"
    ).repartition(6)
    tiles = encode_pyramid(feats, 1, 4, id_col="GEOID")
    fields = {"pts": {"GEOID": "String"}}

    mb = str(tmp_path / "t.mbtiles")
    d_collected = str(tmp_path / "via_mbtiles")
    n1 = write_mbtiles(tiles, mb, "t", 1, 4, layer_fields=fields)
    assert mbtiles_to_dir(mb, d_collected) == n1

    d_dist = str(tmp_path / "distributed")
    n2 = write_tile_dir(tiles, d_dist, "t", 1, 4, layer_fields=fields)
    assert n2 == n1 and n1 > 4

    def tree(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = open(p, "rb").read()
        return out

    t1, t2 = tree(d_collected), tree(d_dist)
    assert set(t1) == set(t2)
    assert t1 == t2  # byte-identical, metadata.json included


def test_build_tileset_native_directory_target(spark, tmp_path):
    """build_tileset_native with a non-.mbtiles out_path takes the
    distributed directory sink."""
    from map_v2_etl_spark.plans.tileset import build_tileset_native

    feats = spark.createDataFrame(
        [("01", '{"type":"Point","coordinates":[-86.5,32.6]}'),
         ("02", '{"type":"Point","coordinates":[-100.1,35.2]}')],
        "GEOID STRING, geometry STRING",
    )
    out = str(tmp_path / "tiles")
    n = build_tileset_native({"pts": feats}, out, "t", zoom=5,
                             id_col=None)
    assert n == 2
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["format"] == "pbf" and meta["name"] == "t"
    pbfs = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out) for f in fs if f.endswith(".pbf")
    ]
    assert len(pbfs) == 2
    for p in pbfs:
        layers = decode_tile(gzip.decompress(open(p, "rb").read()))
        assert layers and layers[0]["features"]


def test_write_tile_dir_replaces_stale_output(spark, tmp_path):
    """Rebuilding into the same directory target must not leave tiles
    from the previous (larger) build being served."""
    from map_v2_etl_spark.sources.mvt import write_tile_dir

    def pts(n):
        rows = [
            (f"{i:02d}",
             json.dumps({"type": "Point",
                         "coordinates": [-120.0 + i * 11.0, 40.0]}),
             "pts")
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "GEOID STRING, geometry STRING, layer STRING"
        )

    d = str(tmp_path / "tiles")
    n1 = write_tile_dir(encode_tiles(pts(8), 5, id_col="GEOID"),
                        d, "t", 5, 5)
    n2 = write_tile_dir(encode_tiles(pts(2), 5, id_col="GEOID"),
                        d, "t", 5, 5)
    assert n1 > n2
    on_disk = sum(
        1 for dp, _, fs in os.walk(d) for f in fs if f.endswith(".pbf")
    )
    assert on_disk == n2  # no orphans from the first build


def test_encode_tiles_array_property_survives(spark):
    """Array-typed property columns must not crash the composite sort
    key (pandas cannot compare numpy arrays) and still encode as
    feature properties via the str() value fallback."""
    rows = [
        ("02", [3, 4], '{"type":"Point","coordinates":[45.7,40.0]}', "l"),
        ("01", [1, 2], '{"type":"Point","coordinates":[45.7,40.1]}', "l"),
    ]
    feats = spark.createDataFrame(
        rows,
        "GEOID STRING, vec ARRAY<INT>, geometry STRING, layer STRING",
    )
    tiles = encode_tiles(feats, zoom=6, id_col="GEOID").collect()
    got = [
        f
        for r in tiles
        for lyr in decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]
    ]
    assert len(got) == 2


def test_dropped_features_point_path_matches_encoder(spark):
    """clip_buf=None audit parity: the interior-point path has NO span
    cap, so a world-spanning polygon is ENCODED (one tile) and must not
    appear in the audit; only null-interior-point rows drop."""
    from map_v2_etl_spark.sources.mvt import dropped_features

    world = [[-179.9, -60.0], [179.9, -60.0], [179.9, 60.0],
             [-179.9, 60.0], [-179.9, -60.0]]
    feats = spark.createDataFrame(
        [
            ("world",
             json.dumps({"type": "Polygon", "coordinates": [world]}),
             "l"),
            ("bad", "{not json", "l"),
        ],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    audit = {
        r["GEOID"]: r["drop_reason"]
        for r in dropped_features(
            feats, zoom=8, clip_buf=None
        ).collect()
    }
    assert audit == {"bad": "invalid_geometry"}
    encoded = [
        f
        for r in encode_tiles(feats, zoom=8, clip_buf=None).collect()
        for lyr in decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]
    ]
    assert len(encoded) == 1  # the world polygon, via interior point


def test_simplify_prepass_tolerates_bad_geometry(spark):
    """encode_tiles(simplify_px=...) must not crash on a malformed
    geometry row — the bbox filter downstream owns the drop."""
    feats = spark.createDataFrame(
        [
            ("ok",
             json.dumps({"type": "Polygon", "coordinates": [[
                 [10.0, 10.0], [20.0, 10.0], [20.0, 20.0],
                 [10.0, 20.0], [10.0, 10.0]]]}),
             "l"),
            ("bad", "{not json", "l"),
        ],
        "GEOID STRING, geometry STRING, layer STRING",
    )
    tiles = encode_tiles(
        feats, zoom=3, id_col=None, simplify_px=2.0
    ).collect()  # must not raise
    kept = [
        f
        for r in tiles
        for lyr in decode_tile(bytes(r["pbf"]))
        for f in lyr["features"]
    ]
    assert kept  # the good polygon survived


def test_point_with_elevation_coordinate_encodes(spark):
    """GeoJSON permits [lon, lat, elevation]; the Point path must index
    the first two instead of splatting all three (r6 review fix)."""
    import json as _json

    from map_v2_etl_spark.sources.mvt import decode_tile, encode_layer

    feats = [{
        "geometry": _json.dumps(
            {"type": "Point", "coordinates": [-86.8, 32.6, 123.0]}
        ),
        "props": {"GEOID": "01"},
        "id": 1,
    }]
    blob = encode_layer("pts", feats, 0, 0, 0)
    (lyr,) = decode_tile(blob)
    assert len(lyr["features"]) == 1 and lyr["features"][0]["type"] == 1


def test_null_and_string_feature_ids_skip_id_field(spark):
    """Nullable id columns arrive as NaN floats through Arrow->pandas;
    string and negative ids are not MVT uint64s — all must encode the
    feature WITHOUT an id rather than crash the encode task."""
    import json as _json

    from map_v2_etl_spark.sources.mvt import decode_tile, encode_layer

    pt = _json.dumps({"type": "Point", "coordinates": [-86.8, 32.6]})
    feats = [
        {"geometry": pt, "props": {"GEOID": "a"}, "id": float("nan")},
        {"geometry": pt, "props": {"GEOID": "b"}, "id": None},
        {"geometry": pt, "props": {"GEOID": "c"}, "id": "GEOID7"},
        {"geometry": pt, "props": {"GEOID": "d"}, "id": -5},
        {"geometry": pt, "props": {"GEOID": "e"}, "id": 7},
    ]
    blob = encode_layer("ids", feats, 0, 0, 0)
    (lyr,) = decode_tile(blob)
    assert len(lyr["features"]) == 5
    ids = [f["id"] for f in lyr["features"]]
    assert ids.count(None) == 4 and 7 in ids


def test_long_line_kept_in_traversed_middle_tile(spark):
    """A two-vertex line spanning three tiles must encode into the
    MIDDLE tile it traverses even though neither vertex lies in that
    tile's buffered box (r6 review fix: segment-box intersection, not
    any-vertex)."""
    import json as _json

    from map_v2_etl_spark.sources.mvt import decode_tile, encode_tiles

    # z2: 4x4 tiles, 90 degrees of longitude each. A horizontal line
    # from x-tile 0 to x-tile 2 at constant latitude crosses tile (1, y)
    line = _json.dumps({
        "type": "LineString",
        "coordinates": [[-170.0, 20.0], [10.0, 20.0]],
    })
    feats = spark.createDataFrame(
        [("l", "L1", line)], "layer STRING, GEOID STRING, geometry STRING"
    )
    tiles = {
        (r["x"], r["y"]): bytes(r["pbf"])
        for r in encode_tiles(feats, 2, clip_buf=8).collect()
    }
    xs = {x for (x, y) in tiles}
    assert {0, 1, 2} <= xs, f"line missing from middle tile: {sorted(xs)}"
    for (x, y), blob in tiles.items():
        if x == 1:
            (lyr,) = decode_tile(blob)
            assert lyr["features"][0]["type"] == 2  # LineString present
