"""Tileset post-stage: command recipe, decade CSV slices, deploy manifest
(SURVEY.md §2.1 S8/S9/S7 metadata parity)."""

import os
import shutil

import pytest

from map_v2_etl_spark.plans.tileset import (
    build_tileset,
    export_decade_csvs,
    manifest_to_aws_cli,
    tippecanoe_commands,
    upload_manifest,
)

HAVE_TIPPECANOE = shutil.which("tippecanoe") and shutil.which("tile-join")


def test_tippecanoe_command_recipe_matches_reference_shape():
    cmds = tippecanoe_commands("tracts", "/w", ["00", "10"])
    # 2 base tilesets + per decade: 2 data joins + 1 merge
    assert len(cmds) == 2 + 2 * 3
    base_bubble, base_choro = cmds[0], cmds[1]
    assert base_bubble[0] == "tippecanoe"
    assert "-L" in base_bubble
    assert "tracts-centers:/w/centers.geojson" in base_bubble
    # region-class zoom options (build.sh:128,151)
    assert "--base-zoom=9" in base_bubble
    assert "--detect-shared-borders" in base_choro
    assert "--use-attribute-for-id=id" in base_bubble
    # decade data join uses the csvcut slice and --if-matched semantics
    j = cmds[2]
    assert j[0] == "tile-join" and "--if-matched" in j
    assert "/w/bubble-data-00.wide.csv" in j
    # final merge lands in the build dir with the {region}-{dd} name
    merge = cmds[4]
    assert merge[-3].endswith("build/tracts-00.mbtiles")
    # S9 directory variant appends an --output-to-directory step per decade
    with_dirs = tippecanoe_commands("tracts", "/w", ["00"], output_dirs=True)
    assert any(
        any(a.startswith("--output-to-directory=") for a in c)
        for c in with_dirs
    )


def test_build_tileset_raises_with_recipe_when_binaries_absent(tmp_path):
    if HAVE_TIPPECANOE:
        pytest.skip("tippecanoe installed; covered by e2e test")
    with pytest.raises(RuntimeError) as ei:
        build_tileset("states", str(tmp_path), ["00"])
    # the recipe must survive in the error so it can be replayed elsewhere
    assert "tippecanoe -o" in str(ei.value)
    assert "tile-join" in str(ei.value)


def test_export_decade_csvs(spark, tmp_path):
    from map_v2_etl_spark.plans.pipeline import build_wide

    src = tmp_path / "long.csv"
    src.write_text(
        "id,year,name,parent_location,population,eviction_rate,"
        "eviction_filing_rate,renter_occupied_households\n"
        "01,2000,A,US,100,1.0,2.0,40\n"
        "01,2010,A,US,120,1.5,2.5,44\n"
        "02,2010,B,US,50,0.5,0.7,20\n"
    )
    wide = build_wide(spark, str(src), "raw")
    paths = export_decade_csvs(wide, str(tmp_path), "raw")
    names = {os.path.basename(p) for p in paths}
    assert names == {
        "bubble-data-00.wide.csv", "choropleth-data-00.wide.csv",
        "bubble-data-10.wide.csv", "choropleth-data-10.wide.csv",
    }
    header = (tmp_path / "bubble-data-10.wide.csv").read_text().splitlines()[0]
    cols = header.split(",")
    assert cols[:3] == ["GEOID", "n", "pl"]
    # bubble decade slice carries ONLY bubble vars for 10-18 years
    assert "er-10" in cols and "efr-10" in cols and "tr-10" in cols
    assert not any(c.startswith(("p-", "er-0", "mgr-")) for c in cols[3:])


@pytest.mark.skipif(not HAVE_TIPPECANOE, reason="tippecanoe not installed")
def test_build_tileset_e2e(spark, tmp_path):
    """Miniature end-to-end: engine feature tables -> real MBTiles."""
    from map_v2_etl_spark.plans.pipeline import build_wide, tile_layers
    from map_v2_etl_spark.sources.geojson import write_geojsonl

    src = tmp_path / "long.csv"
    src.write_text(
        "id,year,name,parent_location,population,eviction_rate,"
        "eviction_filing_rate,renter_occupied_households\n"
        "01,2000,A,US,100,1.0,2.0,40\n"
    )
    wide = build_wide(spark, str(src), "raw")
    shapes = spark.createDataFrame(
        [("01", '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}')],
        ["GEOID", "geometry"],
    )
    layers = tile_layers(wide, shapes, "raw")
    for name, df in layers.items():
        kind = "centers" if name.startswith("bubble") else "choropleth"
        props = [c for c in df.columns if c != "geometry"]
        write_geojsonl(df, str(tmp_path / f"{kind}_dir"), props, ["GEOID"])
    for kind in ("centers", "choropleth"):
        parts = sorted((tmp_path / f"{kind}_dir").glob("part-*"))
        with open(tmp_path / f"{kind}.geojson", "w") as out:
            for p in parts:
                out.write(p.read_text())
    export_decade_csvs(wide, str(tmp_path), "raw")
    done = build_tileset("states", str(tmp_path), ["00"])
    assert (tmp_path / "build" / "states-00.mbtiles").exists()
    assert len(done) == 2 + 3


def test_upload_manifest_metadata_parity(tmp_path):
    tiles = tmp_path / "tiles"
    (tiles / "0" / "0").mkdir(parents=True)
    (tiles / "0" / "0" / "0.pbf").write_bytes(b"x")
    (tiles / "metadata.json").write_text("{}")
    (tiles / "stats.json").write_text("{}")  # must be excluded

    m = upload_manifest(
        "tracts",
        wide_csv=str(tmp_path / "w.csv"),
        extents_csv=str(tmp_path / "e.csv"),
        source_csv_gz=str(tmp_path / "tracts.csv.gz"),
        tile_dirs={"tracts-00": str(tiles)},
    )
    by_uri = {e["s3_uri"]: e for e in m}
    assert by_uri["s3://data-output/tracts.csv"]["content_type"] is None
    assert by_uri["s3://extents-output/tracts-extents.csv"]["content_type"] is None
    gz = by_uri["s3://data-input/tracts.csv.gz"]
    assert (gz["content_type"], gz["content_encoding"]) == ("text/csv", "gzip")
    pbf = by_uri["s3://tileset-output/tracts-00/0/0/0.pbf"]
    assert (pbf["content_type"], pbf["content_encoding"]) == (
        "application/x-protobuf", "gzip",
    )
    meta = by_uri["s3://tileset-output/tracts-00/metadata.json"]
    assert (meta["content_type"], meta["content_encoding"]) == (
        "application/json", None,
    )
    assert not any(u.endswith("stats.json") for u in by_uri)

    cli = manifest_to_aws_cli(m)
    assert any(
        "--content-type application/x-protobuf --content-encoding gzip" in c
        for c in cli
    )


def test_s3_roundtrip_against_object_store(spark, tmp_path):
    """S1/S7 round-trip at the achievable boundary: build wide + extents
    CSVs with the real pipeline, EXECUTE the upload manifest against an
    object store (boto3-shaped client — the LocalObjectStore fake here,
    a real boto3 client in deployment), then fetch the objects back and
    verify bytes and object metadata survive."""
    import gzip as gz_mod
    import io

    from map_v2_etl_spark.plans.pipeline import build_wide
    from map_v2_etl_spark.plans.tileset import (
        LocalObjectStore,
        execute_manifest,
    )
    from map_v2_etl_spark.sources.csv_io import write_sorted_csv

    src = tmp_path / "long.csv"
    src.write_text(
        "id,year,name,parent_location,population,eviction_rate,"
        "eviction_filing_rate,renter_occupied_households\n"
        "01,2000,A,US,100,1.0,2.0,40\n"
        "01,2010,A,US,120,1.5,2.5,44\n"
        "02,2010,B,US,50,0.5,0.7,20\n"
    )
    wide = build_wide(spark, str(src), "raw")
    wide_csv = str(tmp_path / "tracts.csv")
    write_sorted_csv(wide, wide_csv, ["GEOID"])
    extents_csv = tmp_path / "tracts-extents.csv"
    extents_csv.write_text("column,min,max\np-00,50,120\n")
    src_gz = tmp_path / "tracts-src.csv.gz"
    with gz_mod.open(src_gz, "wt") as fh:
        fh.write(src.read_text())

    m = upload_manifest(
        "tracts",
        wide_csv=wide_csv,
        extents_csv=str(extents_csv),
        source_csv_gz=str(src_gz),
    )
    store = LocalObjectStore(str(tmp_path / "s3"))
    assert execute_manifest(m, store) == 3

    # fetch side (S1): bytes round-trip exactly
    got = store.get_object(Bucket="data-output", Key="tracts.csv")
    body = got["Body"].read()
    assert body == open(wide_csv, "rb").read()
    # and the fetched CSV re-enters the engine identically
    back = tmp_path / "back.csv"
    back.write_bytes(body)
    df2 = spark.read.option("header", True).csv(str(back))
    assert df2.count() == wide.count()
    assert df2.columns == wide.columns

    # metadata parity (deploy-source.sh:38-45)
    gz_obj = store.get_object(Bucket="data-input", Key="tracts-src.csv.gz")
    assert (gz_obj["ContentType"], gz_obj["ContentEncoding"]) == (
        "text/csv", "gzip",
    )
    with gz_mod.open(io.BytesIO(gz_obj["Body"].read()), "rt") as fh:
        assert fh.read() == src.read_text()
    assert store.list_objects(Bucket="extents-output") == [
        "tracts-extents.csv"
    ]


def test_choropleth_opts_full_reference_parity():
    """Every region class's options match build.sh:125-129,146-152
    token for token (the old table silently dropped states'
    --detect-shared-borders and most of counties' flags; only tracts
    was test-covered)."""
    from map_v2_etl_spark.plans.tileset import BUBBLE_OPTS, CHOROPLETH_OPTS

    assert CHOROPLETH_OPTS["states"] == [
        "--maximum-zoom=6", "--simplification=10",
        "--detect-shared-borders",
    ]
    assert CHOROPLETH_OPTS["counties"] == [
        "--maximum-zoom=7", "--minimum-zoom=1",
        "--coalesce-smallest-as-needed", "--extend-zooms-if-still-dropping",
        "--simplification=10", "--detect-shared-borders",
    ]
    assert BUBBLE_OPTS["states"] == ["--maximum-zoom=6", "--base-zoom=1"]
    assert BUBBLE_OPTS["counties"] == ["--maximum-zoom=7", "--base-zoom=2"]


def test_build_tileset_native_guards(spark, tmp_path):
    import pytest

    from map_v2_etl_spark.plans.tileset import build_tileset_native

    feats = spark.createDataFrame(
        [("01", '{"type":"Point","coordinates":[-86.5,32.6]}')],
        "GEOID STRING, geometry STRING",
    )
    with pytest.raises(ValueError, match="layers is empty"):
        build_tileset_native({}, str(tmp_path / "x.mbtiles"), "x", zoom=5)
    with pytest.raises(ValueError, match="must be passed together"):
        build_tileset_native(
            {"l": feats}, str(tmp_path / "x.mbtiles"), "x", zoom=5,
            max_per_tile=10,
        )
    with pytest.raises(ValueError, match="ambiguous tileset target"):
        build_tileset_native(
            {"l": feats}, str(tmp_path / "x.mbtile"), "x", zoom=5
        )


def test_build_tileset_native_per_layer_zooms_and_field_types(spark, tmp_path):
    """layer_zooms serves bubble tiles below the choropleth floor (the
    reference's merged-tileset shape) and metadata reports real field
    types."""
    import json as _json
    import sqlite3 as _sql

    from map_v2_etl_spark.plans.tileset import build_tileset_native

    sq = ('{"type":"Polygon","coordinates":[[[-86.9,32.5],[-86.7,32.5],'
          '[-86.7,32.7],[-86.9,32.7],[-86.9,32.5]]]}')
    pt = '{"type":"Point","coordinates":[-86.8,32.6]}'
    bubble = spark.createDataFrame(
        [("01", 42.5, pt)], "GEOID STRING, rate DOUBLE, geometry STRING"
    )
    choro = spark.createDataFrame(
        [("01", 100, sq)], "GEOID STRING, pop LONG, geometry STRING"
    )
    mb = str(tmp_path / "t.mbtiles")
    n = build_tileset_native(
        {"bubble": bubble, "choro": choro}, mb, "t", zoom=3,
        layer_zooms={"bubble": (0, 3), "choro": (2, 3)},
    )
    assert n > 0
    con = _sql.connect(mb)
    zs = {
        z: set()
        for z in range(4)
    }
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert meta["minzoom"] == "0" and meta["maxzoom"] == "3"
    for (z,) in con.execute("SELECT DISTINCT zoom_level FROM tiles"):
        zs.setdefault(z, set())
    # bubble-only tiles exist below the choropleth floor
    rows = list(con.execute("SELECT zoom_level FROM tiles"))
    con.close()
    seen_z = {z for (z,) in rows}
    assert {0, 1} <= seen_z
    vl = {v["id"]: v["fields"]
          for v in _json.loads(meta["json"])["vector_layers"]}
    assert vl["bubble"]["rate"] == "Number"
    assert vl["choro"]["pop"] == "Number"
    assert vl["choro"]["GEOID"] == "String"


def test_upload_manifest_skips_tmp_orphans(tmp_path):
    from map_v2_etl_spark.plans.tileset import upload_manifest

    d = tmp_path / "tiles"
    (d / "3" / "2").mkdir(parents=True)
    (d / "3" / "2" / "1.pbf").write_bytes(b"x")
    (d / "3" / "2" / "1.pbf.tmp-999").write_bytes(b"partial")
    (d / "metadata.json").write_text("{}")
    (d / "stray.json").write_text("{}")
    m = upload_manifest("states", tile_dirs={"states-00": str(d)})
    keys = sorted(e["s3_uri"].rsplit("/", 1)[-1] for e in m)
    assert keys == ["1.pbf", "metadata.json"]


def _mbtiles_feature_digest(path, only_zoom=None):
    """{(z, x, y, layer): {(id, geom_type, props_frozenset, winding)}}
    from an mbtiles file — the encoder-independent comparison key.
    Coordinates are NOT compared (quantization/simplification differ
    legitimately between encoders); winding is the SIGN of the shoelace
    area of the first ring, the MVT-spec-mandated orientation."""
    import gzip as _gzip
    import sqlite3 as _sql

    from map_v2_etl_spark.sources.mvt import decode_tile

    def _ring_winding(geom):
        # geom: [{'cmd': 'move'|'line'|'close', 'points': [(x,y)...]}]
        # with absolute coords; first ring's points -> sign of 2*area
        pts = []
        for seg in geom:
            if seg["cmd"] in ("move", "line"):
                pts.extend(seg["points"])
            elif seg["cmd"] == "close" and len(pts) >= 3:
                break  # first ring done
        if len(pts) < 3:
            return 0
        s = 0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
            s += x1 * y2 - x2 * y1
        return (s > 0) - (s < 0)

    out = {}
    con = _sql.connect(path)
    try:
        for z, col, row, blob in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        ):
            if only_zoom is not None and z != only_zoom:
                continue
            y = (1 << z) - 1 - row  # TMS -> XYZ
            raw = bytes(blob)
            if raw[:2] == b"\x1f\x8b":
                raw = _gzip.decompress(raw)
            for lyr in decode_tile(raw):
                keys, vals = lyr["keys"], lyr["values"]
                feats = set()
                for f in lyr["features"]:
                    props = frozenset(
                        (keys[f["tags"][i]], vals[f["tags"][i + 1]])
                        for i in range(0, len(f["tags"]), 2)
                    )
                    w = (
                        _ring_winding(f["geometry"])
                        if f["type"] == 3
                        else 0
                    )
                    feats.add((f["id"], f["type"], props, w))
                out[(z, col, y, lyr["name"])] = feats
    finally:
        con.close()
    return out


@pytest.mark.skipif(not HAVE_TIPPECANOE, reason="tippecanoe not installed")
def test_native_tiles_match_tippecanoe(spark, tmp_path):
    """Differential parity: the native MVT encoder vs REAL tippecanoe on
    the same miniature layer, decoded by the same reader and compared
    per (z, x, y, layer) on feature ids, geometry types, property sets,
    and exterior-ring winding (build.sh:129-134,155-160 flag shape).

    Comparison is at MAXZOOM only: below it tippecanoe simplifies and
    density-drops by design, so coordinate-level parity is not a spec
    property; at maxzoom both encoders quantize the same 4096 extent
    and must agree on the feature-set digest."""
    import json as _json
    import subprocess

    from map_v2_etl_spark.plans.tileset import build_tileset_native

    Z = 3
    sq1 = ('{"type":"Polygon","coordinates":[[[-86.9,32.5],[-86.7,32.5],'
           '[-86.7,32.7],[-86.9,32.7],[-86.9,32.5]]]}')
    sq2 = ('{"type":"Polygon","coordinates":[[[-80.2,25.7],[-80.0,25.7],'
           '[-80.0,25.9],[-80.2,25.9],[-80.2,25.7]]]}')
    rows = [("01", 1, 42.5, sq1), ("12", 12, 7.25, sq2)]
    feats = spark.createDataFrame(
        rows, "GEOID STRING, id LONG, rate DOUBLE, geometry STRING"
    )

    # engine side
    native_mb = str(tmp_path / "native.mbtiles")
    build_tileset_native(
        {"parity": feats}, native_mb, "parity", zoom=Z, id_col="id"
    )

    # tippecanoe side: same layer name, same zoom pinned min=max so the
    # only tiles are the comparison tiles; flags mirror the recipe's
    # base-tileset shape minus density/simplification knobs (disabled by
    # pinning zoom), which are not feature-set-preserving by design
    gj = tmp_path / "parity.geojson"
    with open(gj, "w") as fh:
        for geoid, fid, rate, geom in rows:
            fh.write(_json.dumps({
                "type": "Feature",
                "properties": {"GEOID": geoid, "id": fid, "rate": rate},
                "geometry": _json.loads(geom),
            }) + "\n")
    tc_mb = str(tmp_path / "tc.mbtiles")
    subprocess.run(
        ["tippecanoe", "-o", tc_mb, "-f",
         "-L", f"parity:{gj}",
         "--read-parallel",
         f"--minimum-zoom={Z}", f"--maximum-zoom={Z}",
         "--attribute-type=GEOID:string", "--use-attribute-for-id=id",
         "--empty-csv-columns-are-null"],
        check=True, capture_output=True,
    )

    def _drop_id_prop(digest):
        # --use-attribute-for-id promotes the id attribute to the
        # feature id; tippecanoe versions differ on whether the
        # property column also survives, so compare everything BUT it
        return {
            k: {
                (fid, gt, frozenset(p for p in props if p[0] != "id"), w)
                for fid, gt, props, w in feats
            }
            for k, feats in digest.items()
        }

    ours = _drop_id_prop(_mbtiles_feature_digest(native_mb, only_zoom=Z))
    theirs = _drop_id_prop(_mbtiles_feature_digest(tc_mb, only_zoom=Z))
    assert set(ours) == set(theirs), (
        f"tile addressing diverges: ours-only={set(ours) - set(theirs)} "
        f"tc-only={set(theirs) - set(ours)}"
    )
    for key in ours:
        assert ours[key] == theirs[key], (
            f"feature digest diverges at {key}:\n"
            f"  ours={ours[key]}\n  tc  ={theirs[key]}"
        )
