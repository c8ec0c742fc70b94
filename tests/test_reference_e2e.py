"""The reference's WHOLE build.sh arc (lines 69-233) in one flow:

  S3 fetch (gz long CSV)          build.sh:75-76   (S1/S2)
  -> shape to wide + sorted CSV   build.sh:80-82   (A1/A6/S5)
  -> extents CSV                  build.sh:85-89   (A2-A4)
  -> centers + choropleth layers  build.sh:110-160 (G1/J1/F7)
  -> per-decade merged tilesets   build.sh:163-216 (P3/J2/S8)
  -> tile directory               build.sh:219-221 (S9)
  -> deploy manifest to S3        build.sh:222-230 (S7)

Every stage's output is asserted against hand-computed goldens, and the
deployed objects are pulled BACK from the (moto) store and decoded, so
the test certifies the arc a reference user actually runs, not the
stages in isolation.
"""

from __future__ import annotations

import csv
import gzip
import json
import os

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from map_v2_etl_spark.plans.pipeline import (  # noqa: E402
    run_region,
    tile_layers,
)
from map_v2_etl_spark.plans.tileset import (  # noqa: E402
    build_tileset_native,
    execute_manifest,
    upload_manifest,
)
from map_v2_etl_spark.sources.geojson import read_geojson  # noqa: E402
from map_v2_etl_spark.sources.mvt import (  # noqa: E402
    decode_tile,
    mbtiles_to_dir,
)

LONG_HEADER = (
    "id,year,name,parent_location,population,judgement_rate,unmapped"
)
LONG_ROWS = [
    "01,2000,Alpha,Parentland,100,1.5,zz",
    "01,2010,Alpha,Parentland,150,2.5,zz",
    "02,2000,Beta,,200,3.5,zz",        # empty pl -> falsy fill
    "02,2010,Beta,,250,4.5,zz",
    "01,2000,Alpha,Parentland,999,,zz",  # duplicate (id,year): LWW
    "03,2010,Gamma,Parentland,300,5.5,zz",  # only 2010
]


def _square(lon, lat, d=0.5):
    return {
        "type": "Polygon",
        "coordinates": [
            [[lon, lat], [lon + d, lat], [lon + d, lat + d],
             [lon, lat + d], [lon, lat]]
        ],
    }


FEATURES = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "properties": {"GEOID": "01"},
         "geometry": _square(-86.9, 32.5)},
        {"type": "Feature", "properties": {"GEOID": "02"},
         "geometry": _square(-100.3, 35.7)},
        # no data row -> tile-join --if-matched keeps the bare feature
        {"type": "Feature", "properties": {"GEOID": "09"},
         "geometry": _square(-95.0, 39.0)},
    ],
}

BUCKETS = ["data-output", "extents-output", "data-input", "tileset-output"]


@pytest.fixture()
def s3():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        for b in BUCKETS:
            client.create_bucket(Bucket=b)
        yield client


def test_full_reference_arc(spark, tmp_path, s3):
    region = "states"

    # ---- stage 0: the gz source sits in S3; fetch + gunzip (S1/S2) ----
    src_gz = str(tmp_path / f"{region}.csv.gz")
    with gzip.open(src_gz, "wb") as fh:
        fh.write(("\n".join([LONG_HEADER] + LONG_ROWS) + "\n").encode())
    s3.put_object(Bucket="data-input", Key=f"{region}.csv.gz",
                  Body=open(src_gz, "rb").read())

    long_csv = str(tmp_path / "data.csv")
    body = s3.get_object(
        Bucket="data-input", Key=f"{region}.csv.gz"
    )["Body"].read()
    with open(long_csv, "wb") as fh:
        fh.write(gzip.decompress(body))

    geo = tmp_path / "shapes.geojson"
    geo.write_text(json.dumps(FEATURES))

    # ---- stage 1: shape + extents + layer exports (build.sh:80-89) ----
    out = str(tmp_path / "proc")
    outputs = run_region(
        spark, long_csv, out, "raw", geojson_path=str(geo),
        years=["2000", "2010"],
    )
    with open(outputs["wide"]) as f:
        wide_rows = list(csv.DictReader(f))
    assert [r["GEOID"] for r in wide_rows] == ["01", "02", "03"]
    by_id = {r["GEOID"]: r for r in wide_rows}
    assert by_id["01"]["p-00"] == "999.0"        # last write wins
    assert by_id["01"]["er-00"] == ""            # later blank overwrites
    assert by_id["01"]["er-10"] == "2.5"
    assert by_id["02"]["pl"] == "United States"  # falsy fill
    assert by_id["03"]["p-00"] == ""             # missing year
    assert "unmapped" not in wide_rows[0]

    with open(outputs["extents"]) as f:
        ext = {r["id"]: r for r in csv.DictReader(f)}
    assert float(ext["p-00"]["min"]) == 200.0
    assert float(ext["p-00"]["max"]) == 999.0
    assert float(ext["er-10"]["min"]) == 2.5
    assert float(ext["er-10"]["max"]) == 5.5

    # ---- stage 2: per-decade MERGED tilesets (build.sh:163-216) ----
    # layer names follow the reference: choropleth layer = $REGION,
    # bubble layer = $REGION-centers (build.sh:131,158); the per-decade
    # variable slices come from tile_layers (csvcut equivalents)
    wide_df = spark.read.csv(
        outputs["wide"], header=True, inferSchema=False
    )
    shapes = read_geojson(spark, str(geo), ["GEOID"])
    layers = tile_layers(wide_df, shapes, "raw")
    tile_dirs: dict[str, str] = {}
    for dec in ("00", "10"):
        merged = {
            region: layers[f"choropleth/{dec}-{'09' if dec == '00' else '18'}"],
            f"{region}-centers": layers[f"bubble/{dec}-{'09' if dec == '00' else '18'}"],
        }
        mb = str(tmp_path / f"{region}-{dec}.mbtiles")
        n = build_tileset_native(merged, mb, f"{region}-{dec}", zoom=6,
                                 id_col="id")
        assert n > 0
        # build.sh:219-221: tileset -> directory for deploy
        d = str(tmp_path / f"{region}-{dec}")
        assert mbtiles_to_dir(mb, d) == n
        tile_dirs[f"{region}-{dec}"] = d

    # decode one deployed-decade tile: both layers, reference naming,
    # LWW + decade-sliced properties, numeric feature ids (F7)
    tdir = tile_dirs[f"{region}-00"]
    pbfs = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tdir) for f in fs if f.endswith(".pbf")
    ]
    assert pbfs
    seen_layers: set[str] = set()
    feat_01 = None
    for p in pbfs:
        for lyr in decode_tile(gzip.decompress(open(p, "rb").read())):
            seen_layers.add(lyr["name"])
            if lyr["name"] == region:
                kv = dict(zip(lyr["keys"], lyr["values"]))
                for f in lyr["features"]:
                    props = {
                        lyr["keys"][f["tags"][i]]:
                            lyr["values"][f["tags"][i + 1]]
                        for i in range(0, len(f["tags"]), 2)
                    }
                    if props.get("GEOID") == "01":
                        feat_01 = (f, props)
    assert seen_layers == {region, f"{region}-centers"}
    assert feat_01 is not None
    f01, props01 = feat_01
    assert f01["id"] == 1                      # id = Number(GEOID)
    assert props01["p-00"] == "999.0"          # decade-00 slice, LWW
    assert "p-10" not in props01               # other decade excluded
    assert "er-00" not in props01              # blank -> null -> no tag

    # ---- stage 3: deploy manifest -> S3 (build.sh:91-97,222-230) ----
    m = upload_manifest(
        region,
        wide_csv=outputs["wide"],
        extents_csv=outputs["extents"],
        source_csv_gz=src_gz,
        tile_dirs=tile_dirs,
    )
    n_obj = execute_manifest(m, s3)
    # independent expected count: 3 CSV artifacts + every .pbf walked
    # on disk + one metadata.json per tileset (NOT len(m) — that would
    # be a tautology blind to manifest under-collection)
    n_pbf = sum(
        1
        for d in tile_dirs.values()
        for dp, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".pbf")
    )
    assert n_obj == 3 + n_pbf + len(tile_dirs)

    # wide + extents land byte-identical at the reference's keys
    got_wide = s3.get_object(
        Bucket="data-output", Key=f"{region}.csv"
    )["Body"].read()
    assert got_wide == open(outputs["wide"], "rb").read()
    got_ext = s3.get_object(
        Bucket="extents-output", Key=f"{region}-extents.csv"
    )["Body"].read()
    assert got_ext == open(outputs["extents"], "rb").read()

    # tiles land under {region}-{decade}/z/x/y.pbf with the tippecanoe
    # deploy metadata (content-type protobuf, content-encoding gzip)
    keys = [
        o["Key"]
        for o in s3.list_objects_v2(
            Bucket="tileset-output", Prefix=f"{region}-00/"
        )["Contents"]
    ]
    pbf_keys = [k for k in keys if k.endswith(".pbf")]
    assert pbf_keys and f"{region}-00/metadata.json" in keys
    head = s3.head_object(Bucket="tileset-output", Key=pbf_keys[0])
    assert head["ContentType"] == "application/x-protobuf"
    assert head["ContentEncoding"] == "gzip"
    meta_obj = s3.get_object(
        Bucket="tileset-output", Key=f"{region}-00/metadata.json"
    )
    meta = json.loads(meta_obj["Body"].read())
    assert meta["format"] == "pbf"
    assert json.loads(meta["json"])["vector_layers"]
    # and a deployed tile decodes back to the same layers
    tile_back = s3.get_object(
        Bucket="tileset-output", Key=pbf_keys[0]
    )["Body"].read()
    assert {
        lyr["name"] for lyr in decode_tile(gzip.decompress(tile_back))
    } <= {region, f"{region}-centers"}
