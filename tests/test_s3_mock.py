"""Mock-S3 integration: the deploy round trip against a real (moto)
object store — the r2/r3 carried task.

The reference's deploy surface is `aws s3 cp` uploads of the wide CSV,
extents CSV, and gzipped source CSVs (reference build.sh:95-97,
deploy-source.sh:38-45). Our boundary is `upload_manifest` (the
declarative plan with the reference's object-metadata decisions) +
`execute_manifest` (anything boto3-shaped). These tests run that exact
code against moto's in-memory S3 via a genuine boto3 client — same
wire-level call shape a production deploy makes — then pull the objects
BACK and feed them through the engine's CSV source, closing the
S1 (fetch source) / S7 (sink + manifest) loop end to end.

Env-gated: skipped cleanly where moto/boto3 are absent.
"""

from __future__ import annotations

import gzip
import os

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from map_v2_etl_spark.plans.tileset import (  # noqa: E402
    execute_manifest,
    upload_manifest,
)
from map_v2_etl_spark.sources.csv_io import (  # noqa: E402
    read_long_csv,
    write_sorted_csv,
)

BUCKETS = ["data-output", "extents-output", "data-input", "tileset-output"]


@pytest.fixture()
def s3():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        for b in BUCKETS:
            client.create_bucket(Bucket=b)
        yield client


def _small_wide(spark):
    return spark.createDataFrame(
        [("01001", "Autauga", 1.5, 2.5), ("01003", "Baldwin", 3.5, None)],
        "GEOID STRING, name STRING, `er-00` DOUBLE, `er-01` DOUBLE",
    )


def test_deploy_round_trip_via_moto(spark, tmp_path, s3):
    # 1. engine writes the single-file deploy artifacts (S5 sink)
    wide_csv = str(tmp_path / "states.csv")
    write_sorted_csv(_small_wide(spark), wide_csv, ["GEOID"])
    extents_csv = str(tmp_path / "states-extents.csv")
    write_sorted_csv(
        spark.createDataFrame(
            [("er-00", 1.5, 3.5)], "col STRING, min DOUBLE, max DOUBLE"
        ),
        extents_csv,
        ["col"],
    )
    src_gz = str(tmp_path / "states.csv.gz")
    with gzip.open(src_gz, "wb") as fh:
        fh.write(b"GEOID,e-00\n01001,7\n01003,9\n")

    # 2. manifest + execute against the mocked store
    m = upload_manifest(
        "states",
        wide_csv=wide_csv,
        extents_csv=extents_csv,
        source_csv_gz=src_gz,
    )
    assert execute_manifest(m, s3) == 3

    # 3. objects exist with the reference's metadata decisions
    wide_obj = s3.get_object(Bucket="data-output", Key="states.csv")
    with open(wide_csv, "rb") as fh:
        assert wide_obj["Body"].read() == fh.read()
    ext_obj = s3.get_object(
        Bucket="extents-output", Key="states-extents.csv"
    )
    assert ext_obj["Body"].read().startswith(b"col,min,max")
    gz_head = s3.head_object(Bucket="data-input", Key="states.csv.gz")
    assert gz_head["ContentType"] == "text/csv"
    assert gz_head["ContentEncoding"] == "gzip"

    # 4. S1 fetch source: pull the gzipped source back down and run it
    # through the engine's CSV scan (fetch + transparent gunzip — the
    # reference's aws-cp + gunzip staging, build.sh:75-76)
    fetched = str(tmp_path / "fetched.csv.gz")
    body = s3.get_object(Bucket="data-input", Key="states.csv.gz")["Body"]
    with open(fetched, "wb") as fh:
        fh.write(body.read())
    schema = T.StructType(
        [
            T.StructField("GEOID", T.StringType()),
            T.StructField("e-00", T.DoubleType()),
        ]
    )
    df = read_long_csv(spark, fetched, schema)
    rows = {r["GEOID"]: r["e-00"] for r in df.collect()}
    assert rows == {"01001": 7.0, "01003": 9.0}


def test_tile_pyramid_upload_via_moto(spark, tmp_path, s3):
    # pbf + metadata.json land with tippecanoe-deploy metadata; stray
    # json is excluded (reference build.sh:222-227)
    tiles = tmp_path / "tiles"
    (tiles / "4" / "3").mkdir(parents=True)
    (tiles / "4" / "3" / "2.pbf").write_bytes(b"\x1f\x8bfakepbf")
    (tiles / "metadata.json").write_text('{"name": "states-00"}')
    (tiles / "stats.json").write_text("{}")

    m = upload_manifest("states", tile_dirs={"states-00": str(tiles)})
    assert execute_manifest(m, s3) == 2

    pbf = s3.head_object(
        Bucket="tileset-output", Key="states-00/4/3/2.pbf"
    )
    assert pbf["ContentType"] == "application/x-protobuf"
    assert pbf["ContentEncoding"] == "gzip"
    meta = s3.get_object(
        Bucket="tileset-output", Key="states-00/metadata.json"
    )
    assert meta["ContentType"] == "application/json"
    assert b"states-00" in meta["Body"].read()
    listed = s3.list_objects_v2(Bucket="tileset-output")
    keys = {o["Key"] for o in listed.get("Contents", [])}
    assert keys == {"states-00/4/3/2.pbf", "states-00/metadata.json"}


# --------------------------------------------------------------------------
# executor-side object-store tile upload (write_tile_objects)
# --------------------------------------------------------------------------

def test_write_tile_objects_distributed_upload(spark, tmp_path):
    """write_tile_objects PUTs tiles from EXECUTOR partitions (not the
    driver), so it must work against a real wire-level S3 endpoint
    reachable from worker processes — moto's in-process mock can't see
    them. ThreadedMotoServer provides that endpoint; the uploaded
    objects must be byte-identical to write_tile_dir's files with the
    reference's deploy metadata (build.sh:222-227)."""
    import json as _json

    from moto.server import ThreadedMotoServer

    from map_v2_etl_spark.sources.mvt import (
        decode_tile,
        encode_pyramid,
        write_tile_dir,
        write_tile_objects,
    )

    server = ThreadedMotoServer(port=0)
    server.start()
    try:
        host, port = server._server.server_address
        url = f"http://127.0.0.1:{port}"

        def factory():
            # a CLOSURE, not a test-module function: executors cannot
            # import test modules, but cloudpickle ships closures by
            # value (boto3 imported worker-side)
            import boto3 as _b

            return _b.client(
                "s3",
                endpoint_url=url,
                region_name="us-east-1",
                aws_access_key_id="testing",
                aws_secret_access_key="testing",
            )
        factory().create_bucket(Bucket="tileset-output")

        rows = [
            (f"{i:03d}",
             _json.dumps({"type": "Point",
                          "coordinates": [-120.0 + i * 2.3,
                                          25.0 + (i * 7) % 30]}),
             "pts")
            for i in range(25)
        ]
        feats = spark.createDataFrame(
            rows, "GEOID STRING, geometry STRING, layer STRING"
        ).repartition(5)
        tiles = encode_pyramid(feats, 2, 4, id_col="GEOID")
        fields = {"pts": {"GEOID": "String"}}

        n = write_tile_objects(
            tiles, "tileset-output", "states-00", "states-00", 2, 4,
            layer_fields=fields, client_factory=factory,
        )
        assert n > 4

        # mirror to a local dir: keys and bytes must match exactly
        d = str(tmp_path / "dir")
        assert write_tile_dir(
            tiles, d, "states-00", 2, 4, layer_fields=fields
        ) == n

        client = factory()
        keys = []
        token = {}
        while True:
            resp = client.list_objects_v2(
                Bucket="tileset-output", Prefix="states-00/", **token
            )
            keys += [o["Key"] for o in resp.get("Contents", [])]
            if not resp.get("IsTruncated"):
                break
            token = {"ContinuationToken": resp["NextContinuationToken"]}
        assert len(keys) == n + 1  # tiles + metadata.json

        local = {}
        for dirpath, _, files in os.walk(d):
            for f in files:
                p = os.path.join(dirpath, f)
                local[os.path.relpath(p, d)] = open(p, "rb").read()
        for k in keys:
            rel = k[len("states-00/"):]
            obj = client.get_object(Bucket="tileset-output", Key=k)
            body = obj["Body"].read()
            assert body == local[rel], rel
            if k.endswith(".pbf"):
                assert obj["ContentType"] == "application/x-protobuf"
                assert obj["ContentEncoding"] == "gzip"
                assert decode_tile(gzip.decompress(body)) is not None
            else:
                assert obj["ContentType"] == "application/json"
                assert _json.loads(body)["format"] == "pbf"
    finally:
        server.stop()
