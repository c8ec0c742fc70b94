"""Tileset post-stage: the tippecanoe/tile-join handoff and S3 deploy
manifest (SURVEY.md §2.1 S8/S9, §7.5).

The engine's boundary is the feature table: ``run_region`` emits sorted
tile-ready GeoJSONL and per-decade CSV attribute slices. Rasterizing
those into pbf tiles is image encoding, not query processing, so it stays
out-of-engine — but the handoff must be runnable. This module generates
the EXACT command sequence the reference runs
(/root/reference/build.sh:121-233) as data (argv lists — unit-testable
without the binaries), plus a thin subprocess runner gated on tippecanoe
being installed.

Deploy parity: the reference uploads tile directories with
``--content-type application/x-protobuf --content-encoding gzip``
(excluding ``*.json``), ``metadata.json`` as ``application/json``
(/root/reference/build.sh:222-227), wide/extents CSVs plainly
(build.sh:92-97), and gzipped source CSVs as gzip-encoded text/csv
(deploy-source.sh:38-45). ``upload_manifest`` reproduces those object
-metadata decisions as a declarative manifest any uploader (aws cli,
boto3) can replay; ``manifest_to_aws_cli`` renders the aws-cli commands.

Scale posture: tile rasterization is per-region and embarrassingly
parallel — at 100 TB each region's GeoJSONL is an independent post-job
(the reference runs regions serially in one shell loop; a scheduler can
fan these argv lists out per region).
"""

from __future__ import annotations

import os
import shutil
import subprocess

# tippecanoe zoom/drop options per region size class
# (/root/reference/build.sh:124-129 bubble, :146-152 choropleth)
BUBBLE_OPTS: dict[str, list[str]] = {
    "states": ["--maximum-zoom=6", "--base-zoom=1"],
    "counties": ["--maximum-zoom=7", "--base-zoom=2"],
    "cities": [
        "--maximum-zoom=9", "--base-zoom=7",
        "--drop-densest-as-needed", "--extend-zooms-if-still-dropping",
    ],
    "tracts": [
        "--maximum-zoom=10", "--base-zoom=9",
        "--drop-densest-as-needed", "--extend-zooms-if-still-dropping",
    ],
    "block-groups": [
        "--maximum-zoom=10", "--base-zoom=10",
        "--drop-densest-as-needed", "--extend-zooms-if-still-dropping",
    ],
}

CHOROPLETH_OPTS: dict[str, list[str]] = {
    "states": [
        "--maximum-zoom=6", "--simplification=10",
        "--detect-shared-borders",
    ],
    "counties": [
        "--maximum-zoom=7", "--minimum-zoom=1",
        "--coalesce-smallest-as-needed", "--extend-zooms-if-still-dropping",
        "--simplification=10", "--detect-shared-borders",
    ],
    "cities": [
        "--maximum-zoom=9", "--minimum-zoom=2",
        "--drop-densest-as-needed", "--extend-zooms-if-still-dropping",
        "--simplification=10",
    ],
    "tracts": [
        "--maximum-zoom=10", "--minimum-zoom=7",
        "--coalesce-smallest-as-needed", "--extend-zooms-if-still-dropping",
        "--simplification=25", "--detect-shared-borders",
    ],
    "block-groups": [
        "--maximum-zoom=10", "--minimum-zoom=8",
        "--coalesce-smallest-as-needed", "--extend-zooms-if-still-dropping",
        "--simplification=25", "--detect-shared-borders",
    ],
}

# flags shared by every tile-join data join (build.sh:191,214)
_TILE_JOIN_DATA = [
    "--if-matched", "--no-tile-size-limit", "--force", "--no-tile-stats",
    "--empty-csv-columns-are-null",
]


def tippecanoe_commands(
    region: str,
    work_dir: str,
    decades: list[str],
    build_dir: str | None = None,
    output_dirs: bool = False,
) -> list[list[str]]:
    """The reference's tileset build (build.sh:121-233) as argv lists.

    Inputs expected in ``work_dir`` (all produced by the engine):
      centers.geojson        sorted bubble-center features (write_geojsonl)
      choropleth.geojson     sorted polygon features       (write_geojsonl)
      bubble-data-{dd}.wide.csv / choropleth-data-{dd}.wide.csv
                             per-decade attribute slices (export_decade_csvs)

    ``decades`` are 2-digit decade prefixes (e.g. ["00", "10"]).
    Returns the full ordered command list; run with ``build_tileset`` or
    print for a copy-pasteable recipe (``manifest_to_aws_cli`` style).
    """
    w = lambda *p: os.path.join(work_dir, *p)  # noqa: E731
    build_dir = build_dir or w("build")
    cmds: list[list[str]] = []

    # base tilesets (build.sh:131-138 bubble, :154-161 choropleth)
    cmds.append(
        ["tippecanoe", "-o", w(f"{region}-centers.mbtiles"), "-f",
         "-L", f"{region}-centers:" + w("centers.geojson"),
         "--read-parallel", *BUBBLE_OPTS[region],
         "--attribute-type=GEOID:string", "--use-attribute-for-id=id",
         "--empty-csv-columns-are-null"]
    )
    cmds.append(
        ["tippecanoe", "-o", w(f"{region}-choropleth.mbtiles"), "-f",
         "-L", f"{region}:" + w("choropleth.geojson"),
         "--read-parallel", *CHOROPLETH_OPTS[region],
         "--attribute-type=GEOID:string", "--use-attribute-for-id=id",
         "--empty-csv-columns-are-null"]
    )

    for dd in decades:
        # attribute joins (build.sh:189-191 bubble, :212-214 choropleth)
        cmds.append(
            ["tile-join", "-l", f"{region}-centers", *_TILE_JOIN_DATA,
             "-o", w(f"{region}-centers-data-{dd}.mbtiles"),
             "-c", w(f"bubble-data-{dd}.wide.csv"),
             w(f"{region}-centers.mbtiles")]
        )
        cmds.append(
            ["tile-join", "-l", region, *_TILE_JOIN_DATA,
             "-o", w(f"{region}-choropleth-data-{dd}.mbtiles"),
             "-c", w(f"choropleth-data-{dd}.wide.csv"),
             w(f"{region}-choropleth.mbtiles")]
        )
        # merge bubble+choropleth (build.sh:218)
        cmds.append(
            ["tile-join", "--no-tile-size-limit", "--force",
             "-o", os.path.join(build_dir, f"{region}-{dd}.mbtiles"),
             w(f"{region}-choropleth-data-{dd}.mbtiles"),
             w(f"{region}-centers-data-{dd}.mbtiles")]
        )
        if output_dirs:  # S9: mbtiles -> tile directory (build.sh:221-223)
            cmds.append(
                ["tile-join", "--no-tile-size-limit",
                 f"--output-to-directory={w(f'{region}-{dd}')}",
                 os.path.join(build_dir, f"{region}-{dd}.mbtiles")]
            )
    return cmds


def export_decade_csvs(
    wide, work_dir: str, dataset_type: str = "raw",
    decades: dict[str, list[str]] | None = None,
) -> list[str]:
    """The per-decade ``csvcut`` slices tile-join consumes
    (build.sh:177-188,200-213) — written by the engine as sorted
    single-file CSVs. Column pruning happens in the plan, so each slice
    scans only its columns."""
    from ..schemas import BUBBLE_VARS, CHOROPLETH_VARS, DECADES
    from ..sources.csv_io import write_sorted_csv
    from .pipeline import decade_fields

    decades = decades or DECADES
    out = []
    for dec_name, yys in decades.items():
        dd = dec_name[:2]  # "${DECADE:0:2}" (build.sh:188)
        for kind, variables in (
            ("bubble", BUBBLE_VARS[dataset_type]),
            ("choropleth", CHOROPLETH_VARS[dataset_type]),
        ):
            fields = decade_fields(wide.columns, variables, yys)
            path = os.path.join(work_dir, f"{kind}-data-{dd}.wide.csv")
            write_sorted_csv(wide.select(*fields), path, ["GEOID"])
            out.append(path)
    return out


def build_tileset(
    region: str, work_dir: str, decades: list[str],
    build_dir: str | None = None, output_dirs: bool = False,
) -> list[str]:
    """Run the handoff. Requires tippecanoe + tile-join on PATH; raises
    RuntimeError with the full recipe otherwise so the commands are never
    lost — a user without the binaries here can replay them where they
    are installed."""
    import shlex

    build_dir = build_dir or os.path.join(work_dir, "build")
    cmds = tippecanoe_commands(region, work_dir, decades, build_dir, output_dirs)
    missing = [b for b in {"tippecanoe", "tile-join"} if not shutil.which(b)]
    if missing:
        # shlex.quote: the recipe is advertised as copy-pasteable, and
        # unquoted paths with spaces would split mid-path
        recipe = "\n".join(" ".join(shlex.quote(a) for a in c) for c in cmds)
        raise RuntimeError(
            f"{'/'.join(sorted(missing))} not installed; run these where "
            f"they are:\n{recipe}"
        )
    os.makedirs(build_dir, exist_ok=True)
    done = []
    for cmd in cmds:
        for arg in cmd:
            # tile-join --output-to-directory refuses an existing target
            # (no --force in the reference argv, which rm -rf's instead,
            # build.sh:229) — clear it here so reruns work and stale
            # tiles from a previous build are never served
            if arg.startswith("--output-to-directory="):
                shutil.rmtree(
                    arg.split("=", 1)[1], ignore_errors=True
                )
        subprocess.run(cmd, check=True)
        done.append(" ".join(cmd))
    return done


#: native-path zoom ranges per region size class — the min/max zooms of
#: the reference's tippecanoe options above (BUBBLE_OPTS base-zoom is a
#: tile-generation detail, not a pyramid bound)
NATIVE_ZOOMS: dict[str, tuple[int, int]] = {
    "states": (0, 6),
    "counties": (0, 7),
    "cities": (2, 9),
    "tracts": (7, 10),
    "block-groups": (8, 10),
}


def build_tileset_native(
    layers: dict[str, "DataFrame"],
    out_path: str,
    name: str,
    zoom: int | None = None,
    id_col: str | None = None,
    region: str | None = None,
    max_per_tile: int | None = None,
    weight_col: str | None = None,
    layer_zooms: dict[str, tuple[int, int]] | None = None,
) -> int:
    """tippecanoe-free tileset build: the engine's own MVT encoder +
    SQLite writer (sources/mvt.py — hand-encoded protobuf, verified by
    an independent decoder in tests/test_mvt.py).

    ``layers`` maps layer name -> features DataFrame (geometry +
    property columns). Zoom range comes from ``zoom`` (single level) or
    ``region`` (the reference's per-region-class range, NATIVE_ZOOMS —
    build.sh:124-129,146-152); ``layer_zooms`` overrides the range PER
    LAYER (e.g. bubble layers from z0 while choropleth starts at the
    class minimum — the reference's merged tileset serves bubble tiles
    below the choropleth floor because tippecanoe's default minzoom is
    0 for the bubble build). With ``max_per_tile``+``weight_col`` (BOTH
    required — one without the other is an error, not a silent no-op)
    the dense-tile drop rule (tippecanoe --drop-densest-as-needed)
    applies per zoom. Tile assignment and per-tile pbf encoding run DISTRIBUTED
    (groupBy(z,x,y) + applyInPandas). An ``out_path`` ending in
    ``.mbtiles`` collects only the finished blobs into the single-file
    SQLite artifact (output-bounded, same posture as
    csv_io.write_sorted_csv); ANY OTHER path is treated as a tile
    DIRECTORY and written fully distributed (write_tile_dir — each
    executor writes its own z/x/y.pbf files, no driver collect), the
    reference's served layout (build.sh:220-223). Use this where
    tippecanoe is unavailable or a pure-engine pipeline is preferred;
    ``build_tileset`` remains the binary-parity path. Returns the tile
    count."""
    from pyspark.sql import functions as F

    from ..sources.mvt import (
        encode_pyramid,
        encode_tiles,
        write_mbtiles,
        write_tile_dir,
    )

    if (zoom is None) == (region is None):
        raise ValueError("pass exactly one of zoom= or region=")
    if not layers:
        raise ValueError("layers is empty: nothing to encode")
    if (max_per_tile is None) != (weight_col is None):
        # one without the other silently skipped the drop rule before
        raise ValueError(
            "max_per_tile and weight_col must be passed together "
            f"(got max_per_tile={max_per_tile}, weight_col={weight_col})"
        )
    minz, maxz = (zoom, zoom) if zoom is not None else NATIVE_ZOOMS[region]

    def encode(df, lo, hi):
        if lo == hi and max_per_tile is None:
            return encode_tiles(df, lo, id_col=id_col)
        return encode_pyramid(
            df, lo, hi, id_col=id_col,
            max_per_tile=max_per_tile, weight_col=weight_col,
        )

    if layer_zooms:
        # each layer encodes over its own range; a (z,x,y) covered by
        # several layers then has one blob PER LAYER — an MVT tile is a
        # concatenation of Layer submessages, so merge them in sorted
        # layer order (deterministic bytes) into the one-blob-per-tile
        # shape the sinks require
        tiles = None
        los, his = [], []
        for lord, (lname, df) in enumerate(sorted(layers.items())):
            lo, hi = layer_zooms.get(lname, (minz, maxz))
            los.append(lo)
            his.append(hi)
            t = encode(df.withColumn("layer", F.lit(lname)), lo, hi)
            t = t.withColumn("_lord", F.lit(lord))
            tiles = t if tiles is None else tiles.unionByName(t)
        tiles = (
            tiles.groupBy("z", "x", "y")
            .agg(
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("_lord", "pbf"))
                        ),
                        lambda s: s["pbf"],
                    ),
                    F.lit(b""),
                    lambda acc, x: F.concat(acc, x),
                ).alias("pbf")
            )
            .select("z", "x", "y", "pbf")
        )
        minz, maxz = min(los), max(his)
    else:
        tagged = None
        for lname, df in sorted(layers.items()):
            cur = df.withColumn("layer", F.lit(lname))
            tagged = (
                cur
                if tagged is None
                else tagged.unionByName(cur, allowMissingColumns=True)
            )
        tiles = encode(tagged, minz, maxz)

    def field_type(dt) -> str:
        # tippecanoe metadata types: Number/Boolean/String — report the
        # column's real dtype instead of blanket String, so
        # metadata-driven clients (style validators, inspectors) agree
        # with the Number/Boolean values the encoder actually emits
        from pyspark.sql import types as T

        if isinstance(dt, T.BooleanType):
            return "Boolean"
        if isinstance(dt, T.NumericType):
            return "Number"
        return "String"

    fields = {
        lname: {
            f.name: field_type(f.dataType)
            for f in df.schema.fields
            if f.name not in ("geometry",)
        }
        for lname, df in layers.items()
    }
    low = out_path.lower()
    if low.endswith(".mbtiles"):
        sink = write_mbtiles
    elif low.endswith((".mbtile", ".sqlite", ".db")):
        # a near-miss suffix almost certainly wanted the SQLite sink —
        # silently writing a directory TREE at that name strands the
        # error at the consumer's sqlite3.connect instead of here
        raise ValueError(
            f"ambiguous tileset target {out_path!r}: use '.mbtiles' for "
            "the single-file artifact or an extension-less directory"
        )
    else:
        sink = write_tile_dir
    return sink(
        tiles, out_path, name, minzoom=minz, maxzoom=maxz,
        layer_fields=fields,
    )


# --------------------------------------------------------------------------
# deploy manifest (S7 metadata parity)
# --------------------------------------------------------------------------

def upload_manifest(
    region: str,
    *,
    wide_csv: str | None = None,
    extents_csv: str | None = None,
    source_csv_gz: str | None = None,
    tile_dirs: dict[str, str] | None = None,
    data_output: str = "data-output",
    extents_output: str = "extents-output",
    data_input: str = "data-input",
    tileset_output: str = "tileset-output",
) -> list[dict]:
    """Declarative S3 upload plan with the reference's object metadata.

    One dict per object: {local, s3_uri, content_type, content_encoding}
    (None means "let the store default", matching a plain ``aws s3 cp``).

      wide csv      -> s3://{data_output}/{region}.csv       (build.sh:97)
      extents csv   -> s3://{extents_output}/{region}-extents.csv (:95)
      source csv.gz -> s3://{data_input}/...  text/csv + gzip
                       (deploy-source.sh:38-45 upload semantics)
      tile dir      -> s3://{tileset_output}/{name}/...
                       *.pbf  application/x-protobuf + gzip  (:224-226)
                       metadata.json  application/json       (:227)
                       other *.json excluded                 (--exclude)
    """
    entries: list[dict] = []

    def add(local, uri, ctype=None, cenc=None):
        entries.append(
            {"local": local, "s3_uri": uri, "content_type": ctype,
             "content_encoding": cenc}
        )

    if extents_csv:
        add(extents_csv, f"s3://{extents_output}/{region}-extents.csv")
    if wide_csv:
        add(wide_csv, f"s3://{data_output}/{region}.csv")
    if source_csv_gz:
        add(
            source_csv_gz,
            f"s3://{data_input}/{os.path.basename(source_csv_gz)}",
            "text/csv", "gzip",
        )
    for name, d in (tile_dirs or {}).items():
        for root, _, files in os.walk(d):
            for f in sorted(files):
                local = os.path.join(root, f)
                rel = os.path.relpath(local, d)
                uri = f"s3://{tileset_output}/{name}/{rel}"
                if f == "metadata.json":
                    add(local, uri, "application/json")
                elif f.endswith(".pbf"):
                    add(local, uri, "application/x-protobuf", "gzip")
                # anything else (other *.json per build.sh:226's
                # --exclude, editor droppings, a crashed task's
                # *.pbf.tmp-<pid> orphan) is NOT a tile and must never
                # deploy to the served bucket
    return entries


def execute_manifest(manifest: list[dict], client) -> int:
    """Execute the upload plan against an S3 client.

    ``client`` is anything with boto3's ``put_object(Bucket=, Key=,
    Body=, ContentType=, ContentEncoding=)`` — a real boto3 client, a
    moto/minio mock, or the ``LocalObjectStore`` fake below.
    tests/test_s3_mock.py runs this function against moto's S3 via a
    genuine boto3 client (upload, metadata assertions, fetch-back
    through the engine's CSV source); the fake remains the airgapped
    fallback. Returns the object count."""
    n = 0
    for e in manifest:
        bucket, key = e["s3_uri"][len("s3://"):].split("/", 1)
        with open(e["local"], "rb") as fh:
            body = fh.read()
        kwargs = {"Bucket": bucket, "Key": key, "Body": body}
        if e["content_type"]:
            kwargs["ContentType"] = e["content_type"]
        if e["content_encoding"]:
            kwargs["ContentEncoding"] = e["content_encoding"]
        client.put_object(**kwargs)
        n += 1
    return n


class LocalObjectStore:
    """Filesystem-backed, boto3-shaped object store: the S3 test double
    for environments without boto3/moto, and an airgapped dry-run
    deploy target. Objects land at root/bucket/key with a JSON metadata
    sidecar, so round-trip tests assert bytes AND the content-type /
    content-encoding decisions deploy-source.sh makes (reference
    deploy-source.sh:38-45, build.sh:222-227)."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, bucket: str, key: str) -> str:
        return os.path.join(self.root, bucket, key)

    def put_object(self, *, Bucket: str, Key: str, Body: bytes,
                   ContentType: str | None = None,
                   ContentEncoding: str | None = None) -> dict:
        import json

        p = self._p(Bucket, Key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(Body if isinstance(Body, bytes) else Body.read())
        meta = {"ContentType": ContentType, "ContentEncoding": ContentEncoding}
        with open(p + ".meta.json", "w") as fh:
            json.dump(meta, fh)
        return {"ETag": Key}

    def get_object(self, *, Bucket: str, Key: str) -> dict:
        import io
        import json

        p = self._p(Bucket, Key)
        with open(p, "rb") as fh:
            body = fh.read()
        with open(p + ".meta.json") as fh:
            meta = json.load(fh)
        return {"Body": io.BytesIO(body), **meta}

    def list_objects(self, *, Bucket: str, Prefix: str = "") -> list[str]:
        base = os.path.join(self.root, Bucket)
        keys = []
        for root, _, files in os.walk(base):
            for f in files:
                if f.endswith(".meta.json"):
                    continue
                keys.append(os.path.relpath(os.path.join(root, f), base))
        return sorted(k for k in keys if k.startswith(Prefix))


def manifest_to_aws_cli(manifest: list[dict]) -> list[str]:
    """Render the manifest as copy-pasteable ``aws s3 cp`` commands
    (shell-quoted — a path with a space must not split mid-command)."""
    import shlex

    out = []
    for e in manifest:
        cmd = f"aws s3 cp {shlex.quote(e['local'])} {shlex.quote(e['s3_uri'])}"
        if e["content_type"]:
            cmd += f" --content-type {e['content_type']}"
        if e["content_encoding"]:
            cmd += f" --content-encoding {e['content_encoding']}"
        out.append(cmd)
    return out
