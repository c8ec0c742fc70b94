"""Native Mapbox Vector Tile (MVT) encoder + MBTiles sink — no
tippecanoe, no protobuf library.

The reference shells out to tippecanoe to turn GeoJSON into an
.mbtiles of gzipped MVT protobufs (reference build.sh:129-134,189,214);
this sandbox has never carried tippecanoe, so until now the engine
could only emit the tippecanoe argv recipe plus tile-ready GeoJSONL.
This module closes that gap natively:

  * MVT spec 2.1 is a small, public protobuf schema; its wire format
    is just varints + length-delimited submessages, hand-encodable in
    ~100 lines (``_varint``/``_field`` below). Geometry is integer
    tile-local coordinates with zigzag-delta MoveTo/LineTo/ClosePath
    command sequences.
  * MBTiles is just SQLite (``tiles`` + ``metadata`` tables, TMS row
    order) — stdlib ``sqlite3`` writes it.

Division of labor at scale: tile ASSIGNMENT, per-tile feature ranking
and the per-tile ENCODE all run distributed (groupBy(z, x, y) +
applyInPandas — each tile's pbf is produced by exactly one task);
only the final .mbtiles packaging collects the finished blobs, because
one SQLite file is inherently a single-writer artifact (same
compatibility posture as csv_io.write_sorted_csv — the scale sink is
the (z, x, y, pbf) DataFrame itself, written to parquet or a tile
directory).

Clip-and-duplicate, like tippecanoe: each feature lands in every tile
its bbox overlaps (bounded by MAX_TILES_PER_FEATURE) and its polygon
rings are Sutherland–Hodgman-clipped to the tile's 64-px buffered box
in float pixel space before integer rounding, so a polygon spanning
tiles renders seamlessly from all of them. ``clip_buf=None`` selects
the cheaper single-tile-by-representative-point assignment for point
layers.
"""

from __future__ import annotations

import gzip
import json
import math
import os
import sqlite3

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTENT = 4096

# MVT geometry types (spec 4.3.4)
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

# protobuf wire types
_VARINT = 0
_I64 = 1
_LEN = 2


def _varint(n: int) -> bytes:
    """Unsigned LEB128."""
    if n < 0:
        raise ValueError("varint must be non-negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, _LEN, _varint(len(payload)) + payload)


def _value_msg(v) -> bytes:
    """MVT Value message: tagged union (spec 4.1)."""
    if isinstance(v, bool):
        return _field(7, _VARINT, _varint(1 if v else 0))
    if isinstance(v, int):
        # sint_value (field 6, zigzag), not int_value (field 4, whose
        # protobuf two's-complement form costs 10 bytes for negatives):
        # compact and deterministic for any sign
        return _field(6, _VARINT, _varint(_zigzag(v)))
    if isinstance(v, float):
        import struct

        return _field(3, _I64, struct.pack("<d", v))
    s = str(v).encode("utf-8")
    return _len_field(1, s)


def lonlat_to_tile_px(
    lon: float, lat: float, z: int, x: int, y: int, extent: int = EXTENT
) -> tuple[int, int]:
    """Web-Mercator tile-local integer coordinates (same slippy-map
    math as operators/geo.tile_xy, refined to the intra-tile grid) —
    int(round()) over the ONE float projection (_to_px_float), so the
    two can never drift."""
    fx, fy = _to_px_float(lon, lat, z, x, y, extent)
    return int(round(fx)), int(round(fy))


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _line_touches_box(
    pts: list[tuple[float, float]],
    x0: float,
    y0: float,
    x1: float,
    y1: float,
) -> bool:
    """True iff the polyline has a vertex inside the box OR any segment
    crosses it (Liang–Barsky interval test) — the correct tile-
    membership predicate for lines, where an any-vertex test drops
    long lines from the middle tiles they traverse."""
    if any(x0 <= fx <= x1 and y0 <= fy <= y1 for fx, fy in pts):
        return True
    for (ax, ay), (bx, by) in zip(pts, pts[1:]):
        t0, t1 = 0.0, 1.0
        dx, dy = bx - ax, by - ay
        ok = True
        for p, q in (
            (-dx, ax - x0),
            (dx, x1 - ax),
            (-dy, ay - y0),
            (dy, y1 - ay),
        ):
            if p == 0:
                if q < 0:
                    ok = False
                    break
            else:
                r = q / p
                if p < 0:
                    if r > t1:
                        ok = False
                        break
                    if r > t0:
                        t0 = r
                else:
                    if r < t0:
                        ok = False
                        break
                    if r < t1:
                        t1 = r
        if ok and t0 <= t1:
            return True
    return False


def clip_ring(
    pts: list[tuple[float, float]],
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
) -> list[tuple[float, float]]:
    """Sutherland–Hodgman polygon clip against an axis-aligned box (the
    classic tile-buffer clip tippecanoe performs). Input/output rings
    are open (no repeated first point); empty result = fully outside."""

    def clip_edge(poly, inside, intersect):
        out = []
        if not poly:
            return out
        prev = poly[-1]
        prev_in = inside(prev)
        for cur in poly:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return out

    def ix_x(bound):
        def f(p, q):
            t = (bound - p[0]) / (q[0] - p[0])
            return (bound, p[1] + t * (q[1] - p[1]))

        return f

    def ix_y(bound):
        def f(p, q):
            t = (bound - p[1]) / (q[1] - p[1])
            return (p[0] + t * (q[0] - p[0]), bound)

        return f

    pts = clip_edge(pts, lambda p: p[0] >= xmin, ix_x(xmin))
    pts = clip_edge(pts, lambda p: p[0] <= xmax, ix_x(xmax))
    pts = clip_edge(pts, lambda p: p[1] >= ymin, ix_y(ymin))
    pts = clip_edge(pts, lambda p: p[1] <= ymax, ix_y(ymax))
    return pts


def _to_px_float(
    lon: float, lat: float, z: int, x: int, y: int, extent: int
) -> tuple[float, float]:
    n = 2.0 ** z
    wx = (lon + 180.0) / 360.0 * n
    lat_r = math.radians(max(min(lat, 85.05112878), -85.05112878))
    wy = (1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n
    return (wx - x) * extent, (wy - y) * extent


def _encode_geometry(
    geom: dict,
    z: int,
    x: int,
    y: int,
    extent: int = EXTENT,
    clip_buf: int | None = None,
) -> tuple[int, list[int]]:
    """GeoJSON geometry dict -> (mvt_type, command/parameter ints).

    With ``clip_buf`` set, polygon rings are Sutherland–Hodgman-clipped
    to the tile box expanded by that many pixels (the tippecanoe
    buffer), and out-of-box points are dropped; clipping happens in
    FLOAT pixel space before integer rounding so edges land exactly on
    the clip bound. Lines are included whole when any vertex is in the
    box (segment-level clipping is a renderer concern at our zooms)."""
    t = geom.get("type")
    if t == "Point":
        # index, don't splat: GeoJSON permits a third (elevation)
        # coordinate, which would overflow _to_px_float's (lon, lat)
        # slots — the Polygon/LineString paths already read p[0], p[1]
        c = geom["coordinates"]
        fx, fy = _to_px_float(c[0], c[1], z, x, y, extent)
        if clip_buf is not None and not (
            -clip_buf <= fx <= extent + clip_buf
            and -clip_buf <= fy <= extent + clip_buf
        ):
            return GEOM_POINT, []
        px, py = int(round(fx)), int(round(fy))
        return GEOM_POINT, [_cmd(1, 1), _zigzag(px), _zigzag(py)]
    if t in ("Polygon", "MultiPolygon"):
        polys = (
            geom["coordinates"]
            if t == "MultiPolygon"
            else [geom["coordinates"]]
        )
        out: list[int] = []
        cx = cy = 0
        for rings in polys:
            for ring_ix, ring in enumerate(rings):
                # GeoJSON rings repeat the first point; MVT closes with
                # ClosePath instead
                pts = ring[:-1] if ring and ring[0] == ring[-1] else ring
                if len(pts) < 3:
                    continue
                fpts = [
                    _to_px_float(p[0], p[1], z, x, y, extent)
                    for p in pts
                ]
                if clip_buf is not None:
                    fpts = clip_ring(
                        fpts,
                        -clip_buf,
                        -clip_buf,
                        extent + clip_buf,
                        extent + clip_buf,
                    )
                # MVT 4.3.4.4 winding: in tile coords (y down) the
                # exterior ring must enclose POSITIVE shoelace area
                # (clockwise on screen) and interior rings negative.
                # GeoJSON-compliant input arrives correct automatically
                # (the Mercator y-flip inverts RFC 7946's CCW/CW), but
                # arbitrary input must be rewound — tippecanoe does the
                # same — or renderers invert fills and holes.
                area2 = sum(
                    fpts[i][0] * fpts[(i + 1) % len(fpts)][1]
                    - fpts[(i + 1) % len(fpts)][0] * fpts[i][1]
                    for i in range(len(fpts))
                )
                want_positive = ring_ix == 0
                if len(fpts) >= 3 and (area2 > 0) != want_positive and area2 != 0:
                    fpts = fpts[::-1]
                coords = [
                    (int(round(fx)), int(round(fy))) for fx, fy in fpts
                ]
                # rounding can collapse clip slivers; also drop
                # consecutive duplicates the integer grid created
                dedup = [
                    c
                    for i, c in enumerate(coords)
                    if i == 0 or c != coords[i - 1]
                ]
                if len(dedup) > 1 and dedup[0] == dedup[-1]:
                    dedup = dedup[:-1]
                coords = dedup
                if len(coords) < 3:
                    continue
                px, py = coords[0]
                out += [_cmd(1, 1), _zigzag(px - cx), _zigzag(py - cy)]
                cx, cy = px, py
                out.append(_cmd(2, len(coords) - 1))
                for px, py in coords[1:]:
                    out += [_zigzag(px - cx), _zigzag(py - cy)]
                    cx, cy = px, py
                out.append(_cmd(7, 1))
        return GEOM_POLYGON, out
    if t in ("LineString", "MultiLineString"):
        lines = (
            geom["coordinates"]
            if t == "MultiLineString"
            else [geom["coordinates"]]
        )
        out = []
        cx = cy = 0
        for line in lines:
            fpts = [
                _to_px_float(p[0], p[1], z, x, y, extent) for p in line
            ]
            # membership test is vertex-in-box OR segment-crosses-box:
            # a long line can traverse a middle tile with BOTH
            # endpoints outside its buffered box, and the old
            # any-vertex test silently dropped it from exactly the
            # tiles _with_tile_span assigned it to — a one-tile gap in
            # the rendered line
            if clip_buf is not None and not _line_touches_box(
                fpts,
                -clip_buf,
                -clip_buf,
                extent + clip_buf,
                extent + clip_buf,
            ):
                continue
            coords = [(int(round(fx)), int(round(fy))) for fx, fy in fpts]
            if len(coords) < 2:
                continue
            px, py = coords[0]
            out += [_cmd(1, 1), _zigzag(px - cx), _zigzag(py - cy)]
            cx, cy = px, py
            out.append(_cmd(2, len(coords) - 1))
            for px, py in coords[1:]:
                out += [_zigzag(px - cx), _zigzag(py - cy)]
                cx, cy = px, py
        return GEOM_LINESTRING, out
    raise ValueError(f"unsupported geometry type {t!r}")


def encode_layer(
    name: str,
    features: list[dict],
    z: int,
    x: int,
    y: int,
    extent: int = EXTENT,
    clip_buf: int | None = None,
) -> bytes:
    """One MVT Layer submessage. ``features``: dicts with ``geometry``
    (GeoJSON dict or string) and ``properties`` (flat dict). Keys and
    values are interned layer-wide per the spec; iteration order is the
    (deterministic) feature order, so the blob is reproducible."""
    keys: list[str] = []
    key_ix: dict[str, int] = {}
    vals: list[bytes] = []
    val_ix: dict[tuple, int] = {}
    feats: list[bytes] = []
    for i, f in enumerate(features):
        geom = f["geometry"]
        if isinstance(geom, str):
            geom = json.loads(geom)
        gtype, cmds = _encode_geometry(geom, z, x, y, extent, clip_buf)
        if not cmds:
            continue
        tags: list[int] = []
        for k, v in (f.get("properties") or {}).items():
            # skip missing values: None, and the NaN that pandas uses
            # for nulls when layers with different columns union
            if v is None or (isinstance(v, float) and v != v):
                continue
            if k not in key_ix:
                key_ix[k] = len(keys)
                keys.append(k)
            try:
                vk = (type(v).__name__, v)
                hash(vk)
            except TypeError:
                # unhashable (numpy array / list / dict) values intern
                # by their str form — the same representation
                # _value_msg encodes them as
                vk = (type(v).__name__, str(v))
            if vk not in val_ix:
                val_ix[vk] = len(vals)
                vals.append(_value_msg(v))
            tags += [key_ix[k], val_ix[vk]]
        body = b""
        fid = f.get("id")
        # id is OPTIONAL uint64 in the spec: skip it for null/NaN
        # (Arrow->pandas renders a nullable long column as float64 with
        # NaN), non-numeric, or negative ids instead of crashing the
        # encode task — the same tolerance the properties path has
        if fid is not None and fid == fid:  # NaN != NaN
            try:
                iid = int(fid)
            except (TypeError, ValueError):
                iid = None
            if iid is not None and iid >= 0:
                body += _field(1, _VARINT, _varint(iid))
        if tags:
            packed = b"".join(_varint(t) for t in tags)
            body += _len_field(2, packed)
        body += _field(3, _VARINT, _varint(gtype))
        body += _len_field(4, b"".join(_varint(c) for c in cmds))
        feats.append(body)
    if not feats:
        # every feature clipped away: emit nothing rather than a
        # featureless layer husk
        return b""
    layer = _field(15, _VARINT, _varint(2))  # version = 2
    layer += _len_field(1, name.encode("utf-8"))
    for fb in feats:
        layer += _len_field(2, fb)
    for k in keys:
        layer += _len_field(3, k.encode("utf-8"))
    for vb in vals:
        layer += _len_field(4, vb)
    layer += _field(5, _VARINT, _varint(extent))
    return _len_field(3, layer)  # Tile.layers field


_TILE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("pbf", T.BinaryType()),
    ]
)


#: cap on tiles one feature may span at a zoom — guards a runaway
#: world-spanning geometry from exploding into the whole pyramid (at
#: real scale such features belong to a lower zoom)
MAX_TILES_PER_FEATURE = 256


def _with_tile_span(
    feats: DataFrame,
    geom_col: str,
    zoom: int,
    clip_buf: int | None,
) -> DataFrame:
    """Adds ``_bb`` (lon/lat bbox) and the clamped tile-range columns
    ``_x0/_x1/_y0/_y1`` the feature overlaps at ``zoom``.

    The range is expanded by ``clip_buf`` TILE-FRACTION units
    (clip_buf px / EXTENT px per tile) before flooring, so a feature
    lying within the buffer distance OUTSIDE a tile is still assigned
    to it and encoded into that tile's buffer zone — tippecanoe's
    --buffer semantics. Without the expansion, strokes/fills pop at
    tile edges because the neighbor tile never saw the feature.

    Rows with unparseable geometry keep a null ``_bb.xmin`` (callers
    filter or audit them); the range columns share the bbox pandas UDF
    between the encode path and the dropped_features audit so the two
    always agree on what spans what."""
    from ..operators.geo import tile_xy_frac

    buft = float(clip_buf or 0) / float(EXTENT)
    nmax = F.lit(2 ** zoom - 1)
    clampi = lambda c: F.greatest(  # noqa: E731
        F.lit(0), F.least(c.cast("int"), nmax)
    )
    bb = feats.withColumn("_bb", _geom_bbox(F.col(geom_col)))
    # south (ymin) maps to the LARGER fractional y, north to the smaller
    xf_min, yf_big = tile_xy_frac(
        F.col("_bb.xmin"), F.col("_bb.ymin"), zoom
    )
    xf_max, yf_small = tile_xy_frac(
        F.col("_bb.xmax"), F.col("_bb.ymax"), zoom
    )
    return (
        bb.withColumn("_x0", clampi(F.floor(xf_min - buft)))
        .withColumn("_x1", clampi(F.floor(xf_max + buft)))
        .withColumn("_y0", clampi(F.floor(yf_small - buft)))
        .withColumn("_y1", clampi(F.floor(yf_big + buft)))
    )


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
            T.StructField("xmax", T.DoubleType()),
            T.StructField("ymax", T.DoubleType()),
        ]
    )
)  # typed StructType, not a DDL string: the string form parses at
# import time and needs a live SparkContext (this module imports before
# any session exists in tests)
def _geom_bbox(geom: pd.Series) -> pd.DataFrame:
    """lon/lat bounding box of any GeoJSON geometry (Point/LineString/
    Polygon and Multi* variants). Delegates to the ONE shared walker
    (operators/geo.geom_bbox_py) so the tile sink, the
    dropped_features audit, and spatial_join's grid phase can never
    disagree on extents; malformed/unsupported geometry -> null bbox,
    dropped by the caller's filter and surfaced by the audit instead
    of crashing the encode task later."""
    from ..operators.geo import geom_bbox_py

    out = {"xmin": [], "ymin": [], "xmax": [], "ymax": []}
    for g in geom:
        r = geom_bbox_py(g)
        if r is None:
            for k in out:
                out[k].append(None)
        else:
            out["xmin"].append(r[0])
            out["ymin"].append(r[1])
            out["xmax"].append(r[2])
            out["ymax"].append(r[3])
    return pd.DataFrame(out)


def encode_tiles(
    feats: DataFrame,
    zoom: int,
    layer_col: str = "layer",
    geom_col: str = "geometry",
    id_col: str | None = None,
    clip_buf: int | None = 64,
    simplify_px: float | None = None,
) -> DataFrame:
    """(layer, geometry, props...) -> one MVT pbf per (z, x, y).

    With ``clip_buf`` (default 64 px, the tippecanoe buffer), each
    feature is assigned to EVERY tile its bbox overlaps (bbox pandas
    UDF -> tile-range sequence explode, all column math) and its
    geometry is clipped to each tile's buffered box at encode time —
    a polygon spanning tiles renders seamlessly from all of them.
    ``clip_buf=None`` falls back to single-tile assignment by
    representative point (cheaper; fine for point layers).

    ``simplify_px`` applies Douglas-Peucker BEFORE tiling, with the
    tolerance given in tile pixels at this zoom (tippecanoe
    --simplification): tolerance_deg = px * 360 / (2^z * extent). At
    low zooms that collapses sub-pixel vertex detail so world-view
    tiles stay small; at high zooms the same pixel tolerance converges
    to no-op. Simplification is a per-feature Arrow-batched UDF over
    ONE pass of the input, before the tile fan-out duplicates anything.

    The per-tile encode is applyInPandas, so every tile's blob is
    built by exactly one task; the shuffle carries each feature once
    per overlapped tile (bounded by MAX_TILES_PER_FEATURE). All
    non-geometry, non-layer columns become feature properties."""
    from ..operators.geo import tile_xy, with_interior_points

    if simplify_px is not None:
        from ..operators.geo import simplify_geometry

        tol = simplify_px * 360.0 / ((2 ** zoom) * EXTENT)
        feats = feats.withColumn(
            geom_col, simplify_geometry(tol)(F.col(geom_col))
        )

    if clip_buf is None:
        pts = with_interior_points(feats, geom_col)  # ip_x/ip_y lon/lat
        tx, ty = tile_xy(F.col("ip_x"), F.col("ip_y"), zoom)
        tiled = pts.withColumn("_tx", tx).withColumn("_ty", ty).filter(
            F.col("ip_x").isNotNull()
        )
    else:
        spanned = _with_tile_span(feats, geom_col, zoom, clip_buf).filter(
            F.col("_bb.xmin").isNotNull()
        )
        spanned = spanned.filter(
            (F.col("_x1") - F.col("_x0") + 1)
            * (F.col("_y1") - F.col("_y0") + 1)
            <= MAX_TILES_PER_FEATURE
        )
        tiled = (
            spanned.withColumn(
                "_tx", F.explode(F.sequence("_x0", "_x1"))
            )
            .withColumn("_ty", F.explode(F.sequence("_y0", "_y1")))
            .drop("_bb", "_x0", "_x1", "_y0", "_y1")
        )
    prop_cols = [
        c
        for c in feats.columns
        if c not in (geom_col, layer_col)
    ]

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        z = zoom
        x = int(pdf["_tx"].iloc[0])
        y = int(pdf["_ty"].iloc[0])
        blob = b""
        # stable COMPOSITE key: id first (when present), then every
        # SORTABLE property, then the geometry string. Shuffle arrival
        # order inside a tile is nondeterministic, so a single-column
        # key with ties would leave tile bytes run-dependent (and an
        # empty prop_cols would crash a prop_cols[0] key) — the full
        # composite makes encode_layer's "reproducible blob" contract
        # hold unconditionally. Array/struct-typed properties (numpy
        # arrays/dicts via Arrow) are excluded from the KEY — pandas
        # cannot compare them — but still encode as properties; the
        # geometry string keeps the key discriminating.
        def comparable(c: str) -> bool:
            s = pdf[c].dropna()
            return s.empty or not isinstance(
                s.iloc[0], (np.ndarray, list, dict, set)
            )

        sort_cols = (
            ([id_col] if id_col else [])
            + [c for c in prop_cols if comparable(c)]
            + [geom_col]
        )
        for lname, grp in pdf.groupby(layer_col, sort=True):
            grp = grp.sort_values(sort_cols, kind="mergesort")
            features = [
                {
                    "geometry": r[geom_col],
                    "properties": {c: r[c] for c in prop_cols},
                    "id": r[id_col] if id_col else None,
                }
                for _, r in grp.iterrows()
            ]
            blob += encode_layer(
                str(lname), features, z, x, y, clip_buf=clip_buf
            )
        if not blob:  # all features clipped out of this tile
            return pd.DataFrame({"z": [], "x": [], "y": [], "pbf": []})
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "pbf": [blob]}
        )

    return tiled.groupBy("_tx", "_ty").applyInPandas(
        encode, schema=_TILE_SCHEMA
    )


def invalid_geometries(
    feats: DataFrame, geom_col: str = "geometry"
) -> DataFrame:
    """The rows encode_tiles will DROP (unparseable/empty geometry) —
    the no-silent-caps audit for the tile sink. Both assignment paths
    filter bad geometries in-plan (null bbox / null interior point);
    run this against the same input to count and inspect what fell
    out, the way corrupt_record_quarantine audits the JSONL source.
    This surfaces only the null-bbox class; ``dropped_features`` is the
    full audit (adds the MAX_TILES_PER_FEATURE span drops)."""
    return feats.withColumn("_bb", _geom_bbox(F.col(geom_col))).filter(
        F.col("_bb.xmin").isNull()
    ).drop("_bb")


def dropped_features(
    feats: DataFrame,
    zoom: int,
    geom_col: str = "geometry",
    clip_buf: int | None = 64,
    simplify_px: float | None = None,
) -> DataFrame:
    """EVERY row ``encode_tiles(..., zoom, clip_buf=clip_buf)`` will
    drop, with a ``drop_reason`` column, mirroring the encode path the
    arguments select:

    * ``clip_buf`` int (bbox fan-out path): ``invalid_geometry``
      (unparseable/empty — null bbox) or ``tile_span_exceeded`` (the
      buffered bbox overlaps more than MAX_TILES_PER_FEATURE tiles,
      the runaway-geometry guard). The span math is the SAME
      ``_with_tile_span`` plan the encoder uses, so audit and sink
      cannot disagree — the no-silent-caps rule for the one bounded
      drop the tile path has. ONE pass: a single when/when projection
      over one bbox-UDF evaluation, not a union of re-scans.
    * ``clip_buf=None`` (interior-point single-tile path): that path
      has NO span cap — its only drop is a null interior point, so the
      audit reports exactly those rows as ``invalid_geometry``.

    Pass the SAME ``simplify_px`` the encode ran with: simplification
    happens BEFORE tiling and can shrink a bbox back under the span
    cap, so an audit on raw geometry would report drops the sink never
    made (audit and sink must see identical geometry)."""
    if simplify_px is not None:
        from ..operators.geo import simplify_geometry

        tol = simplify_px * 360.0 / ((2 ** zoom) * EXTENT)
        feats = feats.withColumn(
            geom_col, simplify_geometry(tol)(F.col(geom_col))
        )
    if clip_buf is None:
        from ..operators.geo import with_interior_points

        pts = with_interior_points(feats, geom_col)
        return (
            pts.filter(F.col("ip_x").isNull())
            .drop("ip_x", "ip_y")
            .withColumn("drop_reason", F.lit("invalid_geometry"))
        )
    sp = _with_tile_span(feats, geom_col, zoom, clip_buf)
    span = (F.col("_x1") - F.col("_x0") + 1) * (
        F.col("_y1") - F.col("_y0") + 1
    )
    reason = F.when(
        F.col("_bb.xmin").isNull(), F.lit("invalid_geometry")
    ).when(span > MAX_TILES_PER_FEATURE, F.lit("tile_span_exceeded"))
    return (
        sp.withColumn("drop_reason", reason)
        .filter(F.col("drop_reason").isNotNull())
        .drop("_bb", "_x0", "_x1", "_y0", "_y1")
    )


def encode_pyramid(
    feats: DataFrame,
    minzoom: int,
    maxzoom: int,
    layer_col: str = "layer",
    geom_col: str = "geometry",
    id_col: str | None = None,
    clip_buf: int | None = 64,
    max_per_tile: int | None = None,
    weight_col: str | None = None,
    simplify_px: float | None = None,
) -> DataFrame:
    """Full tile pyramid (tippecanoe's -Z/-z): one (z, x, y, pbf) frame
    covering every zoom in [minzoom, maxzoom].

    Each zoom's plan is an independent encode_tiles over the SAME input
    scan (union of per-zoom subplans — zoom is a plan-time constant in
    the tile math, so per-zoom codegen beats a zoom-join). With
    ``max_per_tile`` + ``weight_col``, the k heaviest features survive
    per tile BEFORE encoding (operators/geo.per_tile_topk — the
    tippecanoe drop-densest rule) — at low zooms that bound is what
    keeps world-view tiles constant-size while deep zooms keep every
    feature, the property that makes a 100 TB pyramid render."""
    out = None
    for z in range(minzoom, maxzoom + 1):
        src = feats
        if max_per_tile is not None and weight_col is not None:
            from ..operators.geo import (
                per_tile_topk,
                tile_xy,
                with_interior_points,
            )

            pts = with_interior_points(src, geom_col)
            tx, ty = tile_xy(F.col("ip_x"), F.col("ip_y"), z)
            keyed = (
                pts.withColumn("tile_z", F.lit(z))
                .withColumn("tile_x", tx)
                .withColumn("tile_y", ty)
            )
            src = per_tile_topk(
                keyed, weight_col, max_per_tile,
                tie_cols=[id_col] if id_col else None,
            ).drop("tile_z", "tile_x", "tile_y", "ip_x", "ip_y")
        tiles_z = encode_tiles(
            src, z, layer_col, geom_col, id_col, clip_buf, simplify_px
        )
        out = tiles_z if out is None else out.unionByName(tiles_z)
    return out


def _tileset_metadata(
    name: str,
    minzoom: int,
    maxzoom: int,
    bounds: str,
    layer_fields: dict[str, dict[str, str]] | None,
) -> dict[str, str]:
    """The tippecanoe-compatible metadata key/value set — shared by the
    single-file .mbtiles writer and the distributed tile-directory sink
    so metadata.json is byte-identical on both paths."""
    vector_layers = [
        {"id": lname, "fields": fields or {}}
        for lname, fields in (layer_fields or {}).items()
    ]
    return {
        "name": name,
        "format": "pbf",
        "minzoom": str(minzoom),
        "maxzoom": str(maxzoom),
        "bounds": bounds,
        "type": "overlay",
        "json": json.dumps({"vector_layers": vector_layers}),
    }


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    name: str,
    minzoom: int,
    maxzoom: int,
    bounds: str = "-180.0,-85,180,85",
    layer_fields: dict[str, dict[str, str]] | None = None,
) -> int:
    """Package a (z, x, y, pbf) DataFrame into one .mbtiles file.

    Collects the FINISHED blobs only (a tile pyramid destined for a
    single SQLite artifact is output-bounded by design — the scale
    path keeps the tiles DataFrame in parquet). Rows are gzipped (the
    tippecanoe/mapbox convention), y is flipped to TMS, and the
    metadata table carries the tippecanoe-compatible ``json`` layer
    description. Returns the tile count."""
    rows = tiles.select("z", "x", "y", "pbf").collect()
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(
            "CREATE TABLE metadata (name text, value text)"
        )
        cur.execute(
            "CREATE TABLE tiles (zoom_level integer, tile_column "
            "integer, tile_row integer, tile_data blob)"
        )
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)"
        )
        meta = _tileset_metadata(
            name, minzoom, maxzoom, bounds, layer_fields
        )
        cur.executemany(
            "INSERT INTO metadata VALUES (?, ?)", list(meta.items())
        )
        n = 0
        for r in rows:
            tms_y = (1 << r["z"]) - 1 - r["y"]
            cur.execute(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                (
                    r["z"],
                    r["x"],
                    tms_y,
                    gzip.compress(bytes(r["pbf"]), mtime=0),
                ),
            )
            n += 1
        con.commit()
        return n
    finally:
        con.close()


def mbtiles_to_dir(mbtiles_path: str, out_dir: str) -> int:
    """S9 natively: unpack an .mbtiles into a z/x/y.pbf tile directory
    plus metadata.json — tile-join --output-to-directory without the
    binary (reference build.sh:220-223). Tiles stay gzip-compressed on
    disk, which is why the deploy manifest marks *.pbf with
    content-encoding gzip (upload_manifest). Returns the tile count."""
    con = sqlite3.connect(mbtiles_path)
    try:
        meta = dict(con.execute("SELECT name, value FROM metadata"))
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
            json.dump(meta, fh, sort_keys=True)
        n = 0
        for z, x, tms_y, blob in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data "
            "FROM tiles ORDER BY 1, 2, 3"
        ):
            y = (1 << z) - 1 - tms_y  # TMS -> slippy
            d = os.path.join(out_dir, str(z), str(x))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{y}.pbf"), "wb") as fh:
                fh.write(blob)
            n += 1
        return n
    finally:
        con.close()


def write_tile_dir(
    tiles: DataFrame,
    out_dir: str,
    name: str,
    minzoom: int,
    maxzoom: int,
    bounds: str = "-180.0,-85,180,85",
    layer_fields: dict[str, dict[str, str]] | None = None,
) -> int:
    """DISTRIBUTED S9: write a (z, x, y, pbf) DataFrame straight to a
    z/x/y.pbf tile directory + metadata.json — the reference's served
    layout (build.sh:220-223 tile-join --output-to-directory) with NO
    driver-side collect: every executor writes its own partition's
    tiles, so a planet-scale pyramid streams to storage in parallel
    instead of funneling blobs through one process (write_mbtiles'
    documented bound). On a cluster, point ``out_dir`` at a shared
    filesystem or an object-store mount; tasks only create dirs and
    write files, both idempotent under retry (atomic tmp+rename, last
    writer wins on the same (z,x,y) bytes).

    Files are gzip-compressed with mtime=0 and metadata.json is the
    same sorted-key dump as the .mbtiles metadata table, so the output
    is byte-identical to write_mbtiles -> mbtiles_to_dir (asserted in
    tests/test_mvt.py). A pre-existing ``out_dir`` is REMOVED first —
    the same replace-the-artifact semantics as write_mbtiles — so a
    rebuild that produces fewer tiles can't leave stale z/x/y.pbf files
    from the previous build being served (and walked by
    upload_manifest). Returns the tile count (LongAccumulator — an
    exact count because foreachPartition is a single action)."""
    import shutil

    meta = _tileset_metadata(name, minzoom, maxzoom, bounds, layer_fields)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    sel = tiles.select("z", "x", "y", "pbf")
    acc = sel.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows) -> None:
        import gzip as _gzip
        import os as _os

        n = 0
        for r in rows:
            d = _os.path.join(out_dir, str(r["z"]), str(r["x"]))
            _os.makedirs(d, exist_ok=True)
            final = _os.path.join(d, f"{r['y']}.pbf")
            tmp = f"{final}.tmp-{_os.getpid()}"
            with open(tmp, "wb") as out:
                out.write(_gzip.compress(bytes(r["pbf"]), mtime=0))
            _os.replace(tmp, final)
            n += 1
        acc.add(n)

    sel.foreachPartition(write_partition)
    return acc.value


def write_tile_objects(
    tiles: DataFrame,
    bucket: str,
    prefix: str,
    name: str,
    minzoom: int,
    maxzoom: int,
    bounds: str = "-180.0,-85,180,85",
    layer_fields: dict[str, dict[str, str]] | None = None,
    client_factory=None,
) -> int:
    """DISTRIBUTED deploy (S7+S9 fused): upload a (z, x, y, pbf)
    DataFrame straight to an object store as
    ``s3://{bucket}/{prefix}/z/x/y.pbf`` with the reference's deploy
    metadata (content-type application/x-protobuf, content-encoding
    gzip — build.sh:222-227), each executor partition uploading its own
    tiles through its own client. The reference (and ``write_tile_dir``
    + ``upload_manifest``) stages a local directory and uploads it from
    ONE process; at planetary tile counts that single uploader is the
    bottleneck, so this sink lets every executor PUT in parallel and
    nothing ever funnels through the driver except the one-object
    metadata.json.

    ``client_factory``: a PICKLABLE zero-arg callable returning a
    boto3-shaped client (``put_object(Bucket=, Key=, Body=,
    ContentType=, ContentEncoding=)``) — e.g. a module-level function
    or ``functools.partial`` closing over an endpoint URL. Defaults to
    a plain ``boto3.client("s3")`` (instance-role credentials on a real
    cluster). Each partition calls it once; clients are never shipped
    over the wire. Object PUTs are atomic and idempotent, so Spark task
    retries are safe (last writer wins with identical bytes).

    Returns the tile count (LongAccumulator over the single action)."""
    if client_factory is None:
        client_factory = _default_s3_client
    meta = _tileset_metadata(name, minzoom, maxzoom, bounds, layer_fields)
    client_factory().put_object(
        Bucket=bucket,
        Key=f"{prefix}/metadata.json",
        Body=json.dumps(meta, sort_keys=True).encode(),
        ContentType="application/json",
    )
    sel = tiles.select("z", "x", "y", "pbf")
    acc = sel.sparkSession.sparkContext.accumulator(0)

    def put_partition(rows) -> None:
        import gzip as _gzip

        client = None
        n = 0
        for r in rows:
            if client is None:  # lazy: empty partitions skip the client
                client = client_factory()
            client.put_object(
                Bucket=bucket,
                Key=f"{prefix}/{r['z']}/{r['x']}/{r['y']}.pbf",
                Body=_gzip.compress(bytes(r["pbf"]), mtime=0),
                ContentType="application/x-protobuf",
                ContentEncoding="gzip",
            )
            n += 1
        acc.add(n)

    sel.foreachPartition(put_partition)
    return acc.value


def _default_s3_client():
    import boto3

    return boto3.client("s3")


# --------------------------------------------------------------------------
# decoding (for tests / verification — not a renderer)
# --------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def decode_tile(buf: bytes) -> list[dict]:
    """Minimal MVT reader: [{name, extent, features:[{id, type, tags,
    geometry(commands decoded to absolute int coords)}], keys,
    values}] — enough to round-trip-verify our encoder and to sanity-
    check third-party tiles."""
    layers = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wire = tag >> 3, tag & 0x7
        if num == 3 and wire == _LEN:
            ln, i = _read_varint(buf, i)
            layers.append(_decode_layer(buf[i : i + ln]))
            i += ln
        else:
            i = _skip(buf, i, wire)
    return layers


def _skip(buf: bytes, i: int, wire: int) -> int:
    if wire == _VARINT:
        _, i = _read_varint(buf, i)
        return i
    if wire == _I64:
        return i + 8
    if wire == _LEN:
        ln, i = _read_varint(buf, i)
        return i + ln
    if wire == 5:
        return i + 4
    raise ValueError(f"wire type {wire}")


def _decode_layer(buf: bytes) -> dict:
    out = {"name": None, "extent": EXTENT, "features": [], "keys": [],
           "values": []}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wire = tag >> 3, tag & 0x7
        if num == 1 and wire == _LEN:
            ln, i = _read_varint(buf, i)
            out["name"] = buf[i : i + ln].decode("utf-8")
            i += ln
        elif num == 2 and wire == _LEN:
            ln, i = _read_varint(buf, i)
            out["features"].append(_decode_feature(buf[i : i + ln]))
            i += ln
        elif num == 3 and wire == _LEN:
            ln, i = _read_varint(buf, i)
            out["keys"].append(buf[i : i + ln].decode("utf-8"))
            i += ln
        elif num == 4 and wire == _LEN:
            ln, i = _read_varint(buf, i)
            out["values"].append(_decode_value(buf[i : i + ln]))
            i += ln
        elif num == 5 and wire == _VARINT:
            out["extent"], i = _read_varint(buf, i)
        else:
            i = _skip(buf, i, wire)
    return out


def _decode_value(buf: bytes):
    i = 0
    tag, i = _read_varint(buf, i)
    num, wire = tag >> 3, tag & 0x7
    if num == 1:
        ln, i = _read_varint(buf, i)
        return buf[i : i + ln].decode("utf-8")
    if num == 3:
        import struct

        return struct.unpack("<d", buf[i : i + 8])[0]
    if num == 6:
        n, i = _read_varint(buf, i)
        return _unzigzag(n)
    if num == 7:
        n, i = _read_varint(buf, i)
        return bool(n)
    n, i = _read_varint(buf, i)
    return n


def _decode_feature(buf: bytes) -> dict:
    f = {"id": None, "tags": [], "type": 0, "geometry": []}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wire = tag >> 3, tag & 0x7
        if num == 1 and wire == _VARINT:
            f["id"], i = _read_varint(buf, i)
        elif num == 2 and wire == _LEN:
            ln, i = _read_varint(buf, i)
            end = i + ln
            while i < end:
                t, i = _read_varint(buf, i)
                f["tags"].append(t)
        elif num == 3 and wire == _VARINT:
            f["type"], i = _read_varint(buf, i)
        elif num == 4 and wire == _LEN:
            ln, i = _read_varint(buf, i)
            end = i + ln
            cmds = []
            while i < end:
                c, i = _read_varint(buf, i)
                cmds.append(c)
            f["geometry"] = _decode_commands(cmds)
        else:
            i = _skip(buf, i, wire)
    return f


def _decode_commands(cmds: list[int]) -> list[dict]:
    """Command stream -> [{'cmd': 'move'|'line'|'close', 'points':
    [(x, y), ...]}] with ABSOLUTE coordinates."""
    out = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd_id = cmds[i] & 0x7
        count = cmds[i] >> 3
        i += 1
        if cmd_id == 7:
            out.append({"cmd": "close", "points": []})
            continue
        pts = []
        for _ in range(count):
            cx += _unzigzag(cmds[i])
            cy += _unzigzag(cmds[i + 1])
            i += 2
            pts.append((cx, cy))
        out.append(
            {"cmd": "move" if cmd_id == 1 else "line", "points": pts}
        )
    return out
