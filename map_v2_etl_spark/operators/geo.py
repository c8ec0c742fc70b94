"""Geometry operators (SURVEY.md §2.9 G1-G3).

The reference's geometry surface is small: derive an interior point per
polygon for the bubble layer (mapshaper `-points inner`,
/root/reference/build.sh:114), compute `id = Number(GEOID)`
(/root/reference/build.sh:113,140), and let tippecanoe assign features to
Web-Mercator tiles. Spark-first mapping:

  * geometry rides along as a GeoJSON string column — opaque to Catalyst,
    schema'd metadata beside it
  * interior_point — Arrow-batched pandas UDF (the one genuinely
    per-feature imperative computation; shapely isn't in the image, so the
    classic representative-point scanline is implemented directly)
  * tile keys (z/x/y) — pure column math (slippy-map formulas), no UDF,
    fully codegen'd; tiling becomes groupBy(z, x, y)
  * per-tile top-k density dropping (O3) — rank window over tile groups
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


# --------------------------------------------------------------------------
# interior point (G1)
# --------------------------------------------------------------------------

def _edges(ring):
    """Edge pairs of a linear ring, tolerating OPEN rings (GeoJSON rings
    are closed — first point repeated — but simplify_py explicitly
    admits open ones, and a missing closing edge silently breaks
    ray-cast parity and shoelace area)."""
    pts = ring if ring[0] == ring[-1] else ring + [ring[0]]
    return zip(pts, pts[1:])


def _ring_area_centroid(ring: list[list[float]]) -> tuple[float, float, float]:
    """Signed area + area-weighted centroid of one linear ring (shoelace)."""
    a = cx = cy = 0.0
    for (x0, y0), (x1, y1) in _edges(ring):
        cross = x0 * y1 - x1 * y0
        a += cross
        cx += (x0 + x1) * cross
        cy += (y0 + y1) * cross
    a *= 0.5
    if a == 0:
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        return 0.0, sum(xs) / len(xs), sum(ys) / len(ys)
    return a, cx / (6 * a), cy / (6 * a)


def _polygon_centroid(rings: list[list[list[float]]]) -> tuple[float, float]:
    total = cx = cy = 0.0
    for ring in rings:
        a, x, y = _ring_area_centroid(ring)
        total += a
        cx += x * a
        cy += y * a
    if total == 0:
        return _ring_area_centroid(rings[0])[1:]
    return cx / total, cy / total


def _point_in_rings(x: float, y: float, rings) -> bool:
    """Even-odd ray casting over all rings (holes flip parity)."""
    inside = False
    for ring in rings:
        for (x0, y0), (x1, y1) in _edges(ring):
            if (y0 > y) != (y1 > y):
                xi = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
                if xi > x:
                    inside = not inside
    return inside


def _scanline_point(y: float, rings) -> tuple[float, float] | None:
    """Midpoint of the widest interior interval on the horizontal at y —
    the representative-point construction (same idea as shapely's
    representative_point / mapshaper's -points inner)."""
    xs = []
    for ring in rings:
        for (x0, y0), (x1, y1) in _edges(ring):
            if (y0 > y) != (y1 > y):
                xs.append(x0 + (y - y0) * (x1 - x0) / (y1 - y0))
    xs.sort()
    best, best_w = None, -1.0
    for lo, hi in zip(xs[0::2], xs[1::2]):
        if hi - lo > best_w:
            best, best_w = (lo + hi) / 2.0, hi - lo
    return (best, y) if best is not None else None


def interior_point_py(geojson_geom: str) -> tuple[float, float] | None:
    """Pure-Python interior point of a GeoJSON Polygon/MultiPolygon:
    centroid if inside, else widest-interval scanline through a y strictly
    between vertex rows (guaranteed inside for any simple polygon)."""
    if not geojson_geom:
        return None
    try:
        g = json.loads(geojson_geom)
    except ValueError:
        # malformed geometry -> null point, dropped by the caller's
        # isNotNull filter and surfaced by the dropped_features audit
        # (same contract as the bbox path's null bbox)
        return None
    # JSON-valid but structurally malformed geometry (empty/missing
    # coordinates, empty rings, 1-element points) must yield a NULL
    # point like unparseable JSON does — one bad feature in a real feed
    # must not kill the tiling task (same contract as the bbox path)
    try:
        t, coords = g.get("type"), g.get("coordinates")
        if t == "Polygon":
            polys = [coords]
        elif t == "MultiPolygon":
            polys = coords
        elif t == "Point":
            if not isinstance(coords, list) or len(coords) < 2:
                return None
            return float(coords[0]), float(coords[1])
        else:
            return None
        # largest polygon by outer-ring |area| carries the point
        polys = sorted(
            polys, key=lambda p: abs(_ring_area_centroid(p[0])[0])
        )
        rings = polys[-1]
        cx, cy = _polygon_centroid(rings)
        if _point_in_rings(cx, cy, rings):
            return cx, cy
        # scan at a y that avoids vertex degeneracy: midpoint of the two
        # middle distinct vertex ys around the centroid
        ys = sorted({p[1] for p in rings[0]})
        lo = max((v for v in ys if v <= cy), default=ys[0])
        hi = min((v for v in ys if v > cy), default=ys[-1])
        y = (lo + hi) / 2.0 if hi > lo else cy
        hit = _scanline_point(y, rings)
        if hit is None:
            hit = _scanline_point(cy, rings)
        return hit
    except (KeyError, TypeError, IndexError, ZeroDivisionError):
        return None


_POINT_SCHEMA = T.StructType(
    [
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
    ]
)


@F.pandas_udf(_POINT_SCHEMA)
def interior_point(geom: pd.Series) -> pd.DataFrame:
    """Arrow-batched interior point over a GeoJSON geometry column."""
    pts = geom.map(interior_point_py)
    return pd.DataFrame(
        {
            "x": pts.map(lambda p: p[0] if p else None),
            "y": pts.map(lambda p: p[1] if p else None),
        }
    )


def with_interior_points(df: DataFrame, geom_col: str = "geometry") -> DataFrame:
    pt = interior_point(F.col(geom_col))
    return df.withColumn("ip_x", pt["x"]).withColumn("ip_y", pt["y"])


# --------------------------------------------------------------------------
# tile keys (G3) — pure column math, no UDF
# --------------------------------------------------------------------------

def tile_xy_frac(
    lon: Column, lat: Column, zoom: int
) -> tuple[Column, Column]:
    """Continuous (unfloored, unclamped) Web-Mercator tile coordinates
    at `zoom` — the fractional position inside the tile grid. Used by
    the tile sink to expand a feature's tile range by the clip buffer
    (tippecanoe --buffer semantics) before flooring."""
    n = F.lit(float(2 ** zoom))
    xf = (lon + 180.0) / 360.0 * n
    lat_r = F.radians(lat)
    yf = (
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi) / 2.0 * n
    )
    return xf, yf


def tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy-map tile indices at `zoom` (Web-Mercator). NULL or NaN
    coordinates yield NULL tiles: Spark's least/greatest SKIP nulls
    (null would clamp to the max index) and cast(NaN as int) is 0, so
    without the guard a missing coordinate silently landed in a corner
    tile instead of staying filterable/auditable."""
    xf, yf = tile_xy_frac(lon, lat, zoom)

    def ix(frac: Column, src_a: Column, src_b: Column) -> Column:
        clamped = F.greatest(
            F.lit(0),
            F.least(F.floor(frac).cast("int"), F.lit(2 ** zoom - 1)),
        )
        ok = (
            src_a.isNotNull()
            & src_b.isNotNull()
            & ~F.isnan(src_a.cast("double"))
            & ~F.isnan(src_b.cast("double"))
        )
        return F.when(ok, clamped)

    return ix(xf, lon, lat), ix(yf, lon, lat)


def assign_tiles(
    df: DataFrame, lon_col: str, lat_col: str, zoom: int
) -> DataFrame:
    x, y = tile_xy(F.col(lon_col), F.col(lat_col), zoom)
    return (
        df.withColumn("tile_z", F.lit(zoom))
        .withColumn("tile_x", x)
        .withColumn("tile_y", y)
    )


def per_tile_topk(
    df: DataFrame, weight_col: str, k: int, tie_cols: list[str] | None = None
) -> DataFrame:
    """Density dropping (O3): keep the k heaviest features per tile."""
    order = [F.desc(weight_col)] + [F.asc(c) for c in (tie_cols or [])]
    w = W.partitionBy("tile_z", "tile_x", "tile_y").orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def numeric_geoid(geoid: Column) -> Column:
    """`id = Number(GEOID)` (F7, /root/reference/build.sh:113,140)."""
    return geoid.try_cast("long")


# --------------------------------------------------------------------------
# polygon simplification (G2) — tippecanoe --simplification in-engine
# --------------------------------------------------------------------------

def _perp_dist(p, a, b) -> float:
    """Distance from p to segment line a-b (degenerate -> point dist)."""
    (px, py), (ax, ay), (bx, by) = p, a, b
    dx, dy = bx - ax, by - ay
    norm = math.hypot(dx, dy)
    if norm == 0:
        return math.hypot(px - ax, py - ay)
    return abs(dx * (ay - py) - dy * (ax - px)) / norm


def _dp_ring(points: list, eps: float) -> list:
    """Iterative Douglas-Peucker over an open point list."""
    if len(points) < 3:
        return list(points)
    keep = [False] * len(points)
    keep[0] = keep[-1] = True
    stack = [(0, len(points) - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        best_i, best_d = -1, -1.0
        for i in range(lo + 1, hi):
            d = _perp_dist(points[i], points[lo], points[hi])
            if d > best_d:
                best_i, best_d = i, d
        if best_d > eps:
            keep[best_i] = True
            stack.append((lo, best_i))
            stack.append((best_i, hi))
    return [p for p, k in zip(points, keep) if k]


def simplify_py(geojson_geom: str, tolerance: float) -> str | None:
    """Douglas-Peucker simplification of a GeoJSON geometry string
    (the in-engine replacement for tippecanoe --simplification,
    /root/reference/build.sh:148-152). Rings keep closure and at least
    4 points (degenerate results fall back to the original ring)."""
    if not geojson_geom:
        return None
    try:
        g = json.loads(geojson_geom)
    except ValueError:
        # pass malformed geometry through UNCHANGED: simplify runs as a
        # pre-pass before tiling, and the downstream bbox/interior
        # filters + dropped_features audit own the drop decision — a
        # crash here would kill the task before they could
        return geojson_geom
    t = g.get("type")

    def ring(r):
        closed = r[0] == r[-1]
        open_pts = r[:-1] if closed else r
        out = _dp_ring(open_pts + [open_pts[0]], tolerance)
        if len(out) < 4:
            return r
        # _dp_ring always keeps both endpoints, so `out` comes back
        # closed; an OPEN input ring gets its appended closing vertex
        # stripped to preserve the input's representation
        return out if closed else out[:-1]

    # structurally malformed (JSON-valid) geometry passes through
    # unchanged — same contract as the unparseable-JSON branch above
    try:
        if t == "Polygon":
            g["coordinates"] = [ring(r) for r in g["coordinates"]]
        elif t == "MultiPolygon":
            g["coordinates"] = [
                [ring(r) for r in poly] for poly in g["coordinates"]
            ]
        elif t == "LineString":
            out = _dp_ring(g["coordinates"], tolerance)
            g["coordinates"] = out if len(out) >= 2 else g["coordinates"]
        return json.dumps(g, separators=(",", ":"))
    except (KeyError, TypeError, IndexError, ZeroDivisionError):
        return geojson_geom


def simplify_geometry(tolerance: float):
    """Arrow-batched geometry simplification UDF factory."""

    @F.pandas_udf(T.StringType())
    def _simplify(geom: pd.Series) -> pd.Series:
        return geom.map(lambda g: simplify_py(g, tolerance))

    return _simplify


# --------------------------------------------------------------------------
# spatial join (points-in-polygon) — grid bucketing + exact ray-cast refine
# --------------------------------------------------------------------------

_BBOX_SCHEMA = T.StructType(
    [
        T.StructField("xmin", T.DoubleType(), True),
        T.StructField("ymin", T.DoubleType(), True),
        T.StructField("xmax", T.DoubleType(), True),
        T.StructField("ymax", T.DoubleType(), True),
    ]
)


_BBOX_TYPES = {
    "Point", "LineString", "Polygon", "MultiPolygon", "MultiLineString",
}


def geom_bbox_py(geom_str) -> tuple | None:
    """lon/lat bbox of any GeoJSON geometry string; None when malformed
    or of an unsupported type. THE one bbox walker — the tile sink's
    _geom_bbox UDF and spatial_join's grid phase both call it, so the
    encoder, the audit, and the join can never disagree on extents
    (the old per-module copies diverged: the spatial_join one handled
    only Polygon and emitted list-valued bbox fields for MultiPolygon,
    crashing Arrow serialization)."""
    try:
        gd = json.loads(geom_str)
        if gd.get("type") not in _BBOX_TYPES:
            return None

        def walk(c):
            if isinstance(c[0], (int, float)):
                yield c
            else:
                for sub in c:
                    yield from walk(sub)

        pts = list(walk(gd["coordinates"]))
        return (
            min(p[0] for p in pts),
            min(p[1] for p in pts),
            max(p[0] for p in pts),
            max(p[1] for p in pts),
        )
    except (ValueError, KeyError, TypeError, IndexError):
        return None


@F.pandas_udf(_BBOX_SCHEMA)
def geometry_bbox(geom: pd.Series) -> pd.DataFrame:
    """Arrow-batched bounding box of any GeoJSON geometry (shared
    walker: geom_bbox_py)."""
    xs0, ys0, xs1, ys1 = [], [], [], []
    for g in geom:
        r = geom_bbox_py(g)
        if r is None:
            xs0.append(None); ys0.append(None)
            xs1.append(None); ys1.append(None)
        else:
            xs0.append(r[0]); ys0.append(r[1])
            xs1.append(r[2]); ys1.append(r[3])
    return pd.DataFrame({"xmin": xs0, "ymin": ys0, "xmax": xs1, "ymax": ys1})


@F.pandas_udf(T.BooleanType())
def _point_in_polygon(xs: pd.Series, ys: pd.Series, geom: pd.Series) -> pd.Series:
    """Arrow-batched even-odd ray cast of (x, y) against a GeoJSON
    Polygon OR MultiPolygon (holes included), applied only to
    grid-candidate pairs. A per-batch parse cache keyed on the geometry
    string amortizes json.loads across a polygon's candidate points
    (candidates arrive clustered by grid cell, so hit rates are high —
    parse cost scales with distinct polygons, not candidate pairs)."""
    out = []
    cache: dict = {}
    for x, y, g in zip(xs, ys, geom):
        parsed = cache.get(g)
        if parsed is None:
            try:
                gd = json.loads(g)
                t = gd.get("type")
                if t == "Polygon":
                    parsed = [gd["coordinates"]]
                elif t == "MultiPolygon":
                    parsed = gd["coordinates"]
                else:
                    parsed = []
            except (ValueError, KeyError, TypeError):
                parsed = []
            cache[g] = parsed
        try:
            out.append(
                any(_point_in_rings(x, y, part) for part in parsed)
            )
        except (TypeError, IndexError, ZeroDivisionError):
            out.append(False)
    return pd.Series(out)


def spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    geom_col: str = "geometry",
    cell_size: float = 4.0,
) -> DataFrame:
    """Points-in-polygon equi-join: every (point row, polygon row) pair
    where the point lies strictly inside the polygon.

    The standard two-phase spatial join (the PostGIS/Sedona shape,
    composed from DataFrame ops):

      1. GRID PHASE — polygons explode onto every ``cell_size`` grid
         cell their bbox overlaps (a `sequence` cross, pure column
         math); points hash to their single cell. The join is then a
         plain equi-join on (cell_x, cell_y) — candidates are pairs
         sharing a cell, never all-pairs, so shuffle volume is
         |points| + |polygons| x cells-per-bbox, and skewed cells
         split across AQE like any hot hash key.
      2. REFINE PHASE — the Arrow-batched even-odd ray cast runs only
         on candidate pairs (output-bounded, not corpus-bounded).

    A polygon overlapping k cells meets a contained point exactly once
    (the point lives in ONE cell), so no post-join distinct is needed.

    Returns the point columns + polygon columns (minus the geometry and
    helper columns)."""
    cs = float(cell_size)
    pts = points.withColumn(
        "_cx", F.floor(F.col(x_col) / cs).cast("long")
    ).withColumn("_cy", F.floor(F.col(y_col) / cs).cast("long"))
    bb = geometry_bbox(F.col(geom_col))
    polys = (
        polygons.withColumn("_bb", bb)
        .withColumn(
            "_cx",
            F.explode(
                F.sequence(
                    F.floor(F.col("_bb.xmin") / cs).cast("long"),
                    F.floor(F.col("_bb.xmax") / cs).cast("long"),
                )
            ),
        )
        .withColumn(
            "_cy",
            F.explode(
                F.sequence(
                    F.floor(F.col("_bb.ymin") / cs).cast("long"),
                    F.floor(F.col("_bb.ymax") / cs).cast("long"),
                )
            ),
        )
        .drop("_bb")
    )
    cand = pts.join(polys, ["_cx", "_cy"])
    return (
        cand.filter(
            _point_in_polygon(F.col(x_col), F.col(y_col), F.col(geom_col))
        )
        .drop("_cx", "_cy", geom_col)
    )
