"""Property-based tests (hypothesis) for the MVT encoder and the
cross-engine arithmetic in plans/duck_vec.py — the two places where a
single wrong bit silently corrupts artifacts or flips an oracle."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from map_v2_etl_spark.sources.mvt import (
    EXTENT,
    _read_varint,
    _unzigzag,
    _varint,
    _zigzag,
    clip_ring,
    decode_tile,
    encode_layer,
    lonlat_to_tile_px,
)


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip(n):
    v, i = _read_varint(_varint(n), 0)
    assert v == n
    assert i == len(_varint(n))


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_zigzag_roundtrip(n):
    assert _unzigzag(_zigzag(n)) == n


@given(
    st.lists(
        st.tuples(
            st.floats(-1000, 1000, allow_nan=False),
            st.floats(-1000, 1000, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    ),
    st.floats(-100, 0),
    st.floats(0, 100),
)
@settings(max_examples=200, deadline=None)
def test_clip_ring_stays_in_box(pts, lo, hi):
    out = clip_ring(pts, lo, lo, hi, hi)
    eps = 1e-9
    for x, y in out:
        assert lo - eps <= x <= hi + eps
        assert lo - eps <= y <= hi + eps


@given(
    st.lists(
        st.tuples(st.floats(-50, 50), st.floats(-50, 50)),
        min_size=3,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_clip_ring_identity_when_inside(pts):
    assert clip_ring(pts, -60, -60, 60, 60) == pts


@given(
    st.dictionaries(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=8,
        ),
        st.one_of(
            st.integers(min_value=-(2**31), max_value=2**31),
            st.booleans(),
            st.floats(allow_nan=False, allow_infinity=False),
            st.text(max_size=16),
        ),
        max_size=6,
    )
)
@settings(max_examples=150, deadline=None)
def test_feature_properties_roundtrip(props):
    feat = {
        "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
        "properties": props,
    }
    layers = decode_tile(encode_layer("l", [feat], 0, 0, 0))
    lyr = layers[0]
    (f,) = lyr["features"]
    got = {
        lyr["keys"][f["tags"][i]]: lyr["values"][f["tags"][i + 1]]
        for i in range(0, len(f["tags"]), 2)
    }
    want = {k: v for k, v in props.items() if v is not None}
    assert got == want


@given(
    st.floats(-179.9, 179.9),
    st.floats(-80.0, 80.0),
    st.integers(min_value=0, max_value=14),
)
@settings(max_examples=200, deadline=None)
def test_point_roundtrip_exact(lon, lat, z):
    # target tile = the point's own tile, so local coords are in-extent
    n = 2.0 ** z
    tx = int((lon + 180.0) / 360.0 * n)
    lat_r = math.radians(lat)
    ty = int((1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n)
    feat = {
        "geometry": {"type": "Point", "coordinates": [lon, lat]},
        "properties": {},
    }
    layers = decode_tile(encode_layer("p", [feat], z, tx, ty))
    (f,) = layers[0]["features"]
    assert f["geometry"][0]["points"] == [
        lonlat_to_tile_px(lon, lat, z, tx, ty)
    ]


@given(
    st.lists(
        st.integers(min_value=-(2**53), max_value=2**53),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None)
def test_duck_xxhash64_matches_python_reference(vals):
    """The HUGEINT CTE chain equals a pure-Python XXH64 reference for
    arbitrary signed longs (negatives exercise the two's-complement
    normalization)."""
    import duckdb

    from map_v2_etl_spark.plans.duck_vec import xxhash64_ctes

    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def ref(v):
        u = v & M
        k1 = (u * P2) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * P1) & M
        h = (42 + P5 + 8) & M
        h ^= k1
        h = (rotl(h, 27) * P1 + P4) & M
        h ^= h >> 33
        h = (h * P2) & M
        h ^= h >> 29
        h = (h * P3) & M
        h ^= h >> 32
        return h - (1 << 64) if h >= 1 << 63 else h

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got = dict(
        con.sql(
            f"WITH {xxhash64_ctes('hx', 't', keep='vec_id')} "
            "SELECT vec_id, h FROM hx"
        ).fetchall()
    )
    assert got == {v: ref(v) for v in vals}


@given(
    st.lists(
        st.floats(-1.0, 1.0, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None)
def test_duck_dec_mean_matches_decimal_reference(xs):
    """dec_mean (the HUGEINT HALF_UP pipeline) equals the Python
    decimal reference float(avg(Decimal(x).quantize(1e-12)))."""
    import decimal

    import duckdb

    from map_v2_etl_spark.plans.duck_vec import dec_mean

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    (got,) = con.sql(f"SELECT {dec_mean('x')} AS m FROM t").fetchone()

    q12 = decimal.Decimal(1).scaleb(-12)
    total = sum(
        decimal.Decimal(repr(x)).quantize(
            q12, rounding=decimal.ROUND_HALF_UP
        )
        for x in xs
    )
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        mean16 = (total / len(xs)).quantize(
            decimal.Decimal(1).scaleb(-16), rounding=decimal.ROUND_HALF_UP
        )
    assert got == float(mean16)


@given(
    st.lists(
        st.floats(-1.0, 1.0, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None)
def test_duck_dec_mean12_matches_decimal_reference(xs):
    """dec_mean12 (the PQ-training twin: avg over the 1e-12 grid, cast
    BACK onto the grid) equals the Python decimal reference — the same
    shortest-repr HALF_UP quantize net that caught dec_mean's ulp-edge
    divergence at r15, extended to the second builder."""
    import decimal

    import duckdb

    from map_v2_etl_spark.plans.duck_vec import dec_mean12

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    (got,) = con.sql(f"SELECT {dec_mean12('x')} AS m FROM t").fetchone()

    q12 = decimal.Decimal(1).scaleb(-12)
    total = sum(
        decimal.Decimal(repr(x)).quantize(
            q12, rounding=decimal.ROUND_HALF_UP
        )
        for x in xs
    )
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        mean16 = (total / len(xs)).quantize(
            decimal.Decimal(1).scaleb(-16), rounding=decimal.ROUND_HALF_UP
        )
        mean12 = mean16.quantize(q12, rounding=decimal.ROUND_HALF_UP)
    assert got == float(mean12)


@given(
    st.lists(
        st.floats(-1.0, 1.0, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None)
def test_quantize_e12_matches_duck_emission(xs):
    """The engine's vectorized local twin _quantize_e12 and the oracle
    emissions' VARCHAR-routed CAST(... AS DECIMAL(27,12)) agree element
    for element — the _quantize_e12 <-> emission pair the r15 verdict
    asked to pin. Both must model Spark's shortest-repr HALF_UP cast;
    a drift on either side shows up here before it can skew a k-means/
    PQ oracle."""
    import duckdb
    import numpy as np

    from map_v2_etl_spark.operators.similarity import _quantize_e12
    from map_v2_etl_spark.plans.duck_vec import _dec12

    local = _quantize_e12(np.array(xs, dtype=np.float64))

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(xs))
    )
    duck = dict(
        con.sql(
            f"SELECT i, CAST({_dec12('x')} "
            "* 1000000000000 AS HUGEINT) FROM t"
        ).fetchall()
    )
    for i, x in enumerate(xs):
        assert int(local[i]) == int(duck[i]), (i, x)


def test_tile_span_matches_python_reference(spark):
    """_with_tile_span's buffered, clamped tile ranges (Spark column
    math) equal an independent pure-Python computation for a seeded
    random batch of bboxes — guards the Mercator + buffer-expansion
    arithmetic against silent drift."""
    import json
    import random

    from map_v2_etl_spark.sources.mvt import EXTENT as EXT
    from map_v2_etl_spark.sources.mvt import _with_tile_span

    rng = random.Random(42)
    zoom, buf = 7, 64
    rows = []
    for i in range(300):
        lon = -179.5 + rng.random() * 359.0
        lat = -84.0 + rng.random() * 168.0
        dlon = rng.random() * 2.0
        dlat = rng.random() * 2.0
        ring = [[lon, lat], [min(lon + dlon, 180.0), lat],
                [min(lon + dlon, 180.0), min(lat + dlat, 85.0)],
                [lon, min(lat + dlat, 85.0)], [lon, lat]]
        rows.append(
            (i, json.dumps({"type": "Polygon", "coordinates": [ring]}))
        )
    feats = spark.createDataFrame(rows, "i LONG, geometry STRING")
    got = {
        r["i"]: (r["_x0"], r["_x1"], r["_y0"], r["_y1"])
        for r in _with_tile_span(feats, "geometry", zoom, buf).collect()
    }

    def frac(lon, lat):
        n = float(2 ** zoom)
        xf = (lon + 180.0) / 360.0 * n
        lr = math.radians(lat)
        yf = (1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr))
              / math.pi) / 2.0 * n
        return xf, yf

    bt = buf / float(EXT)
    nmax = 2 ** zoom - 1
    clamp = lambda v: max(0, min(int(math.floor(v)), nmax))  # noqa: E731
    for i, g in rows:
        ring = json.loads(g)["coordinates"][0]
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        xf0, yf_big = frac(min(xs), min(ys))
        xf1, yf_small = frac(max(xs), max(ys))
        want = (
            clamp(xf0 - bt), clamp(xf1 + bt),
            clamp(yf_small - bt), clamp(yf_big + bt),
        )
        assert got[i] == want, (i, got[i], want)
        assert got[i][0] <= got[i][1] and got[i][2] <= got[i][3]


# ---------------------------------------------------------------------------
# geometry fixtures tippecanoe's --detect-shared-borders cases exercise
# (build.sh:148-152): holes, shared borders, antimeridian-split parts
# ---------------------------------------------------------------------------


def _rings_of(feature):
    """Decoded command stream -> list of rings (each a list of (x, y))."""
    rings, cur = [], []
    for seg in feature["geometry"]:
        if seg["cmd"] == "move":
            cur = list(seg["points"])
        elif seg["cmd"] == "line":
            cur.extend(seg["points"])
        elif seg["cmd"] == "close":
            if cur:
                rings.append(cur)
            cur = []
    return rings


def _shoelace2(pts):
    return sum(
        x1 * y2 - x2 * y1
        for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1])
    )


def test_multipolygon_hole_winding_roundtrip():
    """A MultiPolygon with an interior ring must decode to positive-area
    exterior rings and a negative-area hole (MVT 4.3.4.4) regardless of
    the winding the GeoJSON arrived with (both rings here arrive in the
    SAME orientation — the encoder must rewind the hole)."""
    import json as _json

    geom = {
        "type": "MultiPolygon",
        "coordinates": [
            [   # poly 1: outer ring + hole, both given CCW lon/lat
                [[-60, -30], [0, -30], [0, 30], [-60, 30], [-60, -30]],
                [[-45, -15], [-15, -15], [-15, 15], [-45, 15], [-45, -15]],
            ],
            [   # poly 2: plain square
                [[30, -20], [80, -20], [80, 20], [30, 20], [30, -20]],
            ],
        ],
    }
    feats = [{"geometry": _json.dumps(geom), "props": {"GEOID": "02"},
              "id": 2}]
    blob = encode_layer("mp", feats, 0, 0, 0)
    (lyr,) = decode_tile(blob)
    (f,) = lyr["features"]
    assert f["type"] == 3
    rings = _rings_of(f)
    assert len(rings) == 3
    signs = [(_shoelace2(r) > 0) - (_shoelace2(r) < 0) for r in rings]
    # ring order is [poly1-ext, poly1-hole, poly2-ext]: + - +
    assert signs == [1, -1, 1], signs
    # the hole must be contained in the first exterior's bbox
    ext_xs = [p[0] for p in rings[0]]
    hole_xs = [p[0] for p in rings[1]]
    assert min(ext_xs) < min(hole_xs) <= max(hole_xs) < max(ext_xs)


def test_shared_border_polygons_quantize_identically():
    """Two polygons sharing an edge must emit the SAME quantized
    coordinates for the shared border — the no-crack invariant
    tippecanoe's --detect-shared-borders preserves. Quantization is
    per-vertex and deterministic, so identical input vertices must
    produce identical tile coords in both features."""
    import json as _json

    left = {"type": "Polygon", "coordinates": [
        [[-10, -10], [0.0003, -10], [0.0003, 10], [-10, 10], [-10, -10]],
    ]}
    right = {"type": "Polygon", "coordinates": [
        [[0.0003, -10], [10, -10], [10, 10], [0.0003, 10], [0.0003, -10]],
    ]}
    feats = [
        {"geometry": _json.dumps(left), "props": {"GEOID": "L"}, "id": 1},
        {"geometry": _json.dumps(right), "props": {"GEOID": "R"}, "id": 2},
    ]
    blob = encode_layer("border", feats, 0, 0, 0)
    (lyr,) = decode_tile(blob)
    assert len(lyr["features"]) == 2
    by_id = {f["id"]: _rings_of(f)[0] for f in lyr["features"]}
    shared_l = {p for p in by_id[1]}
    shared_r = {p for p in by_id[2]}
    # the two border vertices appear in BOTH features at identical
    # integer coords (no T-junction / crack from divergent rounding)
    border = shared_l & shared_r
    assert len(border) == 2, (shared_l, shared_r)


def test_antimeridian_split_parts_land_in_their_own_tiles(spark):
    """An Aleutians-shaped MultiPolygon (parts on BOTH sides of the
    antimeridian, split per RFC 7946) has a bbox spanning nearly the
    whole world. The encoder may assign it to every tile the bbox
    overlaps, but clipping must keep actual geometry only where parts
    exist — no tile in the middle of the row may contain a world-wide
    inverted fill."""
    import json as _json

    from map_v2_etl_spark.sources.mvt import encode_tiles

    geom = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[175, 50], [179.9, 50], [179.9, 55], [175, 55], [175, 50]]],
            [[[-179.9, 50], [-175, 50], [-175, 55], [-179.9, 55],
              [-179.9, 50]]],
        ],
    }
    feats = spark.createDataFrame(
        [("akl", "02", _json.dumps(geom))],
        "layer STRING, GEOID STRING, geometry STRING",
    )
    Z = 3  # 8x8 tiles; lat 50-55N sits in tile row y=2
    tiles = {
        (r["x"], r["y"]): bytes(r["pbf"])
        for r in encode_tiles(feats, Z, clip_buf=8).collect()
    }
    with_geom = set()
    for (x, y), blob in tiles.items():
        for lyr in decode_tile(blob):
            for f in lyr["features"]:
                rings = [
                    r for r in _rings_of(f) if abs(_shoelace2(r)) > 0
                ]
                if rings:
                    with_geom.add((x, y))
                    # every surviving ring must be exterior-wound and
                    # smaller than the tile itself (no inverted world
                    # fill leaking through the clip)
                    for r in rings:
                        assert _shoelace2(r) > 0
                        assert abs(_shoelace2(r)) < 2 * EXTENT * EXTENT
    # west part lives near lon 175..180 -> tile x=7; east part near
    # -180..-175 -> tile x=0; both in row y=2 at z3
    assert (7, 2) in with_geom and (0, 2) in with_geom
    # no phantom fill in mid-row tiles the bbox overlapped
    for x in range(1, 7):
        assert (x, 2) not in with_geom, f"phantom geometry in tile {x},2"
