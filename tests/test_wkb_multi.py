"""Multi-geometry WKB kernel tests: roundtrips, dimensional promotion in
centroids (GEOS-compatible), GeoJSON forms — the docstring claims of
functions/wkb.py exercised directly."""

from __future__ import annotations

import json
import math

from overturemaps_duckdb_spark.functions import wkb


def _poly(x0, y0, s):
    return wkb.box(x0, y0, x0 + s, y0 + s)


def test_multipolygon_roundtrip_area_centroid():
    a, b = _poly(0, 0, 2), _poly(10, 0, 2)
    mp = wkb.Geometry("MULTIPOLYGON", [a, b])
    back = wkb.loads(wkb.dumps(mp))
    assert wkb.geom_type(back) == "MULTIPOLYGON"
    assert math.isclose(wkb.area(back), 8.0)
    lon, lat = wkb.centroid(back)
    assert math.isclose(lon, 6.0) and math.isclose(lat, 1.0)


def test_multipoint_and_multilinestring_roundtrip():
    mpt = wkb.Geometry("MULTIPOINT", [wkb.point(1, 2), wkb.point(3, 4)])
    back = wkb.loads(wkb.dumps(mpt))
    assert wkb.geom_type(back) == "MULTIPOINT"
    lon, lat = wkb.centroid(back)
    assert (lon, lat) == (2.0, 3.0)

    line = wkb.Geometry("LINESTRING", [(0.0, 0.0), (4.0, 0.0)])
    line2 = wkb.Geometry("LINESTRING", [(0.0, 2.0), (4.0, 2.0)])
    ml = wkb.Geometry("MULTILINESTRING", [line, line2])
    back = wkb.loads(wkb.dumps(ml))
    assert wkb.geom_type(back) == "MULTILINESTRING"
    lon, lat = wkb.centroid(back)
    assert math.isclose(lon, 2.0) and math.isclose(lat, 1.0)


def test_collection_dimensional_promotion():
    """GEOS semantics: in a mixed collection only the highest-dimension
    members contribute to the centroid (wkb.centroid docstring)."""
    gc = wkb.Geometry(
        "GEOMETRYCOLLECTION",
        [wkb.point(100.0, 100.0), _poly(0, 0, 2)],  # point must be ignored
    )
    back = wkb.loads(wkb.dumps(gc))
    assert wkb.geom_type(back) == "GEOMETRYCOLLECTION"
    lon, lat = wkb.centroid(back)
    assert math.isclose(lon, 1.0) and math.isclose(lat, 1.0)
    assert math.isclose(wkb.area(back), 4.0)


def test_geojson_multi_forms():
    mp = wkb.Geometry("MULTIPOLYGON", [_poly(0, 0, 1)])
    gj = json.loads(wkb.as_geojson(mp))
    assert gj["type"] == "MultiPolygon"
    assert len(gj["coordinates"]) == 1

    gc = wkb.Geometry("GEOMETRYCOLLECTION", [wkb.point(1, 2)])
    gj = json.loads(wkb.as_geojson(gc))
    assert gj["type"] == "GeometryCollection"
    assert gj["geometries"][0]["type"] == "Point"


def test_polygon_with_hole_area_and_containment():
    outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    hole = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    poly = wkb.Geometry("POLYGON", [outer, hole])
    back = wkb.loads(wkb.dumps(poly))
    assert math.isclose(wkb.area(back), 100.0 - 4.0)
    # point inside the hole does NOT intersect; point in the ring does
    assert not wkb.intersects(wkb.point(5.0, 5.0), back)
    assert wkb.intersects(wkb.point(2.0, 2.0), back)


def test_ewkb_zm_flag_combination():
    """EWKB with BOTH Z and M flags ⇒ 4 ordinates per point; the two flags
    are additive, not alternatives (ADVICE r1: each flag check used to set
    dims=3 so ZM coordinates were read misaligned)."""
    import struct

    def ewkb_point(x, y, flags, *extra):
        return (
            b"\x01"
            + struct.pack("<I", 1 | flags)
            + struct.pack("<" + "d" * (2 + len(extra)), x, y, *extra)
        )

    Z, M = 0x80000000, 0x40000000
    g = wkb.loads(ewkb_point(1.5, 2.5, Z | M, 9.0, 8.0))
    assert g.kind == "POINT" and g.coords == (1.5, 2.5)
    # single flags still parse as 3 ordinates
    assert wkb.loads(ewkb_point(3.0, 4.0, Z, 9.0)).coords == (3.0, 4.0)
    assert wkb.loads(ewkb_point(5.0, 6.0, M, 9.0)).coords == (5.0, 6.0)
    # ISO ZM (type 3001) unchanged
    iso = b"\x01" + struct.pack("<I", 3001) + struct.pack("<dddd", 7.0, 8.0, 1.0, 2.0)
    assert wkb.loads(iso).coords == (7.0, 8.0)


def test_vectorized_fastpaths_bit_identical():
    """geo.py's numpy fast paths must be BIT-identical to the scalar kernel:
    same packing for constructors, same unrolled shoelace for box
    centroid/area (accumulation order matters for float identity)."""
    import random

    import numpy as np
    import pandas as pd

    from overturemaps_duckdb_spark.functions import geo

    rng = random.Random(3)
    boxes = []
    for _ in range(200):
        x0 = rng.uniform(-180, 180)
        y0 = rng.uniform(-85, 85)
        w, h = rng.uniform(1e-4, 2.0), rng.uniform(1e-4, 2.0)
        boxes.append((x0, y0, x0 + w, y0 + h))
    # constructor packing
    for x0, y0, x1, y1 in boxes[:50]:
        assert wkb.dumps(wkb.box(x0, y0, x1, y1))[:13] == geo._BOX_HDR
    series = pd.Series(
        [wkb.dumps(wkb.box(*bx)) for bx in boxes], dtype="object"
    )
    assert geo._is_uniform(series, geo._BOX_HDR, geo._BOX_LEN)
    x, y = geo._box_ring(series)
    area, cenx, ceny = geo._box_shoelace(x, y)
    for i, bx in enumerate(boxes):
        g = wkb.loads(series[i])
        kx, ky = wkb.centroid(g)
        assert cenx[i] == kx and ceny[i] == ky, f"centroid drift row {i}"
        assert abs(area[i]) == wkb.area(g), f"area drift row {i}"
    # point decode path
    pts = pd.Series(
        [wkb.dumps(wkb.point(bx[0], bx[1])) for bx in boxes], dtype="object"
    )
    cols = geo._f8cols(pts, geo._PT_LEN, 5)
    assert np.all(cols[:, 0] == np.array([b[0] for b in boxes]))
    assert np.all(cols[:, 1] == np.array([b[1] for b in boxes]))


def test_distance_intersects_fastpaths_bit_identical():
    """st_distance point-point and st_intersects point-box fast paths must
    agree with the scalar kernel on every value, including boundary points."""
    import random

    import numpy as np
    import pandas as pd

    from overturemaps_duckdb_spark.functions import geo

    rng = random.Random(11)
    pts_a, pts_b, boxes = [], [], []
    for i in range(300):
        x, y = rng.uniform(-180, 180), rng.uniform(-85, 85)
        pts_a.append((x, y))
        pts_b.append((x + rng.uniform(-0.3, 0.3), y + rng.uniform(-0.3, 0.3)))
        if i % 3 == 0:  # boundary-exact cases: point on box edge/corner
            boxes.append((x, y, x + 0.25, y + 0.25))
        else:
            boxes.append((x + rng.uniform(-0.4, 0.1), y + rng.uniform(-0.4, 0.1),
                          x + rng.uniform(0.1, 0.4), y + rng.uniform(0.1, 0.4)))
    sa = pd.Series([wkb.dumps(wkb.point(*p)) for p in pts_a], dtype="object")
    sb = pd.Series([wkb.dumps(wkb.point(*p)) for p in pts_b], dtype="object")
    sbox = pd.Series([wkb.dumps(wkb.box(*b)) for b in boxes], dtype="object")
    # distance: vectorized vs kernel
    pa = geo._f8cols(sa, geo._PT_LEN, 5)
    pb = geo._f8cols(sb, geo._PT_LEN, 5)
    dx, dy = pa[:, 0] - pb[:, 0], pa[:, 1] - pb[:, 1]
    fast = np.sqrt(dx * dx + dy * dy)
    for i in range(len(pts_a)):
        k = wkb.distance(wkb.loads(sa[i]), wkb.loads(sb[i]))
        assert fast[i] == k, f"distance drift row {i}"
    # intersects: vectorized box containment vs kernel ray-cast
    x, y = geo._box_ring(sbox)
    xmin, xmax = x.min(axis=1), x.max(axis=1)
    ymin, ymax = y.min(axis=1), y.max(axis=1)
    hit = (pa[:, 0] >= xmin) & (pa[:, 0] <= xmax) & (pa[:, 1] >= ymin) & (pa[:, 1] <= ymax)
    for i in range(len(pts_a)):
        k = wkb.intersects(wkb.loads(sa[i]), wkb.loads(sbox[i]))
        assert bool(hit[i]) == k, f"intersects drift row {i}"


# ---------------------------------------------------------------------------
# general polygon overlay (Greiner–Hormann)
# ---------------------------------------------------------------------------


def _ring_poly(*pts):
    from overturemaps_duckdb_spark.functions.wkb import Geometry

    r = list(pts)
    if r[0] != r[-1]:
        r.append(r[0])
    return Geometry("POLYGON", [r])


def test_overlay_concave_concave_area():
    """U-shape ∩ T-shape: only the T's stem inside the U's cavity walls
    survives — hand-computed area 1.0."""
    from overturemaps_duckdb_spark.functions.wkb import area, intersection

    u = _ring_poly((0, 0), (6, 0), (6, 4), (4, 4), (4, 2), (2, 2), (2, 4), (0, 4))
    t = _ring_poly((2.5, 1), (3.5, 1), (3.5, 5), (5, 5), (5, 6), (1, 6), (1, 5), (2.5, 5))
    g = intersection(u, t)
    assert g is not None and abs(area(g) - 1.0) < 1e-9


def test_overlay_multi_component():
    """Comb teeth through a bar: four disjoint pieces must come back as a
    MULTIPOLYGON (Sutherland–Hodgman would fuse them through zero-width
    corridors), total area exact."""
    from overturemaps_duckdb_spark.functions.wkb import area, intersection

    comb = _ring_poly((0, 0), (7, 0), (7, 1), (0, 1))
    teeth = _ring_poly(
        (0.5, -1), (1.5, -1), (1.5, 2), (2.5, 2), (2.5, -1), (3.5, -1), (3.5, 2),
        (4.5, 2), (4.5, -1), (5.5, -1), (5.5, 2), (6.5, 2), (6.5, -1), (6.8, -1),
        (6.8, 3), (0.2, 3),
    )
    g = intersection(comb, teeth)
    assert g.kind == "MULTIPOLYGON" and len(g.coords) == 4
    assert abs(area(g) - 3.4125) < 1e-9


def test_overlay_degenerate_shared_boundary():
    """Identical boxes share every edge — the perturbation fallback must
    resolve it to (essentially) the box itself."""
    from overturemaps_duckdb_spark.functions.wkb import area, intersection

    a = _ring_poly((0, 0), (4, 0), (4, 4), (0, 4))
    b = _ring_poly((0, 0), (4, 0), (4, 4), (0, 4))
    g = intersection(a, b)
    assert g is not None and abs(area(g) - 16.0) < 1e-6


def test_overlay_matches_convex_clip_areas():
    """Randomized: concave staircase ∩ convex k-gon — GH area must equal the
    Sutherland–Hodgman area (exact for a convex clip; corridor artifacts
    cancel in the shoelace)."""
    import math
    import random

    from overturemaps_duckdb_spark.functions.wkb import (
        _clip_polygon, _overlay_intersection, _ring_area,
    )

    rng = random.Random(7)
    for _ in range(40):
        xs = sorted(rng.uniform(0, 10) for _ in range(3))
        stair = [
            (0, 0), (10, 0), (10, 3), (xs[2], 3), (xs[2], 6), (xs[1], 6),
            (xs[1], 8), (xs[0], 8), (xs[0], 10), (0, 10),
        ]
        cx, cy, r = rng.uniform(1, 9), rng.uniform(1, 9), rng.uniform(1.5, 5)
        n = rng.choice([3, 4, 5])
        ph = rng.uniform(0, 6.28)
        clip = [
            (cx + r * math.cos(ph + 2 * math.pi * i / n),
             cy + r * math.sin(ph + 2 * math.pi * i / n))
            for i in range(n)
        ]
        stair_c, clip_c = stair + [stair[0]], clip + [clip[0]]
        sh = _clip_polygon(stair, clip_c)
        sh_area = abs(_ring_area(sh + [sh[0]])) if len(sh) >= 3 else 0.0
        rings = _overlay_intersection(stair_c, clip_c)
        gh_area = sum(abs(_ring_area(rr + [rr[0]])) for rr in rings)
        assert abs(gh_area - sh_area) <= 1e-6 * max(1.0, sh_area)


def test_multipolygon_intersection_overlay():
    """r8 review fix: MULTIPOLYGON operands used to fall through to
    `return None` even when genuinely overlapping (Overture emits
    multipolygon footprints).  A valid multipolygon's parts are disjoint,
    so the overlay is the union of pairwise part intersections."""
    mp = wkb.Geometry("MULTIPOLYGON", [_poly(0, 0, 2), _poly(10, 0, 2)])
    big = wkb.box(-1, -1, 13, 1)  # clips the lower half of both parts
    out = wkb.intersection(mp, big)
    assert out is not None
    assert wkb.geom_type(out) == "MULTIPOLYGON"
    assert math.isclose(wkb.area(out), 4.0)  # 2x2 halves: 2.0 + 2.0
    # symmetric operand order
    out2 = wkb.intersection(big, mp)
    assert out2 is not None and math.isclose(wkb.area(out2), 4.0)
    # multi x multi
    mp2 = wkb.Geometry("MULTIPOLYGON", [wkb.box(-1, -1, 13, 1)])
    out3 = wkb.intersection(mp, mp2)
    assert out3 is not None and math.isclose(wkb.area(out3), 4.0)
    # single overlapping part → plain POLYGON, matches the poly x poly path
    one = wkb.intersection(mp, wkb.box(1, 1, 3, 3))
    ref = wkb.intersection(_poly(0, 0, 2), wkb.box(1, 1, 3, 3))
    assert wkb.dumps(one) == wkb.dumps(ref)
    # disjoint multipolygon → None, unchanged
    assert wkb.intersection(mp, wkb.box(5, 5, 6, 6)) is None


def test_empty_geometry_centroid_is_none():
    """r8 review fix: empty collections/multiparts parse to zero members;
    centroid() used to crash on max()/division instead of yielding the
    NULL the Arrow batch needs."""
    for kind in ("MULTIPOLYGON", "MULTIPOINT", "GEOMETRYCOLLECTION"):
        empty = wkb.loads(wkb.dumps(wkb.Geometry(kind, [])))
        assert wkb.centroid(empty) is None
    # all-empty linestrings exercise the point-fallback guard
    mls = wkb.Geometry("MULTILINESTRING", [wkb.Geometry("LINESTRING", [])])
    assert wkb.centroid(mls) is None


def test_empty_primitives_never_crash_kernels():
    """r9 review: the r8 centroid-on-empty fix generalized.  POLYGON EMPTY
    (zero rings) and LINESTRING EMPTY (zero points) are legal WKB; before
    this, intersects() IndexError'd on the missing exterior ring, bbox()
    raised on min([]), and distance() fell through to its +inf seed —
    each failing (or silently corrupting) a whole Arrow batch for one
    empty row.  GEOS semantics: intersects=false, distance=NULL."""
    import struct

    empty_poly = wkb.loads(b"\x01" + struct.pack("<II", 3, 0))
    empty_line = wkb.loads(b"\x01" + struct.pack("<II", 2, 0))
    empty_multi = wkb.loads(b"\x01" + struct.pack("<II", 6, 0))
    pt = wkb.point(1.0, 2.0)
    box = wkb.box(0.0, 0.0, 4.0, 4.0)

    for g in (empty_poly, empty_line, empty_multi):
        assert g.geometries() == []
        assert wkb.bbox(g) is None
        assert wkb.centroid(g) is None
        assert wkb.area(g) == 0.0
        assert wkb.intersects(g, pt) is False
        assert wkb.intersects(box, g) is False
        assert wkb.distance(g, pt) is None
        assert wkb.distance(box, g) is None
        assert wkb.intersection(g, box) is None

    # non-empty behavior unchanged
    assert wkb.distance(pt, wkb.point(4.0, 6.0)) == 5.0
    assert wkb.intersects(pt, box) is True


def test_degenerate_single_point_linestring_no_crash():
    """r12 review: a 1-point LINESTRING has no segments — distance used to
    ValueError (min of empty generator) and intersects answered False for
    a point lying ON it.  Both must behave as the point itself."""
    from overturemaps_duckdb_spark.functions import wkb

    one_pt_line = wkb.Geometry("LINESTRING", [(1.0, 2.0)])
    pt_on = wkb.point(1.0, 2.0)
    pt_off = wkb.point(4.0, 6.0)
    assert wkb.intersects(one_pt_line, pt_on) is True
    assert wkb.intersects(pt_on, one_pt_line) is True
    assert wkb.distance(pt_off, one_pt_line) == 5.0
    assert wkb.distance(one_pt_line, pt_off) == 5.0
    # vs a real linestring: the vertex sits on the segment
    seg = wkb.Geometry("LINESTRING", [(0.0, 2.0), (2.0, 2.0)])
    assert wkb.intersects(one_pt_line, seg) is True
    assert wkb.distance(one_pt_line, wkb.Geometry("LINESTRING", [(1.0, 5.0), (1.0, 9.0)])) == 3.0


def test_degenerate_one_point_ring_polygon_no_crash():
    from overturemaps_duckdb_spark.functions import wkb

    degen_poly = wkb.Geometry("POLYGON", [[(1.0, 1.0)]])
    assert wkb.distance(wkb.point(4.0, 5.0), degen_poly) == 5.0
    assert wkb.intersects(degen_poly, wkb.point(1.0, 1.0)) is True
    assert wkb.intersects(degen_poly, wkb.point(2.0, 1.0)) is False
