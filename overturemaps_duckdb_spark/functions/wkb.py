"""Pure-Python WKB geometry kernel.

The reference leans on DuckDB's `spatial` extension (GEOS under the hood) for
six scalar functions (SURVEY §2.2 G1-G6: ST_GeometryType, ST_Centroid+X/Y,
ST_AsGeoJSON, ST_Intersects, ST_Distance, ST_Intersection — loaded at
`/root/reference/src/lib/duckdb.js:17`, used from `query.js:39-42`,
`pipeline.js:128-137`, `analysisQueries.js:27-46`).  This module implements
the same planar (lon/lat-degree) semantics on raw WKB buffers with no native
dependency, so it can ship inside Arrow-batched pandas UDFs to any executor.

Coordinates are 2-D; geometries are planar (the reference works in degrees
and converts meters via d/111320 — pipeline.js:128).  Supported types cover
everything Overture emits: Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon, GeometryCollection.
"""

from __future__ import annotations

import json
import math
import struct
from dataclasses import dataclass

_WKB_TYPES = {
    1: "POINT",
    2: "LINESTRING",
    3: "POLYGON",
    4: "MULTIPOINT",
    5: "MULTILINESTRING",
    6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}
_TYPE_CODES = {v: k for k, v in _WKB_TYPES.items()}


@dataclass
class Geometry:
    """Parsed geometry: ``kind`` is the uppercase WKB name; ``coords`` is
    - POINT: (x, y)
    - LINESTRING: [(x, y), ...]
    - POLYGON: [ring, ...] where ring = [(x, y), ...] (first = exterior)
    - MULTI*/GEOMETRYCOLLECTION: [Geometry, ...]
    """

    kind: str
    coords: object

    # -- convenience ---------------------------------------------------
    def geometries(self) -> list["Geometry"]:
        """Flatten to a list of primitive geometries."""
        if self.kind in ("POINT", "LINESTRING", "POLYGON"):
            return [self]
        out: list[Geometry] = []
        for g in self.coords:
            out.extend(g.geometries())
        return out


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self) -> Geometry:
        byte_order = self.buf[self.pos]
        self.pos += 1
        fmt = "<" if byte_order == 1 else ">"
        (type_code,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
        self.pos += 4
        # mask off Z/M/SRID flags (EWKB / ISO): keep the base type
        has_srid = bool(type_code & 0x20000000)
        base = type_code & 0xFF
        # EWKB flags are additive (Z|M ⇒ ZM, 4 ordinates); ISO encodes the
        # dimensionality in the thousands digit instead
        dims = 2 + bool(type_code & 0x80000000) + bool(type_code & 0x40000000)
        iso = type_code & 0x1FFFFFFF
        if 1000 <= iso < 3000:
            dims = 3  # ISO Z (1000s) or M (2000s) — one extra ordinate
        elif 3000 <= iso < 4000:
            dims = 4  # ISO ZM
        if base > 7:
            base = (type_code & 0x1FFFFFFF) % 1000
        if has_srid:
            self.pos += 4
        kind = _WKB_TYPES[base]
        if kind == "POINT":
            vals = struct.unpack_from(fmt + "d" * dims, self.buf, self.pos)
            self.pos += 8 * dims
            return Geometry("POINT", (vals[0], vals[1]))
        if kind == "LINESTRING":
            return Geometry("LINESTRING", self._points(fmt, dims))
        if kind == "POLYGON":
            (nrings,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            return Geometry("POLYGON", [self._points(fmt, dims) for _ in range(nrings)])
        # multi / collection
        (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
        self.pos += 4
        return Geometry(kind, [self.geometry() for _ in range(n)])

    def _points(self, fmt: str, dims: int) -> list[tuple[float, float]]:
        (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
        self.pos += 4
        vals = struct.unpack_from(fmt + "d" * (dims * n), self.buf, self.pos)
        self.pos += 8 * dims * n
        return [(vals[i * dims], vals[i * dims + 1]) for i in range(n)]


def loads(buf: bytes | bytearray | memoryview) -> Geometry:
    return _Reader(bytes(buf)).geometry()


def dumps(g: Geometry) -> bytes:
    """Serialize to little-endian 2-D WKB."""
    out = bytearray()
    _write(g, out)
    return bytes(out)


def _write(g: Geometry, out: bytearray) -> None:
    out.append(1)
    out += struct.pack("<I", _TYPE_CODES[g.kind])
    if g.kind == "POINT":
        out += struct.pack("<dd", *g.coords)
    elif g.kind == "LINESTRING":
        out += struct.pack("<I", len(g.coords))
        for x, y in g.coords:
            out += struct.pack("<dd", x, y)
    elif g.kind == "POLYGON":
        out += struct.pack("<I", len(g.coords))
        for ring in g.coords:
            out += struct.pack("<I", len(ring))
            for x, y in ring:
                out += struct.pack("<dd", x, y)
    else:
        out += struct.pack("<I", len(g.coords))
        for sub in g.coords:
            _write(sub, out)


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------


def point(x: float, y: float) -> Geometry:
    return Geometry("POINT", (x, y))


def box(xmin: float, ymin: float, xmax: float, ymax: float) -> Geometry:
    """Axis-aligned rectangle as a CCW closed polygon."""
    ring = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]
    return Geometry("POLYGON", [ring])


# ---------------------------------------------------------------------------
# G1 geometry type / G2 centroid / bbox
# ---------------------------------------------------------------------------


def geom_type(g: Geometry) -> str:
    return g.kind


def bbox(g: Geometry) -> tuple[float, float, float, float]:
    xs: list[float] = []
    ys: list[float] = []
    _collect_coords(g, xs, ys)
    return (min(xs), min(ys), max(xs), max(ys))


def _collect_coords(g: Geometry, xs: list, ys: list) -> None:
    if g.kind == "POINT":
        xs.append(g.coords[0])
        ys.append(g.coords[1])
    elif g.kind == "LINESTRING":
        for x, y in g.coords:
            xs.append(x)
            ys.append(y)
    elif g.kind == "POLYGON":
        for x, y in g.coords[0]:  # bbox of exterior ring suffices
            xs.append(x)
            ys.append(y)
    else:
        for sub in g.coords:
            _collect_coords(sub, xs, ys)


def centroid(g: Geometry) -> tuple[float, float]:
    """Planar centroid with GEOS-compatible dimensional promotion: for mixed
    collections only the highest-dimension members contribute."""
    prims = g.geometries()
    best_dim = max(_dim(p) for p in prims)
    members = [p for p in prims if _dim(p) == best_dim]
    if best_dim == 2:
        ax = ay = aw = 0.0
        for p in members:
            (cx, cy), w = _polygon_centroid(p.coords)
            ax += cx * w
            ay += cy * w
            aw += w
        if aw != 0.0:
            return (ax / aw, ay / aw)
        best_dim = 1  # degenerate polygons → fall back to boundary length
        members = [Geometry("LINESTRING", r) for p in members for r in p.coords]
    if best_dim == 1:
        ax = ay = aw = 0.0
        for p in members:
            pts = p.coords
            for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
                seg = math.hypot(x2 - x1, y2 - y1)
                ax += (x1 + x2) / 2 * seg
                ay += (y1 + y2) / 2 * seg
                aw += seg
        if aw != 0.0:
            return (ax / aw, ay / aw)
        members = [Geometry("POINT", p.coords[0]) for p in members if p.coords]
    n = len(members)
    return (sum(p.coords[0] for p in members) / n, sum(p.coords[1] for p in members) / n)


def _dim(g: Geometry) -> int:
    return {"POINT": 0, "LINESTRING": 1, "POLYGON": 2}[g.kind]


def _polygon_centroid(rings) -> tuple[tuple[float, float], float]:
    """(centroid, signed-ish weight) of a polygon with holes."""
    ax = ay = total = 0.0
    for i, ring in enumerate(rings):
        a = _ring_area(ring)
        (cx, cy) = _ring_centroid(ring, a)
        w = abs(a) * (1 if i == 0 else -1)
        ax += cx * w
        ay += cy * w
        total += w
    if total == 0.0:
        return ((0.0, 0.0), 0.0)
    return ((ax / total, ay / total), total)


def _ring_area(ring) -> float:
    # shoelace about the first vertex: small rings far from the origin would
    # otherwise lose all precision to x·y cancellation (a 0.004° box at
    # lon 180 has |x·y| ≈ 3e4 against a true area of ~1e-5)
    if len(ring) < 2:
        return 0.0
    x0, y0 = ring[0]
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    return s / 2.0


def _ring_centroid(ring, area: float) -> tuple[float, float]:
    if area == 0.0:
        n = max(len(ring) - 1, 1)
        return (sum(p[0] for p in ring[:n]) / n, sum(p[1] for p in ring[:n]) / n)
    # local-origin shoelace centroid (translate → accumulate → translate back)
    x0, y0 = ring[0]
    cx = cy = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        u1, v1, u2, v2 = x1 - x0, y1 - y0, x2 - x0, y2 - y0
        cross = u1 * v2 - u2 * v1
        cx += (u1 + u2) * cross
        cy += (v1 + v2) * cross
    return (x0 + cx / (6.0 * area), y0 + cy / (6.0 * area))


def area(g: Geometry) -> float:
    """Planar area (polygons only contribute; holes subtract)."""
    total = 0.0
    for p in g.geometries():
        if p.kind == "POLYGON":
            for i, ring in enumerate(p.coords):
                a = abs(_ring_area(ring))
                total += a if i == 0 else -a
    return total


# ---------------------------------------------------------------------------
# G3 GeoJSON (output boundary only — late materialization, query.js:7-9)
# ---------------------------------------------------------------------------


def _fmt(v: float):
    return int(v) if isinstance(v, float) and v.is_integer() else v


def _geojson_obj(g: Geometry) -> dict:
    if g.kind == "POINT":
        return {"type": "Point", "coordinates": [_fmt(g.coords[0]), _fmt(g.coords[1])]}
    if g.kind == "LINESTRING":
        return {"type": "LineString", "coordinates": [[_fmt(x), _fmt(y)] for x, y in g.coords]}
    if g.kind == "POLYGON":
        return {
            "type": "Polygon",
            "coordinates": [[[_fmt(x), _fmt(y)] for x, y in ring] for ring in g.coords],
        }
    if g.kind == "GEOMETRYCOLLECTION":
        return {"type": "GeometryCollection", "geometries": [_geojson_obj(s) for s in g.coords]}
    inner = [_geojson_obj(s)["coordinates"] for s in g.coords]
    name = {"MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString", "MULTIPOLYGON": "MultiPolygon"}[g.kind]
    return {"type": name, "coordinates": inner}


def as_geojson(g: Geometry) -> str:
    return json.dumps(_geojson_obj(g), separators=(",", ":"))


# ---------------------------------------------------------------------------
# G4 intersects / G5 distance / G6 intersection (planar)
# ---------------------------------------------------------------------------


def _seg_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    return (
        (o1 == 0 and on_seg(p1, p2, p3))
        or (o2 == 0 and on_seg(p1, p2, p4))
        or (o3 == 0 and on_seg(p3, p4, p1))
        or (o4 == 0 and on_seg(p3, p4, p2))
    )


def _point_in_ring(pt, ring) -> bool:
    """Ray casting; boundary counts as inside (matches ST_Intersects)."""
    x, y = pt
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        # boundary check
        if _seg_intersect((x1, y1), (x2, y2), (x, y), (x, y)):
            return True
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return inside


def _point_in_polygon(pt, rings) -> bool:
    if not rings or not _point_in_ring(pt, rings[0]):
        return False
    for hole in rings[1:]:
        # strictly inside a hole → outside (on hole boundary still intersects)
        if _point_in_ring(pt, hole) and not _on_ring_boundary(pt, hole):
            return False
    return True


def _on_ring_boundary(pt, ring) -> bool:
    return any(
        _seg_intersect(a, b, pt, pt) for a, b in zip(ring, ring[1:])
    )


def _segments(g: Geometry):
    if g.kind == "LINESTRING":
        yield from zip(g.coords, g.coords[1:])
    elif g.kind == "POLYGON":
        for ring in g.coords:
            yield from zip(ring, ring[1:])


def intersects(a: Geometry, b: Geometry) -> bool:
    """Exact planar ST_Intersects over all supported type pairs."""
    for pa in a.geometries():
        for pb in b.geometries():
            if _prim_intersects(pa, pb):
                return True
    return False


def _prim_intersects(a: Geometry, b: Geometry) -> bool:
    # cheap bbox reject first (the reference's band prefilter, in-kernel)
    ax1, ay1, ax2, ay2 = bbox(a)
    bx1, by1, bx2, by2 = bbox(b)
    if ax1 > bx2 or bx1 > ax2 or ay1 > by2 or by1 > ay2:
        return False
    if _dim(a) > _dim(b):
        a, b = b, a
    if a.kind == "POINT":
        if b.kind == "POINT":
            return a.coords == b.coords
        if b.kind == "LINESTRING":
            return any(_seg_intersect(p, q, a.coords, a.coords) for p, q in _segments(b))
        return _point_in_polygon(a.coords, b.coords)
    if a.kind == "LINESTRING":
        if any(
            _seg_intersect(p1, p2, q1, q2)
            for p1, p2 in _segments(a)
            for q1, q2 in _segments(b)
        ):
            return True
        if b.kind == "POLYGON":
            return _point_in_polygon(a.coords[0], b.coords)
        return False
    # polygon-polygon: edge crossing, containment either way
    if any(
        _seg_intersect(p1, p2, q1, q2)
        for p1, p2 in _segments(a)
        for q1, q2 in _segments(b)
    ):
        return True
    return _point_in_polygon(a.coords[0][0], b.coords) or _point_in_polygon(
        b.coords[0][0], a.coords
    )


def _euclid(dx: float, dy: float) -> float:
    # sqrt(dx²+dy²) rather than math.hypot: bit-identical to the
    # SQL-expressible form, so oracle comparisons agree to the last ulp.
    return math.sqrt(dx * dx + dy * dy)


def _pt_seg_dist(pt, a, b) -> float:
    px, py = pt
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    if dx == 0 and dy == 0:
        return _euclid(px - ax, py - ay)
    t = ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)
    t = max(0.0, min(1.0, t))
    return _euclid(px - (ax + t * dx), py - (ay + t * dy))


def distance(a: Geometry, b: Geometry) -> float:
    """Planar ST_Distance in coordinate units (degrees); 0 if intersecting.
    The meters→degrees convention is the caller's (d/111320, pipeline.js:128)."""
    if intersects(a, b):
        return 0.0
    best = math.inf
    for pa in a.geometries():
        for pb in b.geometries():
            best = min(best, _prim_distance(pa, pb))
    return best


def _prim_points(g: Geometry):
    if g.kind == "POINT":
        return [g.coords]
    if g.kind == "LINESTRING":
        return list(g.coords)
    return [p for ring in g.coords for p in ring]


def _prim_distance(a: Geometry, b: Geometry) -> float:
    if a.kind == "POINT" and b.kind == "POINT":
        return _euclid(a.coords[0] - b.coords[0], a.coords[1] - b.coords[1])
    best = math.inf
    segs_a, segs_b = list(_segments(a)), list(_segments(b))
    if a.kind == "POINT":
        return min(_pt_seg_dist(a.coords, p, q) for p, q in segs_b)
    if b.kind == "POINT":
        return min(_pt_seg_dist(b.coords, p, q) for p, q in segs_a)
    for p1, p2 in segs_a:
        for q1, q2 in segs_b:
            best = min(
                best,
                _pt_seg_dist(p1, q1, q2),
                _pt_seg_dist(p2, q1, q2),
                _pt_seg_dist(q1, p1, p2),
                _pt_seg_dist(q2, p1, p2),
            )
    return best


def intersection(a: Geometry, b: Geometry) -> Geometry | None:
    """ST_Intersection for the overlay-rendering case (AnalysisPanel.jsx:44-46).

    Supports the shapes the engine constructs: point-vs-any (point or empty)
    and convex-polygon clipping via Sutherland–Hodgman.  Concave inputs are
    clipped against the convex subject — documented engine limitation (the
    reference delegates to GEOS; full polygon overlay is out of scope)."""
    if not intersects(a, b):
        return None
    if a.kind == "POINT":
        return a
    if b.kind == "POINT":
        return b
    if a.kind == "POLYGON" and b.kind == "POLYGON":
        clipped = _clip_polygon(a.coords[0], b.coords[0])
        if len(clipped) >= 3:
            if clipped[0] != clipped[-1]:
                clipped.append(clipped[0])
            return Geometry("POLYGON", [clipped])
        return None
    return None  # line overlays not required by the reference surface


def _clip_polygon(subject, clip) -> list:
    """Sutherland–Hodgman: clip `subject` ring by convex `clip` ring."""
    # ensure clip ring is CCW
    if _ring_area(clip) < 0:
        clip = list(reversed(clip))
    output = list(subject[:-1]) if subject and subject[0] == subject[-1] else list(subject)
    for (cx1, cy1), (cx2, cy2) in zip(clip, clip[1:]):
        if not output:
            break
        input_pts, output = output, []
        ex, ey = cx2 - cx1, cy2 - cy1

        def inside(p):
            return ex * (p[1] - cy1) - ey * (p[0] - cx1) >= 0

        def isect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            if denom == 0:
                return q
            t = (ey * (p[0] - cx1) - ex * (p[1] - cy1)) / denom
            return (p[0] + t * dx, p[1] + t * dy)

        s = input_pts[-1]
        for e in input_pts:
            if inside(e):
                if not inside(s):
                    output.append(isect(s, e))
                output.append(e)
            elif inside(s):
                output.append(isect(s, e))
            s = e
    return output
