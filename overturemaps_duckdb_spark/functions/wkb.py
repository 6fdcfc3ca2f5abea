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
        """Flatten to a list of NON-EMPTY primitive geometries.

        Empty primitives are legal WKB (`LINESTRING EMPTY` is a
        zero-point linestring, `POLYGON EMPTY` a zero-ring polygon) and
        are dropped here, so every kernel consumer (centroid / area /
        intersects / distance) sees only primitives with coordinates —
        the r8 centroid-on-empty fix generalized (r9 review): before
        this, `intersects(POLYGON EMPTY, …)` IndexError'd on the missing
        exterior ring and failed the whole Arrow batch for one empty
        row, where GEOS answers false."""
        if self.kind == "LINESTRING":
            return [self] if self.coords else []
        if self.kind == "POLYGON":
            return [self] if self.coords and self.coords[0] else []
        if self.kind == "POINT":
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


def bbox(g: Geometry) -> tuple[float, float, float, float] | None:
    """Coordinate envelope; None for an empty geometry (r9 review — the
    bare min([]) used to raise ValueError)."""
    xs: list[float] = []
    ys: list[float] = []
    _collect_coords(g, xs, ys)
    if not xs:
        return None
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
        for x, y in g.coords[0] if g.coords else ():  # exterior ring suffices
            xs.append(x)
            ys.append(y)
    else:
        for sub in g.coords:
            _collect_coords(sub, xs, ys)


def centroid(g: Geometry) -> tuple[float, float] | None:
    """Planar centroid with GEOS-compatible dimensional promotion: for mixed
    collections only the highest-dimension members contribute.  Empty
    geometries (MULTIPOLYGON EMPTY parses to zero members) yield None —
    GEOS returns POINT EMPTY; raising here would fail the whole Arrow
    batch for one empty row."""
    prims = g.geometries()
    if not prims:
        return None
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
    if n == 0:  # all-empty linestrings after the fallbacks
        return None
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


def _as_point_if_degenerate(g: Geometry) -> Geometry:
    """A primitive with NO segments (single-vertex linestring, or a polygon
    whose every ring is sub-2-point) collapses to its sole vertex.

    Legal-but-degenerate WKB: without this, `_prim_distance(point, 1-pt
    linestring)` hit ``min()`` over an empty segment generator —
    ValueError, failing the whole Arrow batch for one malformed row (the
    r8/r9 empty-geometry crash class) — and `_prim_intersects` answered
    False for a 1-point line lying ON another geometry (r12 review)."""
    if g.kind == "LINESTRING" and len(g.coords) == 1:
        return Geometry("POINT", g.coords[0])
    if g.kind == "POLYGON" and all(len(r) < 2 for r in g.coords):
        return Geometry("POINT", g.coords[0][0])
    return g


def _prim_intersects(a: Geometry, b: Geometry) -> bool:
    # cheap bbox reject first (the reference's band prefilter, in-kernel)
    ax1, ay1, ax2, ay2 = bbox(a)
    bx1, by1, bx2, by2 = bbox(b)
    if ax1 > bx2 or bx1 > ax2 or ay1 > by2 or by1 > ay2:
        return False
    a = _as_point_if_degenerate(a)
    b = _as_point_if_degenerate(b)
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


def distance(a: Geometry, b: Geometry) -> float | None:
    """Planar ST_Distance in coordinate units (degrees); 0 if intersecting.
    The meters→degrees convention is the caller's (d/111320, pipeline.js:128).
    None (→ SQL NULL through the pandas UDF) when either side is empty —
    the pre-r9 code fell through to the +inf accumulator seed, and an
    infinite "distance" silently passes every `< threshold` filter's
    negation (GEOS/PostGIS answer NULL for empty inputs)."""
    pa_list, pb_list = a.geometries(), b.geometries()
    if not pa_list or not pb_list:
        return None
    if intersects(a, b):
        return 0.0
    best = math.inf
    for pa in pa_list:
        for pb in pb_list:
            best = min(best, _prim_distance(pa, pb))
    return best


def _prim_points(g: Geometry):
    if g.kind == "POINT":
        return [g.coords]
    if g.kind == "LINESTRING":
        return list(g.coords)
    return [p for ring in g.coords for p in ring]


def _prim_distance(a: Geometry, b: Geometry) -> float:
    a = _as_point_if_degenerate(a)
    b = _as_point_if_degenerate(b)
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

    Point-vs-any returns the point; polygon-vs-polygon is a full planar
    overlay: Sutherland–Hodgman when the clip ring is convex (one pass),
    otherwise Greiner–Hormann (handles concave×concave, including
    multi-component results, returned as MULTIPOLYGON).  Degenerate
    configurations (shared vertices / vertex-on-edge / collinear edges)
    are resolved by an epsilon perturbation of the clip ring — invisible at
    the 6-dp rounding every consumer applies.  Holes are not overlaid (the
    reference's themes carry none; it delegates to GEOS for the general
    case)."""
    if not intersects(a, b):
        return None
    if a.kind == "POINT":
        return a
    if b.kind == "POINT":
        return b
    # Flatten multiparts like intersects()/distance() do: a valid
    # MULTIPOLYGON's parts are disjoint, so its intersection with another
    # (multi)polygon is exactly the union of pairwise part overlays, and
    # those pieces are themselves disjoint — collecting them into one
    # MULTIPOLYGON is the correct overlay.  (Before this, any MULTIPOLYGON
    # operand fell through to `return None` — NULL for a genuinely
    # overlapping pair, even though Overture emits multipolygon
    # footprints.)
    polys_a = [g for g in a.geometries() if g.kind == "POLYGON"]
    polys_b = [g for g in b.geometries() if g.kind == "POLYGON"]
    if polys_a and polys_b:
        rings = []
        for ga in polys_a:
            for gb in polys_b:
                if not _prim_intersects(ga, gb):
                    continue
                rings.extend(_polygon_pair_rings(ga.coords[0], gb.coords[0]))
        if not rings:
            return None
        if len(rings) == 1:
            return Geometry("POLYGON", [rings[0]])
        return Geometry(
            "MULTIPOLYGON", [Geometry("POLYGON", [r]) for r in rings]
        )
    return None  # line overlays not required by the reference surface


def _polygon_pair_rings(subj, clip) -> list[list]:
    """Closed overlay rings of one polygon×polygon pair (exterior rings)."""
    if _is_convex(subj) and _is_convex(clip):
        # convex∩convex is always a single convex piece — one SH pass
        clipped = _clip_polygon(subj, clip)
        rings = [clipped] if len(clipped) >= 3 else []
    else:
        # any concave operand can yield multiple components — SH would
        # fuse them through zero-width corridors; GH splits them
        rings = _overlay_intersection(subj, clip)
    closed = []
    for r in rings:
        if len(r) < 3:
            continue
        r = list(r)
        if r[0] != r[-1]:
            r.append(r[0])
        closed.append(r)
    return closed


def _is_convex(ring) -> bool:
    pts = ring[:-1] if ring and ring[0] == ring[-1] else list(ring)
    n = len(pts)
    if n < 4:
        return True
    sign = 0
    for i in range(n):
        ax, ay = pts[i]
        bx, by = pts[(i + 1) % n]
        cx, cy = pts[(i + 2) % n]
        cr = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if cr != 0:
            s = 1 if cr > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


class _DegenerateOverlay(Exception):
    """Raised when GH meets a non-general-position configuration."""


class _GHVert:
    __slots__ = ("pt", "nxt", "prv", "neighbor", "entry", "inter", "visited")

    def __init__(self, pt, inter=False):
        self.pt = pt
        self.nxt = self.prv = self.neighbor = None
        self.entry = False
        self.inter = inter
        self.visited = False


def _gh_ring(pts) -> "_GHVert":
    head = None
    prev = None
    for p in pts:
        v = _GHVert(p)
        if head is None:
            head = v
        else:
            prev.nxt = v
            v.prv = prev
        prev = v
    prev.nxt = head
    head.prv = prev
    return head


def _gh_nodes(head):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _edge_intersections(p1, p2, q1, q2):
    """Proper-crossing parameters (t, u) strictly inside both edges; raises
    on endpoint-touching or collinear-overlap (non-general position)."""
    dx1, dy1 = p2[0] - p1[0], p2[1] - p1[1]
    dx2, dy2 = q2[0] - q1[0], q2[1] - q1[1]
    denom = dx1 * dy2 - dy1 * dx2
    if denom == 0:
        # parallel: degenerate only if collinear AND overlapping
        cross = (q1[0] - p1[0]) * dy1 - (q1[1] - p1[1]) * dx1
        if cross == 0:
            proj = [
                ((q[0] - p1[0]) * dx1 + (q[1] - p1[1]) * dy1) for q in (q1, q2)
            ]
            lo, hi = min(proj), max(proj)
            if hi > 0 and lo < dx1 * dx1 + dy1 * dy1:
                raise _DegenerateOverlay("collinear overlap")
        return None
    t = ((q1[0] - p1[0]) * dy2 - (q1[1] - p1[1]) * dx2) / denom
    u = ((q1[0] - p1[0]) * dy1 - (q1[1] - p1[1]) * dx1) / denom
    eps = 1e-12
    if -eps < t < eps or 1 - eps < t < 1 + eps or -eps < u < eps or 1 - eps < u < 1 + eps:
        if -eps <= t <= 1 + eps and -eps <= u <= 1 + eps:
            raise _DegenerateOverlay("endpoint touch")
        return None
    if 0 < t < 1 and 0 < u < 1:
        return (t, u)
    return None


def _strict_inside(pt, ring) -> bool:
    x, y = pt
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return inside


def _overlay_once(subj_pts, clip_pts, subj_closed, clip_closed):
    s_head = _gh_ring(subj_pts)
    c_head = _gh_ring(clip_pts)
    # 1. find crossings, recording (edge-origin vertex, alpha) pairs
    crossings = []
    for sv in list(_gh_nodes(s_head)):
        for cv in list(_gh_nodes(c_head)):
            hit = _edge_intersections(sv.pt, sv.nxt.pt, cv.pt, cv.nxt.pt)
            if hit is not None:
                crossings.append((sv, cv, hit[0], hit[1]))
    if not crossings:
        if _strict_inside(subj_pts[0], clip_closed):
            return [list(subj_pts)]
        if _strict_inside(clip_pts[0], subj_closed):
            return [list(clip_pts)]
        return []
    # 2. insert intersection twins, sorted by alpha along each original edge
    def _insert(origin_of, alpha_idx):
        by_edge: dict[int, list] = {}
        for rec in crossings:
            by_edge.setdefault(id(rec[origin_of]), []).append(rec)
        for recs in by_edge.values():
            recs.sort(key=lambda r: r[2 + alpha_idx])
            anchor = recs[0][origin_of]
            cur = anchor
            for rec in recs:
                p1, p2 = anchor.pt, anchor_nxt[id(anchor)]
                t = rec[2 + alpha_idx]
                pt = (p1[0] + (p2[0] - p1[0]) * t, p1[1] + (p2[1] - p1[1]) * t)
                v = _GHVert(pt, inter=True)
                v.prv, v.nxt = cur, cur.nxt
                cur.nxt.prv = v
                cur.nxt = v
                rec[4 + origin_of] = v  # type: ignore[index]
                cur = v

    # remember each edge's original endpoint before insertions
    anchor_nxt = {}
    for rec in crossings:
        anchor_nxt[id(rec[0])] = rec[0].nxt.pt
        anchor_nxt[id(rec[1])] = rec[1].nxt.pt
    crossings = [list(r) + [None, None] for r in crossings]
    _insert(0, 0)
    _insert(1, 1)
    for rec in crossings:
        sv_new, cv_new = rec[4], rec[5]
        sv_new.neighbor, cv_new.neighbor = cv_new, sv_new
    # 3. entry/exit flags
    for head, other_closed in ((s_head, clip_closed), (c_head, subj_closed)):
        status = not _strict_inside(head.pt, other_closed)
        for v in _gh_nodes(head):
            if v.inter:
                v.entry = status
                status = not status
    # 4. trace result rings (GH traversal: follow the current list until the
    # next intersection, hop to its twin, repeat until back at the start)
    rings = []
    limit = 4 * (len(subj_pts) + len(clip_pts) + 2 * len(crossings))
    for rec in crossings:
        start = rec[4]
        if start.visited:
            continue
        ring = []
        cur = start
        steps = 0
        while True:
            cur.visited = True
            cur.neighbor.visited = True
            if cur.entry:
                while True:
                    ring.append(cur.pt)
                    cur = cur.nxt
                    steps += 1
                    if cur.inter or steps > limit:
                        break
            else:
                while True:
                    ring.append(cur.pt)
                    cur = cur.prv
                    steps += 1
                    if cur.inter or steps > limit:
                        break
            if steps > limit:
                raise _DegenerateOverlay("trace did not terminate")
            cur.visited = True
            cur.neighbor.visited = True
            cur = cur.neighbor
            if cur is start or cur is start.neighbor:
                break
        if len(ring) >= 3:
            rings.append(ring)
    return rings


def _overlay_intersection(subj, clip) -> list:
    """Greiner–Hormann polygon intersection of two (possibly concave) outer
    rings; returns a list of open result rings.  Non-general-position
    inputs retry with the clip ring perturbed by a scale-relative epsilon
    (≤1e-9 of the bbox span — below every consumer's rounding)."""
    subj_closed = list(subj) if subj[0] == subj[-1] else list(subj) + [subj[0]]
    clip_closed = list(clip) if clip[0] == clip[-1] else list(clip) + [clip[0]]
    subj_pts = subj_closed[:-1]
    clip_pts = clip_closed[:-1]
    span = max(
        abs(v) for p in subj_pts + clip_pts for v in p
    ) or 1.0
    for attempt in range(4):
        try:
            return _overlay_once(subj_pts, clip_pts, subj_closed, clip_closed)
        except _DegenerateOverlay:
            eps = span * 1e-10 * (3 ** attempt)
            clip_pts = [
                (x + eps * (1 + (i % 3)), y + eps * (1 + (i % 2)))
                for i, (x, y) in enumerate(clip_pts)
            ]
            clip_closed = clip_pts + [clip_pts[0]]
    raise _DegenerateOverlay("unresolvable degeneracy after perturbation")


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
