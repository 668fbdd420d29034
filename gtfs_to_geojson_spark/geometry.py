"""Vectorized numpy geometry kernels (no shapely/turf in sandbox).

These implement, from scratch, the geometry semantics the reference
delegates to @turf/* (SURVEY.md §2.9):

* G1 coordinate rounding        (reference src/lib/geojson-utils.ts:59-107)
* G2 Douglas–Peucker simplify   (reference src/lib/geojson-utils.ts:119-147)
* G3 buffer (point n-gon / line capsules)
                                (reference formats/stops-buffer.ts:9,
                                 formats/lines-buffer.ts:12, default 400 m
                                 src/lib/gtfs-to-geojson.ts:34)
* G4 bboxPolygon                (reference formats/envelope.ts:14)
* G5 polygon union / dissolve   (reference src/lib/geojson-utils.ts:159-170)
* A2 convex hull                (reference formats/convex.ts:9-32)
* point-in-polygon ray cast, point↔segment distance (engine-new, J6–J9)

All functions are array-in/array-out so pandas-UDF callers stay
vectorized (BASELINE.json input_hint: "no per-row Python").

Coordinate convention: GeoJSON order ``(lon, lat)`` in coordinate
arrays; standalone scalar args are named explicitly.
"""

from __future__ import annotations

import math

import numpy as np

EARTH_M_PER_DEG_LAT = 111_320.0  # spherical approximation, matches turf's scale


class UnionError(RuntimeError):
    """Polygon union failed; callers fall back to un-unioned parts —
    the reference does the same on turf union failure
    (src/lib/geojson-utils.ts:135-146 and the `?? features` fallback)."""


# ---------------------------------------------------------------------------
# Basic predicates / measures
# ---------------------------------------------------------------------------


def signed_area(ring: np.ndarray) -> float:
    """Signed area of a ring (Nx2, open or closed). CCW > 0."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if signed_area(ring) >= 0 else ring[::-1].copy()


def close_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring


def bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    """(min_lon, min_lat, max_lon, max_lat) of an Nx2 array."""
    c = np.asarray(coords, dtype=np.float64)
    return float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())


def bbox_polygon(min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> np.ndarray:
    """5-point closed rectangle ring, same corner order as turf bboxPolygon
    (reference formats/envelope.ts:14; golden examples/envelope.geojson)."""
    return np.asarray(
        [
            [min_lon, min_lat],
            [max_lon, min_lat],
            [max_lon, max_lat],
            [min_lon, max_lat],
            [min_lon, min_lat],
        ],
        dtype=np.float64,
    )


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance in meters."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * 6_371_008.8 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def local_scale(lat_deg: float) -> tuple[float, float]:
    """Meters per degree (lon, lat) at a latitude — planar local frame."""
    return (
        EARTH_M_PER_DEG_LAT * max(math.cos(math.radians(lat_deg)), 1e-9),
        EARTH_M_PER_DEG_LAT,
    )


# ---------------------------------------------------------------------------
# G1 rounding / G2 simplify
# ---------------------------------------------------------------------------


def round_coords(coords: np.ndarray, precision: int | None) -> np.ndarray:
    """Coordinate truncation to ``precision`` decimals; None = no-op
    (reference skips when coordinatePrecision unset, geojson-utils.ts:120-122)."""
    if precision is None:
        return np.asarray(coords, dtype=np.float64)
    return np.round(np.asarray(coords, dtype=np.float64), precision)


def rdp_mask(points: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker keep-mask for an Nx2 polyline (endpoints kept).

    Matches turf simplify's contract used by the reference with
    ``tolerance = 1 / 10**coordinatePrecision`` and highQuality=true
    (geojson-utils.ts:124-129): perpendicular-distance RDP in degrees.
    Iterative (explicit stack) — safe for long polylines.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        seg_len2 = float(seg @ seg)
        mid = pts[i + 1 : j]
        if seg_len2 == 0.0:
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            t = np.clip(((mid - pts[i]) @ seg) / seg_len2, 0.0, 1.0)
            proj = pts[i] + t[:, None] * seg
            d = np.hypot(mid[:, 0] - proj[:, 0], mid[:, 1] - proj[:, 1])
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_line(points: np.ndarray, tol: float) -> np.ndarray:
    return np.asarray(points, dtype=np.float64)[rdp_mask(points, tol)]


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    """Simplify a closed ring, preserving validity (≥4 points closed)."""
    r = close_ring(ring)
    out = simplify_line(r, tol)
    if len(out) < 4:
        return r
    return out


# ---------------------------------------------------------------------------
# A2 convex hull (Andrew's monotone chain) — partial+final mergeable
# ---------------------------------------------------------------------------


def convex_hull(points: np.ndarray) -> np.ndarray | None:
    """CCW closed hull ring of an Nx2 set; None if <3 distinct points
    (reference warns + emits nothing, formats/convex.ts:13-22).

    Associative: hull(hull(A) ∪ hull(B)) == hull(A ∪ B), which is what
    makes the two-level (per-partition partial → final merge)
    aggregation in operators/aggregates.py correct.
    """
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) < 3:
        return None
    # lexicographic sort by (x, y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points_iter):
        out: list[np.ndarray] = []
        for p in points_iter:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)
    if len(hull) < 3:
        return None  # collinear
    return close_ring(hull)


# ---------------------------------------------------------------------------
# Point-in-polygon (even-odd ray cast), vectorized over points
# ---------------------------------------------------------------------------


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of many points vs one ring. Boundary
    points count as inside (closed semantics — deterministic for the
    on-edge fixtures in FIXTURES.md §4)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    r = close_ring(ring)
    x0, y0 = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    inside = np.zeros(px.shape, dtype=bool)
    on_edge = np.zeros(px.shape, dtype=bool)
    for i in range(len(x0)):
        ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
        # boundary check: collinear + within segment bbox
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        on_seg = (
            (np.abs(cross) <= 1e-12 * max(1.0, abs(bx - ax) + abs(by - ay)))
            & (px >= min(ax, bx) - 1e-15)
            & (px <= max(ax, bx) + 1e-15)
            & (py >= min(ay, by) - 1e-15)
            & (py <= max(ay, by) + 1e-15)
        )
        on_edge |= on_seg
        crosses = ((ay > py) != (by > py)) & (
            px < (bx - ax) * (py - ay) / (by - ay + np.where(by == ay, 1e-300, 0.0)) + ax
        )
        inside ^= crosses
    return inside | on_edge


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over outer+hole rings (GeoJSON Polygon)."""
    px = np.asarray(px, dtype=np.float64)
    result = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        result ^= points_in_ring(px, py, ring)
    # on-boundary already ORed in per-ring; xor may cancel exact-edge
    # hole boundaries — acceptable (boundary of a hole is in the polygon)
    return result


def points_in_multipolygon(px, py, polygons: list[list[np.ndarray]]) -> np.ndarray:
    """Union semantics: inside any part. This is the exact test used
    against dissolved buffers regardless of whether the outline union
    succeeded (row-set containment contract, SURVEY.md §5)."""
    px = np.asarray(px, dtype=np.float64)
    out = np.zeros(px.shape, dtype=bool)
    for rings in polygons:
        out |= points_in_polygon(px, py, rings)
    return out


# ---------------------------------------------------------------------------
# Polygon ↔ polygon intersects predicate (overlay join residual, J10/J11)
# ---------------------------------------------------------------------------


def _ring_edges(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    r = close_ring(np.asarray(ring, dtype=np.float64))
    return r[:-1], r[1:]


def edges_properly_cross(
    a0: np.ndarray, a1: np.ndarray, b0: np.ndarray, b1: np.ndarray
) -> bool:
    """True if any segment of (a0→a1) properly crosses any of (b0→b1)
    — strict orientation sign flips on both segments, all (na × nb)
    pairs at once. Collinear/touching contacts are NOT proper crossings;
    :func:`polygons_intersect` catches those through its closed
    (boundary-inclusive) vertex-containment tests instead."""

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    ax0, ay0 = a0[:, 0][:, None], a0[:, 1][:, None]
    ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
    bx0, by0 = b0[:, 0][None, :], b0[:, 1][None, :]
    bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]
    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def convex_polygons_intersect_batch(pa: np.ndarray, pb: np.ndarray) -> np.ndarray:
    """Batched separating-axis intersects test for CONVEX polygon pairs
    — (B, na, 2) × (B, nb, 2) open rings (pad ragged batches by
    repeating the last vertex: a zero-length edge yields a zero axis
    whose projections all coincide, which can never certify
    separation). Closed semantics: touching counts as intersecting
    (separation requires a STRICT projection gap). Fully vectorized —
    no per-pair Python — which is what makes it the fast path of the
    distributed polygon⋈polygon join for convex inputs."""
    pa = np.asarray(pa, dtype=np.float64)
    pb = np.asarray(pb, dtype=np.float64)

    def axes(p):
        e = np.roll(p, -1, axis=1) - p
        return np.stack([-e[..., 1], e[..., 0]], axis=-1)

    ax = np.concatenate([axes(pa), axes(pb)], axis=1)  # (B, na+nb, 2)
    proj_a = np.einsum("bnd,bvd->bnv", ax, pa)
    proj_b = np.einsum("bnd,bvd->bnv", ax, pb)
    sep = (proj_a.max(-1) < proj_b.min(-1)) | (proj_b.max(-1) < proj_a.min(-1))
    return ~sep.any(axis=1)


def polygons_intersect(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> bool:
    """Exact closed-semantics intersects test for two simple polygons
    (outer ring + optional even-odd holes). Complete characterization:
    the regions meet iff (a) some vertex of A is in B, or (b) some
    vertex of B is in A, or (c) some edge pair properly crosses.
    Boundary contact counts as intersecting (same closed semantics as
    :func:`points_in_ring`, FIXTURES.md §4). Used as the exact residual
    of the distributed polygon⋈polygon join (operators/overlap.py);
    candidates arrive pre-filtered by bbox-cell overlap, so this only
    ever sees bbox-overlapping pairs."""
    ra = [np.asarray(r, dtype=np.float64) for r in rings_a]
    rb = [np.asarray(r, dtype=np.float64) for r in rings_b]
    if np.any(points_in_polygon(ra[0][:, 0], ra[0][:, 1], rb)):
        return True
    if np.any(points_in_polygon(rb[0][:, 0], rb[0][:, 1], ra)):
        return True
    for ring_a in ra:
        a0, a1 = _ring_edges(ring_a)
        for ring_b in rb:
            b0, b1 = _ring_edges(ring_b)
            if edges_properly_cross(a0, a1, b0, b1):
                return True
    return False


def _points_on_segments(px: np.ndarray, py: np.ndarray, a: np.ndarray, b: np.ndarray) -> bool:
    """True if any point lies on any segment a[i]→b[i] (collinear +
    inside the segment bbox, same tolerance family as points_in_ring)."""
    ax, ay = a[:, 0][None, :], a[:, 1][None, :]
    bx, by = b[:, 0][None, :], b[:, 1][None, :]
    qx, qy = px[:, None], py[:, None]
    cross = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    scale = np.maximum(1.0, np.abs(bx - ax) + np.abs(by - ay))
    on = (
        (np.abs(cross) <= 1e-12 * scale)
        & (qx >= np.minimum(ax, bx) - 1e-15)
        & (qx <= np.maximum(ax, bx) + 1e-15)
        & (qy >= np.minimum(ay, by) - 1e-15)
        & (qy <= np.maximum(ay, by) + 1e-15)
    )
    return bool(np.any(on))


def linestring_intersects_polygon(coords: np.ndarray, rings: list[np.ndarray]) -> bool:
    """Exact closed-semantics intersects test for an open polyline vs a
    simple polygon (outer + even-odd holes). Complete characterization:
    they meet iff (a) some polyline vertex is in the polygon, or
    (b) some ring vertex lies on a polyline segment, or (c) some
    edge pair properly crosses. (A collinear boundary-slide with both
    polyline endpoints outside is caught by (b): the overlapped ring
    edge's endpoint lies on the polyline.) Residual of the distributed
    line⋈polygon join (operators/overlap.py J12)."""
    coords = np.asarray(coords, dtype=np.float64)
    rr = [np.asarray(r, dtype=np.float64) for r in rings]
    if np.any(points_in_polygon(coords[:, 0], coords[:, 1], rr)):
        return True
    a0, a1 = coords[:-1], coords[1:]
    for ring in rr:
        if _points_on_segments(ring[:, 0], ring[:, 1], a0, a1):
            return True
        b0, b1 = _ring_edges(ring)
        if edges_properly_cross(a0, a1, b0, b1):
            return True
    return False


def segments_intersect_batch(
    a0: np.ndarray, a1: np.ndarray, b0: np.ndarray, b1: np.ndarray
) -> np.ndarray:
    """Batched closed-semantics intersects test for (B,) segment pairs
    (each arg (B, 2)) — the fully-vectorized single-segment case of
    :func:`polylines_intersect` (same orientation + on-segment math,
    same tolerances): proper crossing, endpoint touches, and collinear
    overlaps (some endpoint then lies on the other segment)."""

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    ax0, ay0, ax1, ay1 = a0[:, 0], a0[:, 1], a1[:, 0], a1[:, 1]
    bx0, by0, bx1, by1 = b0[:, 0], b0[:, 1], b1[:, 0], b1[:, 1]
    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)

    def on_seg(px, py, sx0, sy0, sx1, sy1, cross):
        scale = np.maximum(1.0, np.abs(sx1 - sx0) + np.abs(sy1 - sy0))
        return (
            (np.abs(cross) <= 1e-12 * scale)
            & (px >= np.minimum(sx0, sx1) - 1e-15)
            & (px <= np.maximum(sx0, sx1) + 1e-15)
            & (py >= np.minimum(sy0, sy1) - 1e-15)
            & (py <= np.maximum(sy0, sy1) + 1e-15)
        )

    touch = (
        on_seg(bx0, by0, ax0, ay0, ax1, ay1, d1)
        | on_seg(bx1, by1, ax0, ay0, ax1, ay1, d2)
        | on_seg(ax0, ay0, bx0, by0, bx1, by1, d3)
        | on_seg(ax1, ay1, bx0, by0, bx1, by1, d4)
    )
    return proper | touch


def polylines_intersect(coords_a: np.ndarray, coords_b: np.ndarray) -> bool:
    """Exact closed-semantics intersects test for two open polylines:
    they meet iff some edge pair properly crosses, or a vertex of
    either lies on a segment of the other (which also covers every
    collinear-overlap contact: the overlapped span's interior endpoint
    is a vertex of one line on the other). Residual of the distributed
    line⋈line join (operators/overlap.py J13 — route crossings)."""
    coords_a = np.asarray(coords_a, dtype=np.float64)
    coords_b = np.asarray(coords_b, dtype=np.float64)
    a0, a1 = coords_a[:-1], coords_a[1:]
    b0, b1 = coords_b[:-1], coords_b[1:]
    if _points_on_segments(coords_a[:, 0], coords_a[:, 1], b0, b1):
        return True
    if _points_on_segments(coords_b[:, 0], coords_b[:, 1], a0, a1):
        return True
    return edges_properly_cross(a0, a1, b0, b1)


# ---------------------------------------------------------------------------
# Point ↔ segment distance (kNN snapping, J8)
# ---------------------------------------------------------------------------


def point_segments_dist_m(
    lat: float, lon: float, seg_a: np.ndarray, seg_b: np.ndarray
) -> np.ndarray:
    """Distance in meters from one point to many segments (lon,lat pairs),
    planar local-frame approximation (exact enough for snapping; the
    same formula is the brute-force oracle in tests)."""
    sx, sy = local_scale(lat)
    p = np.asarray([lon * sx, lat * sy])
    a = np.column_stack([seg_a[:, 0] * sx, seg_a[:, 1] * sy])
    b = np.column_stack([seg_b[:, 0] * sx, seg_b[:, 1] * sy])
    ab = b - a
    ab2 = np.einsum("ij,ij->i", ab, ab)
    t = np.clip(np.einsum("ij,ij->i", p - a, ab) / np.where(ab2 == 0, 1.0, ab2), 0.0, 1.0)
    proj = a + t[:, None] * ab
    return np.hypot(p[0] - proj[:, 0], p[1] - proj[:, 1])


# ---------------------------------------------------------------------------
# G3 buffers
# ---------------------------------------------------------------------------


def buffer_point(lat: float, lon: float, meters: float, steps: int = 32) -> np.ndarray:
    """Closed n-gon ring approximating a geodesic circle (turf buffer
    analog; vertex count is our own pinned spec — correctness judged on
    join rows, SURVEY.md G3)."""
    sx, sy = local_scale(lat)
    ang = np.linspace(0.0, 2.0 * np.pi, steps, endpoint=False)
    ring = np.column_stack(
        [lon + meters * np.cos(ang) / sx, lat + meters * np.sin(ang) / sy]
    )
    return close_ring(ring)


def buffer_points_bulk(lats: np.ndarray, lons: np.ndarray, meters: float, steps: int = 32) -> np.ndarray:
    """Vectorized: (N,) lats/lons → (N, steps+1, 2) closed rings."""
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    sx = EARTH_M_PER_DEG_LAT * np.maximum(np.cos(np.radians(lats)), 1e-9)
    ang = np.linspace(0.0, 2.0 * np.pi, steps, endpoint=False)
    dx = meters * np.cos(ang)[None, :] / sx[:, None]
    dy = meters * np.sin(ang)[None, :] / EARTH_M_PER_DEG_LAT
    rings = np.stack([lons[:, None] + dx, lats[:, None] + dy], axis=-1)
    return np.concatenate([rings, rings[:, :1, :]], axis=1)


def buffer_segment(a: np.ndarray, b: np.ndarray, meters: float, cap_steps: int = 8) -> np.ndarray:
    """Capsule (stadium) ring around one segment, closed CCW."""
    mid_lat = 0.5 * (a[1] + b[1])
    sx, sy = local_scale(mid_lat)
    ap = np.asarray([a[0] * sx, a[1] * sy])
    bp = np.asarray([b[0] * sx, b[1] * sy])
    d = bp - ap
    L = np.hypot(*d)
    if L < 1e-9:
        return buffer_point(a[1], a[0], meters, steps=cap_steps * 4)
    u = d / L
    normal = np.asarray([-u[1], u[0]])
    theta0 = math.atan2(normal[1], normal[0])
    # sweep clockwise so each cap bulges outward (through +u at b, -u at a)
    cap1 = theta0 - np.linspace(0.0, np.pi, cap_steps + 1)  # around b
    cap2 = theta0 - np.pi - np.linspace(0.0, np.pi, cap_steps + 1)  # around a
    pts = []
    pts.append(ap + normal * meters)
    pts.append(bp + normal * meters)
    for t in cap1[1:]:
        pts.append(bp + meters * np.asarray([math.cos(t), math.sin(t)]))
    pts.append(ap - normal * meters)
    for t in cap2[1:]:
        pts.append(ap + meters * np.asarray([math.cos(t), math.sin(t)]))
    ring = np.asarray(pts)
    ring = np.column_stack([ring[:, 0] / sx, ring[:, 1] / sy])
    return close_ring(ensure_ccw(ring))


def buffer_line(coords: np.ndarray, meters: float, cap_steps: int = 8) -> list[np.ndarray]:
    """LineString → list of capsule rings (one per segment). The union
    step (dissolve) merges them; when union is skipped the parts keep
    exact union *containment* semantics via points_in_multipolygon."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) == 1:
        return [buffer_point(c[0, 1], c[0, 0], meters)]
    # drop zero-length segments
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = np.any(np.abs(np.diff(c, axis=0)) > 1e-15, axis=1)
    c = c[keep]
    if len(c) == 1:
        return [buffer_point(c[0, 1], c[0, 0], meters)]
    return [buffer_segment(c[i], c[i + 1], meters) for i in range(len(c) - 1)]


# ---------------------------------------------------------------------------
# G5 polygon union (even-odd boundary trace), with explicit fallback
# ---------------------------------------------------------------------------


def _snap_key(p: np.ndarray, snap: float = 1e-9) -> tuple[int, int]:
    return (int(round(p[0] / snap)), int(round(p[1] / snap)))


def polygon_union(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Union of simple CCW rings → boundary rings (outers CCW, holes CW).

    Algorithm: split every edge at pairwise intersections, keep
    sub-edges whose midpoint is not strictly inside any *other* ring,
    drop duplicated/antiparallel shared edges, chain by vertex. Raises
    UnionError on degeneracy; callers fall back to un-unioned parts —
    the same failure contract as the reference's try/catch around turf
    union (src/lib/geojson-utils.ts:135-146).

    O(E²) edge pairing — intended for per-cell groups after the cell
    decomposition in operators/aggregates.py (dissolve A3), never for
    a whole planet in one call.
    """
    polys = [close_ring(ensure_ccw(np.asarray(r, dtype=np.float64))) for r in rings]
    if len(polys) == 1:
        return [polys[0]]
    boxes = np.asarray([bbox(p) for p in polys])

    # flatten all edges into arrays (vectorized path)
    A = np.vstack([p[:-1] for p in polys])
    B = np.vstack([p[1:] for p in polys])
    pidx = np.concatenate(
        [np.full(len(p) - 1, i, dtype=np.int64) for i, p in enumerate(polys)]
    )
    E = len(A)
    if E > 60_000:
        raise UnionError(f"too many edges for one union call ({E})")
    eps = 1e-12
    eminx = np.minimum(A[:, 0], B[:, 0]) - eps
    emaxx = np.maximum(A[:, 0], B[:, 0]) + eps
    eminy = np.minimum(A[:, 1], B[:, 1]) - eps
    emaxy = np.maximum(A[:, 1], B[:, 1]) + eps

    # candidate crossing pairs via blocked bbox overlap (bounded memory)
    t_lists: dict[int, list[float]] = {}
    block = max(1, min(E, 2_000_000 // max(E, 1)))
    for j0 in range(0, E, block):
        j1 = min(j0 + block, E)
        ov = (
            (eminx[:, None] <= emaxx[None, j0:j1])
            & (eminx[None, j0:j1] <= emaxx[:, None])
            & (eminy[:, None] <= emaxy[None, j0:j1])
            & (eminy[None, j0:j1] <= emaxy[:, None])
            & (pidx[:, None] != pidx[None, j0:j1])
        )
        ii, jj = np.nonzero(ov)
        jj = jj + j0
        if len(ii) == 0:
            continue
        r = B[ii] - A[ii]
        s = B[jj] - A[jj]
        qp = A[jj] - A[ii]
        denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
        cross_qp_s = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
        cross_qp_r = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]
        nonpar = np.abs(denom) > 1e-18
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(nonpar, cross_qp_s / denom, np.nan)
            u = np.where(nonpar, cross_qp_r / denom, np.nan)
        valid = nonpar & (t >= -1e-12) & (t <= 1 + 1e-12) & (u >= -1e-12) & (u <= 1 + 1e-12)
        inner = valid & (t > 1e-12) & (t < 1 - 1e-12)
        for i_, t_ in zip(ii[inner], np.clip(t[inner], 0.0, 1.0)):
            t_lists.setdefault(int(i_), []).append(float(t_))
        # collinear overlap: project other edge's endpoints onto this edge
        rr = np.einsum("ij,ij->i", r, r)
        par = (~nonpar) & (np.abs(cross_qp_r) < 1e-15) & (rr > 0)
        if np.any(par):
            for flag, P_ in ((par, A[jj]), (par, B[jj])):
                tproj = np.einsum("ij,ij->i", P_ - A[ii], r) / np.where(rr == 0, 1.0, rr)
                good = flag & (tproj > 1e-12) & (tproj < 1 - 1e-12)
                for i_, t_ in zip(ii[good], tproj[good]):
                    t_lists.setdefault(int(i_), []).append(float(t_))

    # split edges at their t values → sub-edge arrays
    P_parts, Q_parts, sp_parts = [A], [B], [pidx]
    if t_lists:
        split_ids = np.asarray(sorted(t_lists.keys()), dtype=np.int64)
        keep_mask = np.ones(E, dtype=bool)
        keep_mask[split_ids] = False
        P_parts, Q_parts, sp_parts = [A[keep_mask]], [B[keep_mask]], [pidx[keep_mask]]
        for i_ in split_ids:
            tt = np.unique(np.concatenate([[0.0, 1.0], np.asarray(t_lists[int(i_)])]))
            pts = A[i_] + tt[:, None] * (B[i_] - A[i_])
            P_parts.append(pts[:-1])
            Q_parts.append(pts[1:])
            sp_parts.append(np.full(len(tt) - 1, pidx[i_], dtype=np.int64))
    P = np.vstack(P_parts)
    Q = np.vstack(Q_parts)
    SP = np.concatenate(sp_parts)
    # drop degenerate sub-edges
    nz = np.any(np.abs(P - Q) > 1e-9, axis=1)
    P, Q, SP = P[nz], Q[nz], SP[nz]

    # classify midpoints: strictly inside any OTHER polygon → drop
    mids = 0.5 * (P + Q)
    strictly_inside = np.zeros(len(P), dtype=bool)
    for j, poly in enumerate(polys):
        bx = boxes[j]
        cand = (
            ~strictly_inside
            & (SP != j)
            & (mids[:, 0] >= bx[0] - eps)
            & (mids[:, 0] <= bx[2] + eps)
            & (mids[:, 1] >= bx[1] - eps)
            & (mids[:, 1] <= bx[3] + eps)
        )
        if not np.any(cand):
            continue
        pts = mids[cand]
        inside = points_in_ring(pts[:, 0], pts[:, 1], poly)
        onb = _points_on_boundary(pts, poly)
        upd = np.zeros(len(P), dtype=bool)
        upd[np.nonzero(cand)[0]] = inside & ~onb
        strictly_inside |= upd
    kept = [(P[i], Q[i]) for i in np.nonzero(~strictly_inside)[0]]

    # drop antiparallel duplicate shared edges (tangential contacts)
    seen: dict[tuple, int] = {}
    drop = set()
    for idx, (p, q) in enumerate(kept):
        kp, kq = _snap_key(p), _snap_key(q)
        if (kq, kp) in seen:
            drop.add(idx)
            drop.add(seen[(kq, kp)])
        if (kp, kq) in seen:
            drop.add(idx)  # exact duplicate, keep first
        else:
            seen[(kp, kq)] = idx
    dedup = [kept[i] for i in range(len(kept)) if i not in drop]
    if not dedup and kept:
        raise UnionError("all edges dropped")

    result = _chain_edges(dedup)
    if not result:
        raise UnionError("no rings produced")
    return result


def _chain_edges(edges: list[tuple[np.ndarray, np.ndarray]]) -> list[np.ndarray]:
    """Chain directed sub-edges into closed rings (shared by the union
    and the two-set boolean overlays). At junctions take the most
    clockwise turn (hug the outside). Raises UnionError on open chains
    or dead ends."""
    out_map: dict[tuple, list[int]] = {}
    for idx, (p, q) in enumerate(edges):
        out_map.setdefault(_snap_key(p), []).append(idx)
    used = [False] * len(edges)
    result: list[np.ndarray] = []
    for start in range(len(edges)):
        if used[start]:
            continue
        chain = [edges[start][0], edges[start][1]]
        used[start] = True
        cur_dir = edges[start][1] - edges[start][0]
        guard = 0
        while _snap_key(chain[-1]) != _snap_key(chain[0]):
            guard += 1
            if guard > len(edges) + 2:
                raise UnionError("open chain")
            cands = [i for i in out_map.get(_snap_key(chain[-1]), []) if not used[i]]
            if not cands:
                raise UnionError("dead end")
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # choose most clockwise turn (hug the outside)
                base = math.atan2(-cur_dir[1], -cur_dir[0])
                best, best_ang = None, None
                for i in cands:
                    d = edges[i][1] - edges[i][0]
                    ang = (math.atan2(d[1], d[0]) - base) % (2 * math.pi)
                    if best_ang is None or ang > best_ang:
                        best, best_ang = i, ang
                nxt = best
            used[nxt] = True
            cur_dir = edges[nxt][1] - edges[nxt][0]
            chain.append(edges[nxt][1])
        ring = np.asarray(chain)
        if abs(signed_area(ring)) > 1e-18:
            result.append(ring)
    return result


def _split_edges_against(
    polys_src: list[np.ndarray], polys_oth: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Split every directed edge of ``polys_src`` at its intersections
    with edges of ``polys_oth`` → (P, Q) sub-edge endpoint arrays.
    Same intersection math as polygon_union (proper crossings +
    collinear-overlap endpoint projections), restricted to cross-set
    pairs."""
    A = np.vstack([p[:-1] for p in polys_src])
    B = np.vstack([p[1:] for p in polys_src])
    C = np.vstack([p[:-1] for p in polys_oth])
    D = np.vstack([p[1:] for p in polys_oth])
    E, Eo = len(A), len(C)
    if E * Eo > 40_000_000:
        raise UnionError(f"overlay too large ({E}x{Eo} edge pairs)")
    eps = 1e-12
    sminx = np.minimum(A[:, 0], B[:, 0]) - eps
    smaxx = np.maximum(A[:, 0], B[:, 0]) + eps
    sminy = np.minimum(A[:, 1], B[:, 1]) - eps
    smaxy = np.maximum(A[:, 1], B[:, 1]) + eps
    ominx = np.minimum(C[:, 0], D[:, 0]) - eps
    omaxx = np.maximum(C[:, 0], D[:, 0]) + eps
    ominy = np.minimum(C[:, 1], D[:, 1]) - eps
    omaxy = np.maximum(C[:, 1], D[:, 1]) + eps
    ov = (
        (sminx[:, None] <= omaxx[None, :])
        & (ominx[None, :] <= smaxx[:, None])
        & (sminy[:, None] <= omaxy[None, :])
        & (ominy[None, :] <= smaxy[:, None])
    )
    ii, jj = np.nonzero(ov)
    t_lists: dict[int, list[float]] = {}
    if len(ii):
        r = B[ii] - A[ii]
        s = D[jj] - C[jj]
        qp = C[jj] - A[ii]
        denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
        cross_qp_s = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
        cross_qp_r = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]
        nonpar = np.abs(denom) > 1e-18
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(nonpar, cross_qp_s / denom, np.nan)
            u = np.where(nonpar, cross_qp_r / denom, np.nan)
        inner = (
            nonpar
            & (t > 1e-12)
            & (t < 1 - 1e-12)
            & (u >= -1e-12)
            & (u <= 1 + 1e-12)
        )
        for i_, t_ in zip(ii[inner], np.clip(t[inner], 0.0, 1.0)):
            t_lists.setdefault(int(i_), []).append(float(t_))
        rr = np.einsum("ij,ij->i", r, r)
        par = (~nonpar) & (np.abs(cross_qp_r) < 1e-15) & (rr > 0)
        if np.any(par):
            for flag, P_ in ((par, C[jj]), (par, D[jj])):
                tproj = np.einsum("ij,ij->i", P_ - A[ii], r) / np.where(rr == 0, 1.0, rr)
                good = flag & (tproj > 1e-12) & (tproj < 1 - 1e-12)
                for i_, t_ in zip(ii[good], tproj[good]):
                    t_lists.setdefault(int(i_), []).append(float(t_))
    P_parts, Q_parts = [], []
    for i in range(E):
        if i in t_lists:
            tt = np.unique(np.concatenate([[0.0, 1.0], np.asarray(t_lists[i])]))
            pts = A[i] + tt[:, None] * (B[i] - A[i])
            P_parts.append(pts[:-1])
            Q_parts.append(pts[1:])
        else:
            P_parts.append(A[i : i + 1])
            Q_parts.append(B[i : i + 1])
    P = np.vstack(P_parts)
    Q = np.vstack(Q_parts)
    nz = np.any(np.abs(P - Q) > 1e-9, axis=1)
    return P[nz], Q[nz]


def _classify_mids(
    mids: np.ndarray, polys: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """(inside, on_boundary) of midpoints vs one side's boundary ring
    set — even-odd across ALL rings, so CW hole rings (from a
    pre-unioned side) subtract correctly."""
    inside = points_in_polygon(mids[:, 0], mids[:, 1], polys)
    onb = np.zeros(len(mids), dtype=bool)
    for r in polys:
        onb |= _points_on_boundary(mids, r)
    return inside, onb


def _rings_properly_cross(polys: list[np.ndarray]) -> bool:
    """True when edges of two DIFFERENT rings intersect in an edge
    interior (proper crossing or collinear overlap) — i.e. the ring set
    is not a planar boundary subdivision. Shared endpoints don't count
    (splits only occur at interior t). Pairwise with bbox prefilter;
    ring counts here are small (per-cell overlay groups)."""
    boxes = [bbox(p) for p in polys]
    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            a, b = boxes[i], boxes[j]
            if not (a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]):
                continue
            P, _ = _split_edges_against([polys[i]], [polys[j]])
            if len(P) > len(polys[i]) - 1:
                return True
    return False


def _normalize_side(rings: list[np.ndarray]) -> list[np.ndarray]:
    """One overlay side → a clean planar boundary ring set (outers CCW,
    holes CW) for the midpoint classification.

    Two input shapes are accepted:
    - all-CCW rings (raw dissolve parts, possibly overlapping): unioned
      first, so side semantics are 'the union of the given rings';
    - a hole-bearing set (outers CCW, holes CW — the documented output
      format of polygon_union / these overlays): passed through with
      ORIENTATION PRESERVED. Flipping holes CCW and unioning would
      absorb them into solids (holes silently filled — the exact bug
      this branch prevents); even-odd classification in _classify_mids
      is orientation-insensitive, so the preserved CW rings subtract
      correctly. Such a set must already be planar — rings that cross
      raise UnionError (callers fall back, same contract as union)."""
    polys = [close_ring(np.asarray(r, dtype=np.float64)) for r in rings]
    if not any(signed_area(p) < 0 for p in polys):
        polys = [ensure_ccw(p) for p in polys]  # normalize near-zero-area rings
        if len(polys) <= 1:
            return polys
        return polygon_union(polys)
    if len(polys) > 1 and _rings_properly_cross(polys):
        raise UnionError("hole-bearing overlay side with crossing rings")
    return polys


def polygon_intersection(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> list[np.ndarray]:
    """A ∩ B where each side is the union of its rings (overlapping
    rings within a side are fine — the side is unioned first) →
    boundary rings (outers CCW, holes CW); [] when disjoint. Same
    overlay machinery as polygon_union: split at cross-set
    intersections, keep A sub-edges inside-or-on B and B sub-edges
    strictly inside A, chain. Raises UnionError on degenerate tangency
    (callers fall back exactly like union_or_parts)."""
    pa = _normalize_side(rings_a)
    pb = _normalize_side(rings_b)
    Pa, Qa = _split_edges_against(pa, pb)
    Pb, Qb = _split_edges_against(pb, pa)
    inA, onA = _classify_mids(0.5 * (Pa + Qa), pb)
    inB, onB = _classify_mids(0.5 * (Pb + Qb), pa)
    keep_a = inA | onA  # shared boundary contributed once, by the A side
    keep_b = inB & ~onB
    edges = [(Pa[i], Qa[i]) for i in np.nonzero(keep_a)[0]]
    edges += [(Pb[i], Qb[i]) for i in np.nonzero(keep_b)[0]]
    if not edges:
        return []
    return _chain_edges(edges)


def polygon_difference(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> list[np.ndarray]:
    """A − B where each side is the union of its rings (overlapping
    rings within a side are unioned first). Keeps A sub-edges strictly
    outside B plus REVERSED B sub-edges strictly inside A (which chain
    into CW hole rings when B is nested). [] when B covers A; raises
    UnionError on degenerate tangency."""
    pa = _normalize_side(rings_a)
    pb = _normalize_side(rings_b)
    Pa, Qa = _split_edges_against(pa, pb)
    Pb, Qb = _split_edges_against(pb, pa)
    inA, onA = _classify_mids(0.5 * (Pa + Qa), pb)
    inB, onB = _classify_mids(0.5 * (Pb + Qb), pa)
    keep_a = ~inA & ~onA
    keep_b = inB & ~onB
    edges = [(Pa[i], Qa[i]) for i in np.nonzero(keep_a)[0]]
    edges += [(Qb[i], Pb[i]) for i in np.nonzero(keep_b)[0]]  # reversed
    if not edges:
        return []
    return _chain_edges(edges)


def _points_on_boundary(pts: np.ndarray, ring: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Vectorized: which of M points lie within eps of the ring boundary.
    M×S distance matrix — callers bound group sizes (per-cell dissolve)."""
    a = ring[:-1]
    ab = ring[1:] - a
    ab2 = np.einsum("ij,ij->i", ab, ab)  # (S,)
    ap = pts[:, None, :] - a[None, :, :]  # (M, S, 2)
    t = np.einsum("msj,sj->ms", ap, ab) / np.where(ab2 == 0, 1.0, ab2)[None, :]
    t = np.clip(t, 0.0, 1.0)
    d = ap - t[:, :, None] * ab[None, :, :]
    dist2 = np.einsum("msj,msj->ms", d, d)
    return np.any(dist2 <= eps * eps, axis=1)


def union_or_parts(rings: list[np.ndarray]) -> tuple[list[np.ndarray], bool]:
    """(rings, unioned?) — single-feature short-circuit like the
    reference (count==1 skips union, src/lib/geojson-utils.ts:160-162),
    and fall back to the input parts when the trace fails."""
    if len(rings) <= 1:
        return rings, True
    try:
        return polygon_union(rings), True
    except UnionError:
        return [close_ring(ensure_ccw(np.asarray(r))) for r in rings], False


def connected_components(rings: list[np.ndarray]) -> list[list[int]]:
    """Group ring indices whose bboxes overlap transitively — dissolve
    islands. Cheap pre-pass so union runs per overlapping cluster."""
    n = len(rings)
    boxes = [bbox(r) for r in rings]
    parent_ = list(range(n))

    def find(i):
        while parent_[i] != i:
            parent_[i] = parent_[parent_[i]]
            i = parent_[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            a, b = boxes[i], boxes[j]
            if a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent_[ri] = rj
    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return list(groups.values())
