"""Geometry algorithms: hull, simplify, buffer, makevalid, precision, explode.

From-scratch numpy equivalents of the reference's single-layer operation
kernels (SURVEY.md §2.2): ST_Buffer (geofileops _geoops_sql.py:49-113),
ST_ConvexHull (:116-161), ST_SimplifyPreserveTopology (:477-524),
GEOSMakeValid-style repair (:329-407), ST_ReducePrecision / set_precision
(:4018-4056), explodecollections (_geoops_gpd.py:1077-1078).
"""

from __future__ import annotations

import math

import numpy as np

from .array import (
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryArray,
)
from .overlay import (
    ensure_ccw,
    ensure_closed,
    parts_to_geom,
    polygon_overlay,
    ring_signed_area,
    union_all_parts,
)

# ------------------------------------------------------------- convex hull


def _hull_of_points(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns closed CCW ring (or fewer points)."""
    pts = np.unique(pts.round(12), axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    return ensure_closed(ring)


def convex_hull(arr: GeometryArray) -> GeometryArray:
    geoms = []
    lo, hi = arr.geom_coord_ranges()
    for i in range(len(arr)):
        if arr.types[i] == MISSING:
            geoms.append((MISSING, []))
            continue
        pts = arr.coords[lo[i] : hi[i]]
        if len(pts) == 0:
            geoms.append((POLYGON, []))
            continue
        ring = _hull_of_points(pts)
        if len(ring) == 1:
            geoms.append((POINT, [[ring]]))
        elif len(ring) == 2:
            geoms.append((LINESTRING, [[ring]]))
        else:
            geoms.append((POLYGON, [[ring]]))
    return GeometryArray.from_parts(geoms)


# ----------------------------------------------------------------- simplify


def _dp(ring: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas–Peucker on an open or closed coordinate sequence."""
    n = len(ring)
    if n <= 2:
        return ring
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = ring[b] - ring[a]
        ln = np.hypot(*seg)
        pts = ring[a + 1 : b]
        if ln < 1e-300:
            d = np.hypot(pts[:, 0] - ring[a][0], pts[:, 1] - ring[a][1])
        else:
            d = np.abs(
                (pts[:, 0] - ring[a][0]) * seg[1] - (pts[:, 1] - ring[a][1]) * seg[0]
            ) / ln
        imax = int(np.argmax(d))
        if d[imax] > tol:
            k = a + 1 + imax
            keep[k] = True
            stack.append((a, k))
            stack.append((k, b))
    return ring[keep]


def _lang(ring: np.ndarray, tol: float, lookahead: int = 8) -> np.ndarray:
    """Lang (1969) look-ahead simplification on an open or closed
    coordinate sequence: from the current key, try the segment to the
    point ``lookahead`` ahead; if any intermediate point's perpendicular
    distance exceeds ``tol``, shrink the window by one and retry; the
    first window whose intermediates all fit becomes the next key.
    Public algorithm; mirrors the reference's SimplifyAlgorithm.LANG
    (_geometry_util.py:36, delegated to pygeoops)."""
    n = len(ring)
    if n <= 2:
        return ring
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    key = 0
    while key < n - 1:
        end = min(key + lookahead, n - 1)
        while end > key + 1:
            seg = ring[end] - ring[key]
            ln = np.hypot(*seg)
            pts = ring[key + 1 : end]
            if ln < 1e-300:
                d = np.hypot(pts[:, 0] - ring[key][0], pts[:, 1] - ring[key][1])
            else:
                d = (
                    np.abs(
                        (pts[:, 0] - ring[key][0]) * seg[1]
                        - (pts[:, 1] - ring[key][1]) * seg[0]
                    )
                    / ln
                )
            if (d <= tol).all():
                break
            end -= 1
        keep[end] = True
        key = end
    return ring[keep]


def _lang_plus(ring: np.ndarray, tol: float, lookahead: int = 8) -> np.ndarray:
    """LANG+ (_geometry_util.py:37): repeat Lang passes until no more
    points are removed."""
    prev = len(ring)
    out = _lang(ring, tol, lookahead)
    while len(out) < prev and len(out) > 2:
        prev = len(out)
        out = _lang(out, tol, lookahead)
    return out


def _vw(ring: np.ndarray, tol_area: float) -> np.ndarray:
    """Visvalingam–Whyatt (reference SimplifyAlgorithm.VW,
    _geometry_util.py:38: "tolerance is an area"): repeatedly drop the
    interior point whose triangle with its surviving neighbours has the
    smallest area, until every remaining point's effective area exceeds
    ``tol_area``. Lazy-invalidation heap — O(n log n)."""
    import heapq

    n = len(ring)
    if n <= 2:
        return ring
    prev = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)
    alive = np.ones(n, dtype=bool)

    def tri_area(i: int) -> float:
        a, b, c = ring[prev[i]], ring[i], ring[nxt[i]]
        return 0.5 * abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        )

    heap = [(tri_area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    stale = np.zeros(n, dtype=bool)
    while heap:
        area, i = heapq.heappop(heap)
        if not alive[i] or i == 0 or i == n - 1:
            continue
        if stale[i]:
            stale[i] = False
            heapq.heappush(heap, (tri_area(i), i))
            continue
        if area > tol_area:
            break
        alive[i] = False
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                stale[j] = True
    return ring[alive]


_SIMPLIFIERS = {
    "rdp": lambda ring, tol, la: _dp(ring, tol),
    "lang": lambda ring, tol, la: _lang(ring, tol, la),
    "lang+": lambda ring, tol, la: _lang_plus(ring, tol, la),
    "vw": lambda ring, tol, la: _vw(ring, tol),
}


def simplify(
    arr: GeometryArray,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
) -> GeometryArray:
    """Simplify per ring with the chosen algorithm ('rdp' Douglas–Peucker,
    'lang', 'lang+'; reference SimplifyAlgorithm, _geometry_util.py:32-38).
    Rings that collapse (<4 pts) are dropped (matching the reference's
    drop-empty post-step)."""
    simp = _SIMPLIFIERS[algorithm]
    geoms = []
    for i in range(len(arr)):
        t = int(arr.types[i])
        if t == MISSING:
            geoms.append((MISSING, []))
            continue
        parts_out = []
        for part in arr._parts_of(i):
            rings_out = []
            for ri, ring in enumerate(part):
                if arr.part_types(i) == POLYGON:
                    ring = ensure_closed(ring)
                    # anchor at the ring start; keep closure
                    s = simp(ring, tolerance, lookahead)
                    if len(s) >= 4:
                        rings_out.append(ensure_closed(s))
                    elif ri == 0:
                        rings_out = []
                        break
                elif arr.part_types(i) == LINESTRING:
                    s = simp(ring, tolerance, lookahead)
                    if len(s) >= 2:
                        rings_out.append(s)
                else:
                    rings_out.append(ring)
            if rings_out:
                parts_out.append(rings_out)
        geoms.append((t, parts_out))
    return GeometryArray.from_parts(geoms)


# ------------------------------------------------------------------- buffer


def _arc(center: np.ndarray, radius: float, a0: float, a1: float, quad_segs: int) -> np.ndarray:
    """CCW arc from angle a0 to a1 (a1 > a0)."""
    n = max(1, int(math.ceil((a1 - a0) / (math.pi / 2) * quad_segs)))
    ang = np.linspace(a0, a1, n + 1)
    return center + radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)


def _disc(center: np.ndarray, radius: float, quad_segs: int) -> np.ndarray:
    ang = np.linspace(0, 2 * math.pi, 4 * quad_segs, endpoint=False)
    ring = center + radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    return ensure_closed(ring)


def _is_convex(ring: np.ndarray) -> bool:
    p = ensure_ccw(ensure_closed(ring))[:-1]
    n = len(p)
    if n < 3:
        return False
    v1 = np.roll(p, -1, axis=0) - p
    v2 = np.roll(p, -2, axis=0) - np.roll(p, -1, axis=0)
    cr = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    return bool((cr >= -1e-12).all())


def _offset_convex_ring(
    ring: np.ndarray, d: float, quad_segs: int, join_style: str, mitre_limit: float
) -> np.ndarray:
    """Minkowski sum of a convex CCW ring with a disc of radius d (d>0)."""
    p = ensure_ccw(ensure_closed(ring))[:-1]
    n = len(p)
    out = []
    for k in range(n):
        prev = p[(k - 1) % n]
        cur = p[k]
        nxt = p[(k + 1) % n]
        e0 = cur - prev
        e1 = nxt - cur
        n0 = np.array([e0[1], -e0[0]])
        n0 = n0 / max(np.hypot(*n0), 1e-300) * d
        n1 = np.array([e1[1], -e1[0]])
        n1 = n1 / max(np.hypot(*n1), 1e-300) * d
        a0 = math.atan2(n0[1], n0[0])
        a1 = math.atan2(n1[1], n1[0])
        if a1 < a0:
            a1 += 2 * math.pi
        if join_style == "round":
            out.append(_arc(cur, abs(d), a0, a1, quad_segs))
        elif join_style == "bevel":
            out.append(np.array([cur + n0, cur + n1]))
        else:  # mitre
            bis = n0 + n1
            ln = np.hypot(*bis)
            if ln < 1e-12:
                out.append(np.array([cur + n0, cur + n1]))
            else:
                cosh = math.cos((a1 - a0) / 2)
                m = abs(d) / max(cosh, 1e-12)
                if m > mitre_limit * abs(d):
                    # JTS semantics: clip the miter tip AT the limit
                    # distance (perpendicular to the bisector), not a
                    # full bevel back to the offset endpoints — the
                    # difference matters: a full bevel notches unions
                    # deeply enough to pinch later erosions
                    u = bis / ln
                    lim = mitre_limit * abs(d)
                    clip_pts = []
                    for nv, ev in ((n0, cur - prev), (n1, nxt - cur)):
                        el = np.hypot(*ev)
                        ehat = ev / max(el, 1e-300)
                        denom = float(ehat @ u)
                        if abs(denom) < 1e-12:
                            clip_pts.append(cur + nv)
                        else:
                            t = (lim - float(nv @ u)) / denom
                            clip_pts.append(cur + nv + t * ehat)
                    out.append(np.array(clip_pts))
                else:
                    out.append((cur + bis / ln * m)[None, :])
    ring_out = np.concatenate(out, axis=0)
    return ensure_closed(ring_out)


def _shrink_convex_ring(ring: np.ndarray, d: float) -> np.ndarray:
    """Negative buffer of a convex ring: intersect inward halfplanes."""
    p = ensure_ccw(ensure_closed(ring))[:-1]
    cur = p
    n = len(p)
    for k in range(n):
        a, b = p[k], p[(k + 1) % n]
        e = b - a
        ln = np.hypot(*e)
        if ln < 1e-300:
            continue
        nv = np.array([-e[1], e[0]]) / ln  # inward normal (CCW ring)
        off = a + nv * d
        # clip cur by halfplane: (x - off)·nv >= 0
        keep = (cur - off) @ nv >= -1e-12
        out = []
        m = len(cur)
        for t in range(m):
            c, nx = cur[t], cur[(t + 1) % m]
            ci, ni = keep[t], keep[(t + 1) % m]
            if ci:
                out.append(c)
                if not ni:
                    denom = (nx - c) @ nv
                    tt = ((off - c) @ nv) / denom
                    out.append(c + tt * (nx - c))
            elif ni:
                denom = (nx - c) @ nv
                tt = ((off - c) @ nv) / denom
                out.append(c + tt * (nx - c))
        if len(out) < 3:
            return np.empty((0, 2))
        cur = np.array(out)
    return ensure_closed(cur)


def _capsule(a: np.ndarray, b: np.ndarray, d: float, quad_segs: int,
             cap_style: str) -> np.ndarray:
    """Buffer of a segment = convex hull of two end discs (round caps) or a
    rectangle (flat caps) or extended rectangle (square caps)."""
    e = b - a
    ln = np.hypot(*e)
    if ln < 1e-300:
        return _disc(a, d, quad_segs)
    u = e / ln
    nv = np.array([-u[1], u[0]])
    if cap_style == "flat":
        ring = np.array([a - nv * d, b - nv * d, b + nv * d, a + nv * d])
        return ensure_closed(ring)
    if cap_style == "square":
        ring = np.array(
            [
                a - nv * d - u * d,
                b - nv * d + u * d,
                b + nv * d + u * d,
                a + nv * d - u * d,
            ]
        )
        return ensure_closed(ring)
    ang = math.atan2(nv[1], nv[0])
    arc_b = _arc(b, d, ang - math.pi, ang, quad_segs)  # right side cap at b
    arc_a = _arc(a, d, ang, ang + math.pi, quad_segs)
    ring = np.concatenate([arc_b, arc_a], axis=0)
    return ensure_closed(ring)


def _single_sided_pieces(
    line: np.ndarray, distance: float, quad_segs: int, join_style: str
) -> list:
    """Region pieces whose union is the single-sided buffer of a polyline
    (GEOS semantics: distance > 0 → left of the travel direction, < 0 →
    right; flat ends, no end caps). Per-segment one-sided rectangles plus
    a joint wedge (arc pie for round joins, triangle otherwise) on the
    outside of each turn — the union sweep resolves overlaps exactly."""
    d = abs(distance)
    left = distance > 0
    line = np.asarray(line, dtype=np.float64)
    # drop zero-length segments (duplicate consecutive vertices)
    if len(line) >= 2:
        keep = np.ones(len(line), dtype=bool)
        keep[1:] = (np.diff(line, axis=0) != 0).any(axis=1)
        line = line[keep]
    if len(line) < 2:
        return []
    e = np.diff(line, axis=0)
    ln = np.hypot(e[:, 0], e[:, 1])
    u = e / ln[:, None]
    nv = np.stack([-u[:, 1], u[:, 0]], axis=1)  # left normals
    if not left:
        nv = -nv
    pieces = []
    for k in range(len(u)):
        a, b = line[k], line[k + 1]
        off = nv[k] * d
        quad = np.array([a, b, b + off, a + off])
        pieces.append([[ensure_closed(ensure_ccw(quad))]])
    # joint wedges on the outside of each turn
    for k in range(len(u) - 1):
        crossz = u[k, 0] * u[k + 1, 1] - u[k, 1] * u[k + 1, 0]
        gap = crossz < -1e-12 if left else crossz > 1e-12
        if not gap:
            continue
        v = line[k + 1]
        a0 = math.atan2(nv[k + 1, 1], nv[k + 1, 0])
        a1 = math.atan2(nv[k, 1], nv[k, 0])
        if not left:
            a0, a1 = a1, a0
        while a1 <= a0:
            a1 += 2 * math.pi
        if join_style == "round":
            pts = _arc(v, d, a0, a1, quad_segs)
            ring = np.concatenate([[v], pts], axis=0)
        else:  # mitre / bevel: straight wedge between the two offsets
            ring = np.array(
                [v,
                 v + d * np.array([math.cos(a0), math.sin(a0)]),
                 v + d * np.array([math.cos(a1), math.sin(a1)])]
            )
        pieces.append([[ensure_closed(ensure_ccw(ring))]])
    return pieces


def _rounded_rect_rings(b: np.ndarray, distance: float, qs: int) -> np.ndarray:
    """(m, 4*(qs+1)+1, 2) closed CCW rounded-rect rings for bbox rows b."""
    ang = np.concatenate(
        [
            np.linspace(-np.pi / 2, 0.0, qs + 1),
            np.linspace(0.0, np.pi / 2, qs + 1),
            np.linspace(np.pi / 2, np.pi, qs + 1),
            np.linspace(np.pi, 1.5 * np.pi, qs + 1),
        ]
    )
    ca = np.cos(ang) * distance
    sa = np.sin(ang) * distance
    k = len(ang)
    q = qs + 1
    cx = np.empty((len(b), k))
    cy = np.empty((len(b), k))
    cx[:, 0 * q : 1 * q] = b[:, 2:3]
    cy[:, 0 * q : 1 * q] = b[:, 1:2]
    cx[:, 1 * q : 2 * q] = b[:, 2:3]
    cy[:, 1 * q : 2 * q] = b[:, 3:4]
    cx[:, 2 * q : 3 * q] = b[:, 0:1]
    cy[:, 2 * q : 3 * q] = b[:, 3:4]
    cx[:, 3 * q : 4 * q] = b[:, 0:1]
    cy[:, 3 * q : 4 * q] = b[:, 1:2]
    rings = np.empty((len(b), k + 1, 2))
    rings[:, :k, 0] = cx + ca[None, :]
    rings[:, :k, 1] = cy + sa[None, :]
    rings[:, k] = rings[:, 0]
    return rings


def _uniform_polygon_ga(rings: np.ndarray) -> GeometryArray:
    """GeometryArray of n single-ring polygons from an (n, K, 2) stack —
    offsets built arithmetically, zero python loops."""
    n, K, _ = rings.shape
    return GeometryArray(
        types=np.full(n, POLYGON, dtype=np.int8),
        geom_offsets=np.arange(n + 1, dtype=np.int64),
        part_offsets=np.arange(n + 1, dtype=np.int64),
        ring_offsets=np.arange(n + 1, dtype=np.int64) * K,
        coords=rings.reshape(-1, 2).astype(np.float64, copy=False),
    )


def _buffer_all_rects(
    arr: GeometryArray, distance: float, quad_segs: int
) -> GeometryArray | None:
    """Whole-batch vectorized buffer when EVERY row is an axis-aligned
    rectangle and d>0 (the dominant layer shape): no per-row python at
    all. Returns None when the batch is mixed."""
    from ..stages.relation import detect_rects

    if len(arr) == 0 or distance <= 0:
        return None
    mask = detect_rects(arr) & (arr.types == POLYGON)
    if not mask.all():
        return None
    rings = _rounded_rect_rings(arr.bounds(), distance, quad_segs)
    return _uniform_polygon_ga(rings)


def _buffer_fast_paths(
    arr: GeometryArray, distance: float, quad_segs: int
) -> dict[int, tuple[int, list]]:
    """Vectorized buffer for axis-aligned rectangles (+ points, d>0):
    one broadcasted ring construction for all qualifying rows.

    Positive d on a rect → rounded rect: 4 corner arcs of quad_segs
    segments (identical vertex set to _offset_convex_ring, rotated);
    negative d → shrunk rect or empty. Point + d>0 → disc.
    """
    from ..stages.relation import detect_rects

    n = len(arr)
    if n == 0:
        return {}
    out: dict[int, tuple[int, list]] = {}
    rect_mask = detect_rects(arr)  # includes points
    is_pt = (arr.types == POINT) & rect_mask
    is_rect = rect_mask & ~is_pt
    qs = quad_segs
    if is_rect.any():
        idx = np.flatnonzero(is_rect)
        b = arr.bounds()[idx]
        if distance > 0:
            rings = _rounded_rect_rings(b, distance, qs)
            for j, i in enumerate(idx):
                out[int(i)] = (POLYGON, [[rings[j]]])
        else:
            d = -distance
            x0, y0 = b[:, 0] + d, b[:, 1] + d
            x1, y1 = b[:, 2] - d, b[:, 3] - d
            ok = (x1 > x0) & (y1 > y0)
            rings = np.empty((len(idx), 5, 2))
            rings[:, 0, 0], rings[:, 0, 1] = x0, y0
            rings[:, 1, 0], rings[:, 1, 1] = x1, y0
            rings[:, 2, 0], rings[:, 2, 1] = x1, y1
            rings[:, 3, 0], rings[:, 3, 1] = x0, y1
            rings[:, 4] = rings[:, 0]
            for j, i in enumerate(idx):
                out[int(i)] = (POLYGON, [[rings[j]]] if ok[j] else [])
    if is_pt.any() and distance > 0:
        idx = np.flatnonzero(is_pt)
        lo, _hi = arr.geom_coord_ranges()
        c = arr.coords[lo[idx]]
        ang = np.linspace(0, 2 * np.pi, 4 * qs, endpoint=False)
        rings = np.empty((len(idx), 4 * qs + 1, 2))
        rings[:, : 4 * qs, 0] = c[:, 0:1] + distance * np.cos(ang)[None, :]
        rings[:, : 4 * qs, 1] = c[:, 1:2] + distance * np.sin(ang)[None, :]
        rings[:, 4 * qs] = rings[:, 0]
        for j, i in enumerate(idx):
            out[int(i)] = (POLYGON, [[rings[j]]])
    elif is_pt.any():
        for i in np.flatnonzero(is_pt):
            out[int(i)] = (POLYGON, [])
    return out


def buffer(
    arr: GeometryArray,
    distance: float,
    quad_segs: int = 8,
    cap_style: str = "round",
    join_style: str = "round",
    mitre_limit: float = 5.0,
    single_sided: bool = False,
) -> GeometryArray:
    """ST_Buffer analogue.

    * points -> disc (or square for cap_style=square)
    * lines  -> union of segment capsules
    * polygons -> convex: exact Minkowski offset / halfplane shrink;
      non-convex: union of {polygon} ∪ {edge capsules} for d>0 (exact up to
      GH perturbation), halfplane-free erosion unsupported for d<0 on
      non-convex rings (falls back to convex-approx shrink of each ring).
    * negative distance drops non-polygon rows (reference wraps negative
      buffer in ST_CollectionExtract(...,3): polygons only,
      _geoops_sql.py:67-83).

    Axis-aligned rectangles and points with default round styles take a
    fully vectorized batch path (one broadcasted numpy construction for
    ALL such rows); everything else falls through to the general
    per-geometry code.
    """
    fast_out: dict[int, tuple[int, list]] = {}
    if cap_style == "round" and join_style == "round" and not single_sided:
        whole = _buffer_all_rects(arr, distance, quad_segs)
        if whole is not None:
            return whole
        fast_out = _buffer_fast_paths(arr, distance, quad_segs)
    geoms = []
    for i in range(len(arr)):
        if i in fast_out:
            geoms.append(fast_out[i])
            continue
        t = int(arr.types[i])
        if t == MISSING:
            geoms.append((MISSING, []))
            continue
        pt = arr.part_types(i)
        parts = arr._parts_of(i)
        if distance == 0 and pt == POLYGON:
            geoms.append((t, parts))
            continue
        if pt == POINT:
            if distance <= 0:
                geoms.append((POLYGON, []))
                continue
            rings = []
            for part in parts:
                c = part[0][0]
                if cap_style == "square":
                    d = distance
                    ring = ensure_closed(
                        np.array(
                            [
                                c + [-d, -d],
                                c + [d, -d],
                                c + [d, d],
                                c + [-d, d],
                            ]
                        )
                    )
                else:
                    ring = _disc(c, distance, quad_segs)
                rings.append([ring])
            out = union_all_parts([[r] for r in rings]) if len(rings) > 1 else rings
            geoms.append(parts_to_geom(out))
        elif pt == LINESTRING:
            if single_sided:
                # GEOS convention: positive distance buffers the LEFT of
                # the line direction, negative the RIGHT, flat ends
                if distance == 0:
                    geoms.append((POLYGON, []))
                    continue
                pieces = []
                for part in parts:
                    pieces.extend(
                        _single_sided_pieces(
                            part[0], distance, quad_segs, join_style
                        )
                    )
                out = union_all_parts(pieces) if pieces else []
                geoms.append(parts_to_geom(out))
                continue
            if distance <= 0:
                geoms.append((POLYGON, []))
                continue
            pieces = []
            for part in parts:
                line = part[0]
                for k in range(len(line) - 1):
                    pieces.append([
                        [_capsule(line[k], line[k + 1], distance, quad_segs, cap_style)]
                    ])
            out = union_all_parts(pieces)
            geoms.append(parts_to_geom(out))
        else:  # POLYGON
            out_parts = []
            for part in parts:
                outer = part[0]
                if len(outer) < 4:
                    continue
                if distance > 0:
                    if _is_convex(outer) and len(part) == 1:
                        out_parts.append(
                            [_offset_convex_ring(outer, distance, quad_segs,
                                                 join_style, mitre_limit)]
                        )
                    else:
                        cap_sty = "round" if join_style == "round" else "square"
                        pieces = [[ [ensure_closed(ensure_ccw(outer))] ]]
                        ring = ensure_ccw(ensure_closed(outer))
                        for k in range(len(ring) - 1):
                            pieces.append([
                                [_capsule(ring[k], ring[k + 1], distance,
                                          quad_segs, cap_sty)]
                            ])
                        merged = union_all_parts(pieces)
                        # holes SHRINK under a positive buffer: each hole
                        # region erodes by d (hole − buffer(∂hole, d));
                        # surviving shrunk holes are subtracted from the
                        # dilated outer (they were silently dropped before,
                        # filling every hole of a non-convex/holed input)
                        shrunk: list = []
                        for hring in part[1:]:
                            hr = ensure_ccw(
                                ensure_closed(
                                    np.asarray(hring, dtype=np.float64)
                                )
                            )
                            if len(hr) < 4:
                                continue
                            hcaps = [
                                [[_capsule(hr[k], hr[k + 1], distance,
                                           quad_segs, cap_sty)]]
                                for k in range(len(hr) - 1)
                            ]
                            cap_u = union_all_parts(hcaps)
                            from .overlay import polygon_overlay as _po

                            shrunk.extend(
                                _po([[hr]], cap_u, "difference")
                                if cap_u else [[hr]]
                            )
                        if shrunk:
                            from .overlay import polygon_overlay as _po

                            merged = _po(merged, shrunk, "difference")
                        out_parts.extend(merged)
                elif _is_convex(outer) and len(part) == 1:
                    shr = _shrink_convex_ring(outer, -distance)
                    if len(shr) >= 4:
                        out_parts.append([shr])
                else:
                    # erosion of a non-convex / holed polygon:
                    # P ⊖ d = P − buffer(∂P, d) (boundary capsules)
                    d = -distance
                    caps = []
                    for ring in part:
                        rr = ensure_closed(np.asarray(ring, dtype=np.float64))
                        for k in range(len(rr) - 1):
                            caps.append(
                                [[_capsule(rr[k], rr[k + 1], d, quad_segs, "round")]]
                            )
                    cap_union = union_all_parts(caps) if caps else []
                    from .overlay import polygon_overlay as _po

                    closed_part = [ensure_closed(r) for r in part]
                    if cap_union:
                        eroded = _po([closed_part], cap_union, "difference")
                    else:
                        eroded = [closed_part]
                    out_parts.extend(eroded)
            if distance > 0 and len(out_parts) > 1:
                # offset parts of a multipolygon can come to overlap —
                # ST_Buffer returns their union
                bxs = np.array(
                    [
                        [p[0][:, 0].min(), p[0][:, 1].min(),
                         p[0][:, 0].max(), p[0][:, 1].max()]
                        for p in out_parts
                    ]
                )
                from .strtree import bbox_join as _bj

                ia_, ib_ = _bj(bxs, bxs)
                if (ia_ != ib_).any():
                    out_parts = union_all_parts([[p] for p in out_parts])
            geoms.append(parts_to_geom(out_parts))
    return GeometryArray.from_parts(geoms)


# ---------------------------------------------------------------- makevalid


def _node_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Split a self-intersecting closed ring into simple closed rings
    (handles bowties / figure-eights by noding at proper intersections)."""
    pts = ensure_closed(ring)[:-1]
    n = len(pts)
    # find proper self-intersections
    events = []  # (i, t, point)
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            c, d = pts[j], pts[(j + 1) % n]
            r = b - a
            s = d - c
            denom = r[0] * s[1] - r[1] * s[0]
            if abs(denom) < 1e-300:
                continue
            qp = c - a
            t = (qp[0] * s[1] - qp[1] * s[0]) / denom
            u = (qp[0] * r[1] - qp[1] * r[0]) / denom
            if 1e-12 < t < 1 - 1e-12 and 1e-12 < u < 1 - 1e-12:
                events.append((i, t, a + t * r))
                events.append((j, u, a + t * r))
    if not events:
        return [ensure_closed(pts)]
    # build noded sequence
    by_edge: dict[int, list[tuple[float, tuple[float, float]]]] = {}
    for i, t, p in events:
        by_edge.setdefault(i, []).append((t, (round(p[0], 9), round(p[1], 9))))
    seq: list[tuple[float, float]] = []
    for i in range(n):
        seq.append((round(pts[i][0], 9), round(pts[i][1], 9)))
        for t, p in sorted(by_edge.get(i, [])):
            seq.append(p)
    # split loops: scan, when a coordinate repeats, extract loop
    out_rings = []
    stack: list[tuple[float, float]] = []
    pos: dict[tuple[float, float], int] = {}
    for p in seq + [seq[0]]:
        if p in pos:
            k = pos[p]
            loop = stack[k:] + [p]
            if len(loop) >= 4:
                out_rings.append(np.array(loop))
            for q in stack[k + 1 :]:
                pos.pop(q, None)
            stack = stack[: k + 1]
        else:
            pos[p] = len(stack)
            stack.append(p)
    if len(stack) >= 3:
        out_rings.append(ensure_closed(np.array(stack)))
    return [r for r in out_rings if abs(ring_signed_area(r)) > 1e-300]


def is_valid_detail(arr: GeometryArray) -> tuple[np.ndarray, list[str | None]]:
    """(valid_mask, reason_per_row) — basic OGC checks: ring closure, >=4
    points, no proper self-intersection (like ST_IsValidReason,
    _geoops_sql.py:252-326 uses it for the isvalid op)."""
    n = len(arr)
    valid = np.ones(n, dtype=bool)
    reasons: list[str | None] = [None] * n
    for i in range(n):
        if arr.part_types(i) != POLYGON or arr.types[i] == MISSING:
            continue
        for part in arr._parts_of(i):
            for ring in part:
                if len(ring) < 4:
                    valid[i] = False
                    reasons[i] = "Ring with fewer than 4 points"
                    break
                if not np.array_equal(ring[0], ring[-1]):
                    valid[i] = False
                    reasons[i] = "Ring not closed"
                    break
                if len(_node_ring(ring)) > 1:
                    valid[i] = False
                    reasons[i] = "Self-intersection"
                    break
            if not valid[i]:
                break
    return valid, reasons


def make_valid(arr: GeometryArray) -> GeometryArray:
    """Repair invalid polygons by noding self-intersecting rings into
    simple rings (GEOSMakeValid 'structure' style for the bowtie class)."""
    valid, _ = is_valid_detail(arr)
    if valid.all():
        return arr
    geoms = []
    for i in range(len(arr)):
        t = int(arr.types[i])
        if valid[i] or t == MISSING:
            geoms.append((t, arr._parts_of(i)))
            continue
        rings = []
        for part in arr._parts_of(i):
            for ring in part:
                rings.extend(_node_ring(ring))
        from .overlay import _rings_to_parts

        geoms.append(parts_to_geom(_rings_to_parts(rings)))
    return GeometryArray.from_parts(geoms)


# ------------------------------------------------------- precision / explode


def set_precision(arr: GeometryArray, gridsize: float) -> GeometryArray:
    """Round coordinates to gridsize multiples; drop rings that collapse.
    ST_ReducePrecision analogue (_geoops_sql.py:4018-4056)."""
    if gridsize <= 0:
        return arr
    coords = np.round(arr.coords / gridsize) * gridsize
    rounded = arr.with_coords(coords)
    geoms = []
    for i in range(len(rounded)):
        t = int(rounded.types[i])
        if t == MISSING:
            geoms.append((MISSING, []))
            continue
        pt = rounded.part_types(i)
        parts_out = []
        for part in rounded._parts_of(i):
            rings_out = []
            for ri, ring in enumerate(part):
                # drop consecutive duplicates
                if len(ring) > 1:
                    keep = np.ones(len(ring), dtype=bool)
                    keep[1:] = (np.abs(np.diff(ring, axis=0)) > 1e-300).any(axis=1)
                    ring = ring[keep]
                if pt == POLYGON:
                    ring = ensure_closed(ring)
                    if len(ring) >= 4 and abs(ring_signed_area(ring)) > 0:
                        rings_out.append(ring)
                    elif ri == 0:
                        rings_out = []
                        break
                elif pt == LINESTRING:
                    if len(ring) >= 2:
                        rings_out.append(ring)
                else:
                    rings_out.append(ring)
            if rings_out:
                parts_out.append(rings_out)
        geoms.append((t, parts_out))
    return GeometryArray.from_parts(geoms)


_SINGLE_OF = {
    MULTIPOINT: POINT,
    MULTILINESTRING: LINESTRING,
    MULTIPOLYGON: POLYGON,
    POINT: POINT,
    LINESTRING: LINESTRING,
    POLYGON: POLYGON,
}


def explode(arr: GeometryArray) -> tuple[GeometryArray, np.ndarray]:
    """Multi -> single parts. Returns (exploded, source_index) where
    source_index maps each output row to its input row."""
    geoms = []
    src = []
    for i in range(len(arr)):
        t = int(arr.types[i])
        if t == MISSING:
            geoms.append((MISSING, []))
            src.append(i)
            continue
        parts = arr._parts_of(i)
        if not parts:
            geoms.append((_SINGLE_OF.get(t, t), []))
            src.append(i)
            continue
        for part in parts:
            geoms.append((_SINGLE_OF.get(t, t), [part]))
            src.append(i)
    return GeometryArray.from_parts(geoms), np.asarray(src, dtype=np.int64)


def collection_extract(arr: GeometryArray, primitive: int) -> GeometryArray:
    """Keep only parts of the given primitive type (ST_CollectionExtract).

    Mixed GEOMETRYCOLLECTION rows extract the matching parts (classified
    by ring structure — the same inference the WKB encoder uses for
    collections we carry: single 1-coord ring → point, open single ring
    → line, else polygon) into a MULTI{primitive}, mirroring Spatialite
    CollectionExtract (the reference's post-intersection SQL step)."""
    from .array import (
        GEOMETRYCOLLECTION,
        MULTILINESTRING,
        MULTIPOINT,
        MULTIPOLYGON,
    )

    multi_of = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING,
                POLYGON: MULTIPOLYGON}

    geoms = []
    for i in range(len(arr)):
        t = int(arr.types[i])
        if t == MISSING:
            geoms.append((MISSING, []))
            continue
        if t == GEOMETRYCOLLECTION:
            keep = []
            for part in arr._parts_of(i):
                if len(part) == 1 and len(part[0]) == 1:
                    ptype = POINT
                elif len(part) == 1 and not (
                    len(part[0]) >= 4
                    and bool((part[0][0] == part[0][-1]).all())
                ):
                    ptype = LINESTRING
                else:
                    ptype = POLYGON
                if ptype == primitive:
                    keep.append(part)
            geoms.append(
                (multi_of.get(primitive, primitive) if keep else primitive,
                 keep)
            )
        elif arr.part_types(i) == primitive:
            geoms.append((t, arr._parts_of(i)))
        else:
            geoms.append((primitive if primitive != POINT else POINT, []))
    return GeometryArray.from_parts(geoms)
