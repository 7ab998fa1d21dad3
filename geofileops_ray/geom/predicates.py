"""Spatial predicates + distances over GeometryArray, from scratch.

Covers the predicate surface the reference exposes through its
spatial-relations query DSL (geofileops _geoops_sql.py:2516-2578 —
intersects, contains, within, coveredby, covers, touches, disjoint,
equals, crosses, overlaps) plus ST_Distance / dwithin semantics
(_geoops_sql.py:1739-1802 export_by_distance). Implemented with
orientation/crossing-number tests on the ragged numpy layout.

Notes vs GEOS:
* predicates are exact for the generic cases exercised by our fixtures;
  `touches`/`crosses`/`overlaps` follow DE-9IM definitions computed from
  (boundary-intersect, interior-overlap, containment) primitives with an
  eps-free orientation test, which matches GEOS on non-degenerate input.
"""

from __future__ import annotations

import numpy as np

from .array import LINESTRING, POINT, POLYGON, GeometryArray

_EPS = 1e-12


# --------------------------------------------------------------- primitives


def _segments(arr: GeometryArray, i: int) -> np.ndarray:
    """(m, 2, 2) array of all segments of geometry i (rings + lines)."""
    segs = []
    for p in range(arr.geom_offsets[i], arr.geom_offsets[i + 1]):
        for r in range(arr.part_offsets[p], arr.part_offsets[p + 1]):
            ring = arr.coords[arr.ring_offsets[r] : arr.ring_offsets[r + 1]]
            if len(ring) >= 2:
                segs.append(np.stack([ring[:-1], ring[1:]], axis=1))
    if not segs:
        return np.empty((0, 2, 2))
    return np.concatenate(segs, axis=0)


def _points(arr: GeometryArray, i: int) -> np.ndarray:
    lo, hi = arr.geom_coord_ranges()
    return arr.coords[lo[i] : hi[i]]


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def segments_intersect_matrix(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Boolean (m,n): does segment a_i properly-or-improperly intersect b_j."""
    if len(sa) == 0 or len(sb) == 0:
        return np.zeros((len(sa), len(sb)), dtype=bool)
    p1 = sa[:, None, 0]
    p2 = sa[:, None, 1]
    q1 = sb[None, :, 0]
    q2 = sb[None, :, 1]
    d1 = _cross(q1, q2, p1)
    d2 = _cross(q1, q2, p2)
    d3 = _cross(p1, p2, q1)
    d4 = _cross(p1, p2, q2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (
        (np.abs(d1) > _EPS) | (np.abs(d2) > _EPS)
    ) & ((np.abs(d3) > _EPS) | (np.abs(d4) > _EPS))

    def on_seg(p, a, b, d):
        return (
            (np.abs(d) <= _EPS)
            & (p[..., 0] >= np.minimum(a[..., 0], b[..., 0]) - _EPS)
            & (p[..., 0] <= np.maximum(a[..., 0], b[..., 0]) + _EPS)
            & (p[..., 1] >= np.minimum(a[..., 1], b[..., 1]) - _EPS)
            & (p[..., 1] <= np.maximum(a[..., 1], b[..., 1]) + _EPS)
        )

    touch = (
        on_seg(p1, q1, q2, d1)
        | on_seg(p2, q1, q2, d2)
        | on_seg(q1, p1, p2, d3)
        | on_seg(q2, p1, p2, d4)
    )
    return proper | touch


def points_in_polygon(pts: np.ndarray, arr: GeometryArray, i: int,
                      boundary_counts: bool = True) -> np.ndarray:
    """Crossing-number point-in-polygon for geometry i (POLYGON/MULTIPOLYGON).

    boundary_counts=True -> boundary points count as inside ("covers").
    Vectorized over pts × segments.
    """
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    inside = np.zeros(len(pts), dtype=bool)
    on_boundary = np.zeros(len(pts), dtype=bool)
    for p in range(arr.geom_offsets[i], arr.geom_offsets[i + 1]):
        part_inside = np.zeros(len(pts), dtype=bool)
        for ri, r in enumerate(range(arr.part_offsets[p], arr.part_offsets[p + 1])):
            ring = arr.coords[arr.ring_offsets[r] : arr.ring_offsets[r + 1]]
            if len(ring) < 4:
                continue
            x, y = pts[:, 0:1], pts[:, 1:2]
            x1, y1 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
            x2, y2 = ring[1:, 0][None, :], ring[1:, 1][None, :]
            # crossing test (half-open rule avoids double counting vertices)
            cond = (y1 > y) != (y2 > y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            crosses = cond & (x < xint)
            ring_in = crosses.sum(axis=1) % 2 == 1
            if ri == 0:
                part_inside = ring_in
            else:
                part_inside &= ~ring_in  # holes punch out
            # boundary proximity
            dx, dy = x2 - x1, y2 - y1
            seg_len2 = dx * dx + dy * dy
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.clip(((x - x1) * dx + (y - y1) * dy) / np.where(
                    seg_len2 == 0, 1, seg_len2), 0, 1)
            px, py = x1 + t * dx, y1 + t * dy
            d2 = (x - px) ** 2 + (y - py) ** 2
            on_boundary |= (d2 <= _EPS).any(axis=1)
        inside |= part_inside
    if boundary_counts:
        return inside | on_boundary
    return inside & ~on_boundary


def min_distance_segments(sa: np.ndarray, sb: np.ndarray) -> float:
    """Min distance between two segment sets (inf if either empty)."""
    if len(sa) == 0 or len(sb) == 0:
        return np.inf
    if segments_intersect_matrix(sa, sb).any():
        return 0.0
    d = min(
        _pt_seg_dist(sa[:, 0], sb).min(),
        _pt_seg_dist(sa[:, 1], sb).min(),
        _pt_seg_dist(sb[:, 0], sa).min(),
        _pt_seg_dist(sb[:, 1], sa).min(),
    )
    return float(d)


def _pt_seg_dist(pts: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """(k,m) distances from points to segments."""
    a = segs[None, :, 0]
    b = segs[None, :, 1]
    p = pts[:, None]
    ab = b - a
    len2 = (ab * ab).sum(-1)
    t = np.clip(((p - a) * ab).sum(-1) / np.where(len2 == 0, 1, len2), 0, 1)
    proj = a + t[..., None] * ab
    d = p - proj
    return np.sqrt((d * d).sum(-1))


def _pt_segs_nearest(
    pts: np.ndarray, segs: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float]:
    """(best point, its projection on the nearest segment, distance)."""
    a = segs[None, :, 0]
    b = segs[None, :, 1]
    p = pts[:, None]
    ab = b - a
    len2 = (ab * ab).sum(-1)
    t = np.clip(((p - a) * ab).sum(-1) / np.where(len2 == 0, 1, len2), 0, 1)
    proj = a + t[..., None] * ab
    d = p - proj
    d2 = (d * d).sum(-1)
    ki, kj = np.unravel_index(int(np.argmin(d2)), d2.shape)
    return pts[ki], proj[ki, kj], float(np.sqrt(d2[ki, kj]))


def pair_nearest_points(
    a: GeometryArray, i: int, b: GeometryArray, j: int
) -> tuple[np.ndarray, np.ndarray]:
    """The point pair realizing ST_Distance(a_i, b_j) — on the boundary
    vertices/edges for disjoint geometries (the min of two disjoint
    polylines is always at a vertex-to-edge projection). Intersecting
    pairs have distance 0; any point is returned twice so downstream
    geodesic math yields 0."""
    ta, tb = a.part_types(i), b.part_types(j)
    pa, pb = _points(a, i), _points(b, j)
    if pair_intersects(a, i, b, j):
        return pa[0], pa[0]
    # degenerate geometries (e.g. a single-vertex LINESTRING) have zero
    # segments — fall back to their vertex set rather than crashing on
    # an argmin over an empty distance matrix
    sa = _segments(a, i) if ta != POINT else np.zeros((0, 2, 2))
    sb = _segments(b, j) if tb != POINT else np.zeros((0, 2, 2))
    if len(sa) == 0 and len(sb) == 0:
        d = pa[:, None] - pb[None, :]
        d2 = (d * d).sum(-1)
        ki, kj = np.unravel_index(int(np.argmin(d2)), d2.shape)
        return pa[ki], pb[kj]
    if len(sa) == 0:
        p, q, _ = _pt_segs_nearest(pa, sb)
        return p, q
    if len(sb) == 0:
        q, p, _ = _pt_segs_nearest(pb, sa)
        return p, q
    p1, q1, d1 = _pt_segs_nearest(
        np.concatenate([sa[:, 0], sa[:, 1]]), sb
    )
    q2, p2, d2 = _pt_segs_nearest(
        np.concatenate([sb[:, 0], sb[:, 1]]), sa
    )
    return (p1, q1) if d1 <= d2 else (p2, q2)


# ----------------------------------------------------------- pair predicates


def pair_intersects(a: GeometryArray, i: int, b: GeometryArray, j: int) -> bool:
    """GEOS ST_Intersects semantics (boundary touch counts)."""
    ta, tb = a.part_types(i), b.part_types(j)
    pa, pb = _points(a, i), _points(b, j)
    if len(pa) == 0 or len(pb) == 0:
        return False
    if ta == POINT and tb == POINT:
        d = np.abs(pa[:, None] - pb[None, :]).max(axis=-1)
        return bool((d <= _EPS).any())
    if ta == POINT:
        return pair_intersects(b, j, a, i) if tb != POINT else False
    # a is line/polygon
    if tb == POINT:
        if ta == POLYGON:
            return bool(points_in_polygon(pb, a, i).any())
        return bool((_pt_seg_dist(pb, _segments(a, i)) <= _EPS).any())
    sa, sb = _segments(a, i), _segments(b, j)
    if segments_intersect_matrix(sa, sb).any():
        return True
    if ta == POLYGON and len(pb) and points_in_polygon(pb[:1], a, i).any():
        return True
    if tb == POLYGON and len(pa) and points_in_polygon(pa[:1], b, j).any():
        return True
    return False


def pair_contains(a: GeometryArray, i: int, b: GeometryArray, j: int,
                  proper: bool = False) -> bool:
    """a contains b (GEOS: interior intersection + b within a).

    proper=False -> ST_Covers-ish boundary-tolerant; proper follows
    ST_Contains (boundary-only b not contained) approximately.
    """
    ta, tb = a.part_types(i), b.part_types(j)
    if ta != POLYGON:
        if ta == POINT:
            # a (multi)point covers b iff b is a (multi)point whose every
            # point coincides with one of a's
            if tb != POINT:
                return False
            pa_, pb_ = _points(a, i), _points(b, j)
            if len(pa_) == 0 or len(pb_) == 0:
                return False
            d = np.abs(pb_[:, None] - pa_[None, :]).max(axis=-1)
            return bool((d.min(axis=1) <= _EPS).all())
        # ta is a line: it can cover points and (sub)lines, never polygons
        if tb == POLYGON:
            return False
        sa = _segments(a, i)
        if len(sa) == 0:
            return False
        if tb == POINT:
            return bool(
                (_pt_seg_dist(_points(b, j), sa).min(axis=1) <= _EPS).all()
            )
        # line covers line: every vertex AND segment midpoint of b lies on
        # a segment of a (approximation: exact when a's collinear chains
        # aren't interrupted mid-segment of b)
        sb = _segments(b, j)
        probes = _points(b, j)
        if len(sb):
            probes = np.concatenate([probes, 0.5 * (sb[:, 0] + sb[:, 1])])
        return bool((_pt_seg_dist(probes, sa).min(axis=1) <= _EPS).all())
    pb = _points(b, j)
    if len(pb) == 0:
        return False
    if not points_in_polygon(pb, a, i, boundary_counts=True).all():
        return False
    if tb == POINT:
        if proper:
            return bool(points_in_polygon(pb, a, i, boundary_counts=False).any())
        return True
    # all vertices inside; ensure no boundary crossing pushes b outside
    sa, sb = _segments(a, i), _segments(b, j)
    m = segments_intersect_matrix(sa, sb)
    if m.any():
        # crossings allowed only if they are touches (no proper crossing)
        p1, p2 = sa[:, None, 0], sa[:, None, 1]
        q1, q2 = sb[None, :, 0], sb[None, :, 1]
        d1 = _cross(q1, q2, p1)
        d2 = _cross(q1, q2, p2)
        d3 = _cross(p1, p2, q1)
        d4 = _cross(p1, p2, q2)
        proper_x = (
            ((d1 > _EPS) & (d2 < -_EPS) | (d1 < -_EPS) & (d2 > _EPS))
            & ((d3 > _EPS) & (d4 < -_EPS) | (d3 < -_EPS) & (d4 > _EPS))
        )
        if proper_x.any():
            return False
        # also: midpoints of b's segments must stay inside
        mids = 0.5 * (sb[:, 0] + sb[:, 1])
        if not points_in_polygon(mids, a, i, boundary_counts=True).all():
            return False
    if proper:
        # at least one point of b strictly interior
        test_pts = np.concatenate([pb, 0.5 * (sb[:, 0] + sb[:, 1])]) if len(
            sb
        ) else pb
        return bool(
            points_in_polygon(test_pts, a, i, boundary_counts=False).any()
        )
    return True


def pair_distance(a: GeometryArray, i: int, b: GeometryArray, j: int) -> float:
    """ST_Distance: 0 if intersecting, else min boundary distance."""
    ta, tb = a.part_types(i), b.part_types(j)
    pa, pb = _points(a, i), _points(b, j)
    if len(pa) == 0 or len(pb) == 0:
        return np.inf
    if pair_intersects(a, i, b, j):
        return 0.0
    if ta == POINT and tb == POINT:
        d = pa[:, None] - pb[None, :]
        return float(np.sqrt((d * d).sum(-1)).min())
    if ta == POINT:
        return float(_pt_seg_dist(pa, _segments(b, j)).min())
    if tb == POINT:
        return float(_pt_seg_dist(pb, _segments(a, i)).min())
    return min_distance_segments(_segments(a, i), _segments(b, j))


def pair_touches(a: GeometryArray, i: int, b: GeometryArray, j: int) -> bool:
    """Boundaries intersect but interiors do not."""
    if not pair_intersects(a, i, b, j):
        return False
    return not _interiors_intersect(a, i, b, j)


def pair_crosses(a: GeometryArray, i: int, b: GeometryArray, j: int) -> bool:
    """DE-9IM crosses: interiors intersect, dims differ (or line/line with
    point-intersection), neither contains the other."""
    ta, tb = a.part_types(i), b.part_types(j)
    if not _interiors_intersect(a, i, b, j):
        return False
    if ta == tb == LINESTRING:
        # line/line crosses if they properly cross (not overlap)
        sa, sb = _segments(a, i), _segments(b, j)
        p1, p2 = sa[:, None, 0], sa[:, None, 1]
        q1, q2 = sb[None, :, 0], sb[None, :, 1]
        d1, d2 = _cross(q1, q2, p1), _cross(q1, q2, p2)
        d3, d4 = _cross(p1, p2, q1), _cross(p1, p2, q2)
        return bool(
            (
                ((d1 > _EPS) & (d2 < -_EPS) | (d1 < -_EPS) & (d2 > _EPS))
                & ((d3 > _EPS) & (d4 < -_EPS) | (d3 < -_EPS) & (d4 > _EPS))
            ).any()
        )
    if ta == tb:
        return False
    if pair_contains(a, i, b, j) or pair_contains(b, j, a, i):
        return False
    return True


def pair_overlaps(a: GeometryArray, i: int, b: GeometryArray, j: int) -> bool:
    """Same dim, interiors intersect, neither contains the other."""
    if a.part_types(i) != b.part_types(j):
        return False
    if not _interiors_intersect(a, i, b, j):
        return False
    return not (pair_contains(a, i, b, j) or pair_contains(b, j, a, i))


def pair_equals(a: GeometryArray, i: int, b: GeometryArray, j: int) -> bool:
    """Topological equality (ST_Equals): same point set. Points compare
    by normalized coordinate set; lines and polygons by mutual coverage
    (robust to ring rotation/orientation, vertex subdivision and
    traversal-order differences — a vertex-set compare alone called two
    different polylines through the same vertices equal)."""
    ta, tb = a.part_types(i), b.part_types(j)
    if ta != tb:
        return False
    if ta == POINT:
        pa = np.unique(_points(a, i).round(9), axis=0)
        pb = np.unique(_points(b, j).round(9), axis=0)
        return pa.shape == pb.shape and bool(np.array_equal(pa, pb))
    return pair_contains(a, i, b, j) and pair_contains(b, j, a, i)


def _interiors_intersect(a: GeometryArray, i: int, b: GeometryArray, j: int) -> bool:
    """Do the interiors share a point? Approximated via proper segment
    crossings / strict point-in-polygon probes."""
    ta, tb = a.part_types(i), b.part_types(j)
    pa, pb = _points(a, i), _points(b, j)
    if ta == POINT:
        if tb == POLYGON:
            return bool(points_in_polygon(pa, b, j, boundary_counts=False).any())
        if tb == POINT:
            d = np.abs(pa[:, None] - pb[None, :]).max(axis=-1)
            return bool((d <= _EPS).any())
        # point interior ∩ line interior: on segment but not endpoint
        return bool((_pt_seg_dist(pa, _segments(b, j)) <= _EPS).any())
    if tb == POINT:
        return _interiors_intersect(b, j, a, i)
    sa, sb = _segments(a, i), _segments(b, j)
    p1, p2 = sa[:, None, 0], sa[:, None, 1]
    q1, q2 = sb[None, :, 0], sb[None, :, 1]
    d1, d2 = _cross(q1, q2, p1), _cross(q1, q2, p2)
    d3, d4 = _cross(p1, p2, q1), _cross(p1, p2, q2)
    proper_x = (
        ((d1 > _EPS) & (d2 < -_EPS) | (d1 < -_EPS) & (d2 > _EPS))
        & ((d3 > _EPS) & (d4 < -_EPS) | (d3 < -_EPS) & (d4 > _EPS))
    )
    if ta == POLYGON and tb == POLYGON:
        if proper_x.any():
            return True
        # containment / vertex strictly inside
        if points_in_polygon(pb, a, i, boundary_counts=False).any():
            return True
        if points_in_polygon(pa, b, j, boundary_counts=False).any():
            return True
        # identical polygons / edge-sharing overlap: probe midpoints +
        # a representative interior point of each against the other
        ra = _rep_point(a, i)
        rb = _rep_point(b, j)
        if ra is not None and points_in_polygon(ra[None], b, j, False).any():
            return True
        if rb is not None and points_in_polygon(rb[None], a, i, False).any():
            return True
        return False
    if ta == POLYGON or tb == POLYGON:
        poly, pi, other, oi = (a, i, b, j) if ta == POLYGON else (b, j, a, i)
        if proper_x.any():
            return True
        so = _segments(other, oi)
        if len(so):
            mids = 0.5 * (so[:, 0] + so[:, 1])
            return bool(points_in_polygon(mids, poly, pi, False).any())
        return False
    # line / line: proper crossing or collinear overlap
    if proper_x.any():
        return True
    # collinear overlap: midpoint of one seg on the other
    mids = 0.5 * (sb[:, 0] + sb[:, 1])
    return bool((_pt_seg_dist(mids, sa) <= _EPS).any())


def _rep_point(arr: GeometryArray, i: int) -> np.ndarray | None:
    """A point in the interior of polygon i (scan ray midpoints)."""
    for p in range(arr.geom_offsets[i], arr.geom_offsets[i + 1]):
        r0 = arr.part_offsets[p]
        ring = arr.coords[arr.ring_offsets[r0] : arr.ring_offsets[r0 + 1]]
        if len(ring) < 4:
            continue
        cen = ring[:-1].mean(axis=0)
        if points_in_polygon(cen[None], arr, i, boundary_counts=False)[0]:
            return cen
        # fallback: midpoints between centroid-ish candidates
        for k in range(len(ring) - 1):
            cand = 0.5 * (ring[k] + 0.5 * (ring[(k + 1) % (len(ring) - 1)] + cen))
            if points_in_polygon(cand[None], arr, i, boundary_counts=False)[0]:
                return cand
    return None


PREDICATES = {
    "intersects": pair_intersects,
    "disjoint": lambda a, i, b, j: not pair_intersects(a, i, b, j),
    "contains": lambda a, i, b, j: pair_contains(a, i, b, j, proper=True),
    "within": lambda a, i, b, j: pair_contains(b, j, a, i, proper=True),
    "covers": lambda a, i, b, j: pair_contains(a, i, b, j, proper=False),
    "coveredby": lambda a, i, b, j: pair_contains(b, j, a, i, proper=False),
    "touches": pair_touches,
    "crosses": pair_crosses,
    "overlaps": pair_overlaps,
    "equals": pair_equals,
}
