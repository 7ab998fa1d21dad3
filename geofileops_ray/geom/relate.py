"""General DE-9IM matrix computation for arbitrary geometry pairs.

ST_Relate analogue covering polygon/line/point combinations; the
reference passes raw masks through Spatialite ST_RelateMatch
(_geoops_sql.py:2516-2578).  The matrix is derived measure-theoretically
from the repo's own kernels instead of a topology graph:

* interior∩interior of polygons  -> area of the boolean-sweep overlay;
* boundary/line cells            -> clipped lengths (line×polygon clip,
                                    collinear segment overlap);
* dim-0 cells                    -> classified segment-intersection and
                                    endpoint tests.

Valid (non-self-intersecting, positive-area / positive-length) inputs
are assumed, which rules out the degenerate lower-dimension cells a
topology graph would catch (e.g. polygon interiors meeting in a point).
"""

from __future__ import annotations

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
from .overlay import ensure_closed, polygon_overlay, ring_signed_area
from .predicates import points_in_polygon

_EPS = 1e-9


def type_dim(arr: GeometryArray, i: int) -> int:
    t = int(arr.types[i])
    if t in (POINT, MULTIPOINT):
        return 0
    if t in (LINESTRING, MULTILINESTRING):
        return 1
    if t in (POLYGON, MULTIPOLYGON):
        return 2
    return -1  # MISSING / empty


def _parts_area(parts: list[list[np.ndarray]]) -> float:
    tot = 0.0
    for part in parts:
        if not part:
            continue
        tot += abs(ring_signed_area(part[0]))
        for hole in part[1:]:
            tot -= abs(ring_signed_area(hole))
    return tot


def _poly_boundary_segs(arr: GeometryArray, i: int) -> np.ndarray:
    """(m,4) [x0,y0,x1,y1] segments of every ring of polygon i."""
    segs = []
    for part in arr._parts_of(i):
        for ring in part:
            rr = ensure_closed(np.asarray(ring, dtype=np.float64))
            if len(rr) >= 2:
                e = np.empty((len(rr) - 1, 4))
                e[:, :2] = rr[:-1]
                e[:, 2:] = rr[1:]
                segs.append(e)
    return np.concatenate(segs) if segs else np.empty((0, 4))


def _line_segs(arr: GeometryArray, i: int) -> np.ndarray:
    segs = []
    for part in arr._parts_of(i):
        for ln in part:
            ln = np.asarray(ln, dtype=np.float64)
            if len(ln) >= 2:
                e = np.empty((len(ln) - 1, 4))
                e[:, :2] = ln[:-1]
                e[:, 2:] = ln[1:]
                segs.append(e)
    return np.concatenate(segs) if segs else np.empty((0, 4))


def _line_boundary_points(arr: GeometryArray, i: int) -> np.ndarray:
    """Mod-2 boundary of a (multi)linestring: endpoints with odd valence
    (OGC boundary rule; closed rings have no boundary)."""
    ends: list[tuple[float, float]] = []
    for part in arr._parts_of(i):
        for ln in part:
            ln = np.asarray(ln, dtype=np.float64)
            if len(ln) >= 2:
                ends.append((float(ln[0, 0]), float(ln[0, 1])))
                ends.append((float(ln[-1, 0]), float(ln[-1, 1])))
    if not ends:
        return np.empty((0, 2))
    pts = np.asarray(ends)
    out = []
    used = np.zeros(len(pts), dtype=bool)
    for k in range(len(pts)):
        if used[k]:
            continue
        same = (np.abs(pts - pts[k]) <= _EPS).all(axis=1)
        used |= same
        if int(same.sum()) % 2 == 1:
            out.append(pts[k])
    return np.asarray(out) if out else np.empty((0, 2))


def _seg_lengths(segs: np.ndarray) -> np.ndarray:
    return np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])


def _collinear_overlap_len(sa: np.ndarray, sb: np.ndarray) -> float:
    """Total length of sa's portions that lie collinearly on sb
    (1-dimensional intersection of the two segment sets, measured on sa).
    Intervals are unioned per sa-segment so overlapping sb segments are
    not double counted."""
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    total = 0.0
    b0, b1 = sb[:, :2], sb[:, 2:]
    for k in range(len(sa)):
        p = sa[k, :2]
        q = sa[k, 2:]
        r = q - p
        rn2 = float(r @ r)
        if rn2 < 1e-300:
            continue
        rn = np.sqrt(rn2)
        # collinear sb segments: both endpoints within eps of the sa line
        d0 = np.abs((b0[:, 0] - p[0]) * r[1] - (b0[:, 1] - p[1]) * r[0]) / rn
        d1 = np.abs((b1[:, 0] - p[0]) * r[1] - (b1[:, 1] - p[1]) * r[0]) / rn
        col = (d0 <= _EPS) & (d1 <= _EPS)
        if not col.any():
            continue
        t0 = ((b0[col, 0] - p[0]) * r[0] + (b0[col, 1] - p[1]) * r[1]) / rn2
        t1 = ((b1[col, 0] - p[0]) * r[0] + (b1[col, 1] - p[1]) * r[1]) / rn2
        lo = np.clip(np.minimum(t0, t1), 0.0, 1.0)
        hi = np.clip(np.maximum(t0, t1), 0.0, 1.0)
        keep = hi - lo > 1e-12
        if not keep.any():
            continue
        ivs = sorted(zip(lo[keep], hi[keep]))
        cur_lo, cur_hi = ivs[0]
        ln = 0.0
        for a, b in ivs[1:]:
            if a > cur_hi:
                ln += cur_hi - cur_lo
                cur_lo, cur_hi = a, b
            else:
                cur_hi = max(cur_hi, b)
        ln += cur_hi - cur_lo
        total += ln * rn
    return total


def _seg_intersection_points(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """(k,2) points where sa and sb meet: proper crossings plus
    endpoint-on-segment touches.  Collinear-overlap interiors are NOT
    enumerated (callers handle dim-1 overlap separately) but overlap
    interval endpoints are included."""
    pts: list[np.ndarray] = []
    if len(sa) == 0 or len(sb) == 0:
        return np.empty((0, 2))
    p = sa[:, None, :2]
    r = sa[:, None, 2:] - p
    q = sb[None, :, :2]
    s = sb[None, :, 2:] - q
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q - p
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / denom
        u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / denom
    ok = (
        (np.abs(denom) > 1e-300)
        & (t >= -1e-12) & (t <= 1 + 1e-12)
        & (u >= -1e-12) & (u <= 1 + 1e-12)
    )
    if ok.any():
        ia, ib = np.nonzero(ok)
        pts.append(p[ia, 0] + t[ia, ib, None] * r[ia, 0])
    # endpoints of one set lying on a collinear segment of the other
    for ends, segs in ((sa.reshape(-1, 2, 2).reshape(-1, 2), sb),
                       (sb.reshape(-1, 2, 2).reshape(-1, 2), sa)):
        if len(ends) == 0 or len(segs) == 0:
            continue
        d = _pts_to_segs_dist(ends, segs)
        on = d.min(axis=1) <= _EPS
        if on.any():
            pts.append(ends[on])
    if not pts:
        return np.empty((0, 2))
    return np.concatenate(pts)


def _pts_to_segs_dist(pts: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """(npts, nsegs) point-to-segment distances."""
    if len(pts) == 0 or len(segs) == 0:
        return np.full((len(pts), max(len(segs), 1)), np.inf)
    a = segs[None, :, :2]
    d = segs[None, :, 2:] - a
    ln2 = (d * d).sum(axis=2)
    w = pts[:, None, :] - a
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip((w * d).sum(axis=2) / np.where(ln2 == 0, 1, ln2), 0, 1)
    proj = a + t[..., None] * d
    diff = pts[:, None, :] - proj
    return np.hypot(diff[..., 0], diff[..., 1])


def _on_any_seg(pts: np.ndarray, segs: np.ndarray) -> np.ndarray:
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    if len(segs) == 0:
        return np.zeros(len(pts), dtype=bool)
    return _pts_to_segs_dist(pts, segs).min(axis=1) <= _EPS


def _near_any_point(pts: np.ndarray, ref: np.ndarray) -> np.ndarray:
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    if len(ref) == 0:
        return np.zeros(len(pts), dtype=bool)
    d = np.hypot(
        pts[:, None, 0] - ref[None, :, 0], pts[:, None, 1] - ref[None, :, 1]
    )
    return d.min(axis=1) <= _EPS


def _clip_line_len_closed(line_segs: np.ndarray, arr: GeometryArray,
                          j: int) -> float:
    """Length of line_segs ∩ closed polygon j (inside-or-on)."""
    from .overlay import line_polygon_overlay

    if len(line_segs) == 0:
        return 0.0
    parts = [[np.array([[s[0], s[1]], [s[2], s[3]]])] for s in line_segs]
    pieces = line_polygon_overlay(parts, arr, np.array([j]), "intersection")
    return float(sum(np.hypot(*(pc[1] - pc[0])) for pc in pieces))


def _transpose(m: str) -> str:
    return "".join(m[3 * (k % 3) + k // 3] for k in range(9))


def _point_coords(arr: GeometryArray, i: int) -> np.ndarray:
    out = []
    for part in arr._parts_of(i):
        for ring in part:
            for c in np.asarray(ring, dtype=np.float64).reshape(-1, 2):
                out.append(c)
    return np.asarray(out) if out else np.empty((0, 2))


def _classify_points_vs_polygon(
    pts: np.ndarray, arr: GeometryArray, j: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(in_interior, on_boundary, in_exterior) boolean arrays."""
    if len(pts) == 0:
        z = np.zeros(0, dtype=bool)
        return z, z, z
    closed = points_in_polygon(pts, arr, j, True)
    on_b = _on_any_seg(pts, _poly_boundary_segs(arr, j))
    interior = closed & ~on_b
    return interior, on_b, ~closed & ~on_b


def relate_general(ga1: GeometryArray, i: int, ga2: GeometryArray,
                   j: int) -> str:
    """Full DE-9IM matrix for an arbitrary pair (see module docstring)."""
    d1, d2 = type_dim(ga1, i), type_dim(ga2, j)
    if d1 < 0 or d2 < 0:
        return "FFFFFFFFF"
    if d1 < d2:
        return _transpose(relate_general(ga2, j, ga1, i))
    if d1 == 2 and d2 == 2:
        return _relate_poly_poly(ga1, i, ga2, j)
    if d1 == 2 and d2 == 1:
        return _relate_poly_line(ga1, i, ga2, j)
    if d1 == 2 and d2 == 0:
        return _relate_poly_point(ga1, i, ga2, j)
    if d1 == 1 and d2 == 1:
        return _relate_line_line(ga1, i, ga2, j)
    if d1 == 1 and d2 == 0:
        return _relate_line_point(ga1, i, ga2, j)
    return _relate_point_point(ga1, i, ga2, j)


def _relate_poly_poly(ga1, i, ga2, j) -> str:
    a_parts = ga1._parts_of(i)
    b_parts = ga2._parts_of(j)
    area_i = _parts_area(polygon_overlay(a_parts, b_parts, "intersection"))
    area_ab = _parts_area(polygon_overlay(a_parts, b_parts, "difference"))
    area_ba = _parts_area(polygon_overlay(b_parts, a_parts, "difference"))
    bsa = _poly_boundary_segs(ga1, i)
    bsb = _poly_boundary_segs(ga2, j)
    len_bb = _collinear_overlap_len(bsa, bsb)
    len_b_closed_a = _clip_line_len_closed(bsb, ga1, i)
    len_a_closed_b = _clip_line_len_closed(bsa, ga2, j)
    len_a = float(_seg_lengths(bsa).sum())
    len_b = float(_seg_lengths(bsb).sum())
    if len_bb > _EPS:
        bb = "1"
    else:
        pts = _seg_intersection_points(bsa, bsb)
        bb = "0" if len(pts) else "F"
    return "".join([
        "2" if area_i > _EPS else "F",
        "1" if len_b_closed_a - len_bb > _EPS else "F",
        "2" if area_ab > _EPS else "F",
        "1" if len_a_closed_b - len_bb > _EPS else "F",
        bb,
        "1" if len_a - len_a_closed_b > _EPS else "F",
        "2" if area_ba > _EPS else "F",
        "1" if len_b - len_b_closed_a > _EPS else "F",
        "2",
    ])


def _relate_poly_line(ga1, i, ga2, j) -> str:
    bsa = _poly_boundary_segs(ga1, i)
    lsb = _line_segs(ga2, j)
    bpb = _line_boundary_points(ga2, j)
    len_b = float(_seg_lengths(lsb).sum())
    len_b_closed = _clip_line_len_closed(lsb, ga1, i)
    len_b_on = _collinear_overlap_len(lsb, bsa)
    ep_int, ep_bnd, ep_ext = _classify_points_vs_polygon(bpb, ga1, i)
    # ∂A ∩ int(B): collinear overlap, else meeting points that are not
    # B's boundary endpoints
    if len_b_on > _EPS:
        bi = "1"
    else:
        pts = _seg_intersection_points(bsa, lsb)
        bi = "0" if (len(pts) and (~_near_any_point(pts, bpb)).any()) else "F"
    len_a = float(_seg_lengths(bsa).sum())
    len_a_on_b = _collinear_overlap_len(bsa, lsb)
    return "".join([
        "1" if len_b_closed - len_b_on > _EPS else "F",
        "0" if ep_int.any() else "F",
        "2",
        bi,
        "0" if ep_bnd.any() else "F",
        "1" if len_a - len_a_on_b > _EPS else "F",
        "1" if len_b - len_b_closed > _EPS else "F",
        "0" if ep_ext.any() else "F",
        "2",
    ])


def _relate_poly_point(ga1, i, ga2, j) -> str:
    pts = _point_coords(ga2, j)
    p_int, p_bnd, p_ext = _classify_points_vs_polygon(pts, ga1, i)
    return "".join([
        "0" if p_int.any() else "F",
        "F",
        "2",
        "0" if p_bnd.any() else "F",
        "F",
        "1",
        "0" if p_ext.any() else "F",
        "F",
        "2",
    ])


def _relate_line_line(ga1, i, ga2, j) -> str:
    sa, sb = _line_segs(ga1, i), _line_segs(ga2, j)
    bpa = _line_boundary_points(ga1, i)
    bpb = _line_boundary_points(ga2, j)
    len_a = float(_seg_lengths(sa).sum())
    len_b = float(_seg_lengths(sb).sum())
    len_ab = _collinear_overlap_len(sa, sb)
    len_ba = _collinear_overlap_len(sb, sa)
    pts = _seg_intersection_points(sa, sb)
    on_ba = _near_any_point(pts, bpa)
    on_bb = _near_any_point(pts, bpb)
    ii = "1" if len_ab > _EPS else (
        "0" if (len(pts) and (~on_ba & ~on_bb).any()) else "F")
    return "".join([
        ii,
        "0" if (~on_ba & on_bb).any() else "F",
        "1" if len_a - len_ab > _EPS else "F",
        "0" if (on_ba & ~on_bb).any() else "F",
        "0" if (on_ba & on_bb).any() else "F",
        "0" if (len(bpa) and (~_on_any_seg(bpa, sb)).any()) else "F",
        "1" if len_b - len_ba > _EPS else "F",
        "0" if (len(bpb) and (~_on_any_seg(bpb, sa)).any()) else "F",
        "2",
    ])


def _relate_line_point(ga1, i, ga2, j) -> str:
    pts = _point_coords(ga2, j)
    sa = _line_segs(ga1, i)
    bpa = _line_boundary_points(ga1, i)
    on_line = _on_any_seg(pts, sa)
    on_bnd = _near_any_point(pts, bpa)
    p_int = on_line & ~on_bnd
    p_ext = ~on_line
    return "".join([
        "0" if p_int.any() else "F",
        "F",
        "1",
        "0" if (on_bnd).any() else "F",
        "F",
        "0" if len(bpa) and (~_near_any_point(bpa, pts)).any() else "F",
        "0" if p_ext.any() else "F",
        "F",
        "2",
    ])


def _relate_point_point(ga1, i, ga2, j) -> str:
    pa, pb = _point_coords(ga1, i), _point_coords(ga2, j)
    a_on_b = _near_any_point(pa, pb)
    b_on_a = _near_any_point(pb, pa)
    return "".join([
        "0" if a_on_b.any() else "F",
        "F",
        "0" if (~a_on_b).any() else "F",
        "F", "F", "F",
        "0" if (~b_on_a).any() else "F",
        "F",
        "2",
    ])
