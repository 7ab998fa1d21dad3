"""Polygon overlay (intersection / union / difference) from scratch.

Replaces the GEOS/Spatialite overlay functions the reference leans on
(ST_Intersection/ST_Difference/ST_Union — geofileops _geoops_sql.py
intersection :1805-2102, difference :1058-1356, dissolve union
_geoops_gpd.py:2341-2346) with a numpy Greiner–Hormann clipper plus a
Sutherland–Hodgman rectangle clipper for tile clipping.

Scope / robustness contract (documented, tested):
* rings are simple (non-self-intersecting); holes are supported on input
  by ring recursion and can be produced by union (classified by
  containment);
* degenerate incidences (vertex-on-edge, collinear overlapping edges) are
  handled by deterministic micro-perturbation of the subject polygon
  (eps = 1e-9 × bbox scale, retried with growing eps) — results are exact
  up to that perturbation, which is far below the gridsize/tolerance the
  reference itself applies (GFO_SLIVER_TOLERANCE default 0.001,
  helpers/_options.py:575).
"""

from __future__ import annotations

import numpy as np

from .array import MULTIPOLYGON, POLYGON, GeometryArray

_EPS = 1e-12


# ----------------------------------------------------------- ring utilities


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area; closes the ring implicitly if open."""
    x, y = ring[:, 0], ring[:, 1]
    s = float((x[:-1] * y[1:] - x[1:] * y[:-1]).sum())
    if len(ring) and (x[0] != x[-1] or y[0] != y[-1]):
        s += float(x[-1] * y[0] - x[0] * y[-1])
    return 0.5 * s


def ensure_closed(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.concatenate([ring, ring[:1]])
    return ring


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if ring_signed_area(ring) >= 0 else ring[::-1].copy()


def _open(ring: np.ndarray) -> np.ndarray:
    """Drop the closing duplicate vertex."""
    ring = ensure_closed(np.asarray(ring, dtype=np.float64))
    return ring[:-1]


def point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    """Crossing number; boundary points undefined (callers perturb)."""
    x, y = pt
    rx, ry = ring[:, 0], ring[:, 1]
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    return int((cond & (x < xint)).sum()) % 2 == 1


# --------------------------------------------- Sutherland–Hodgman rect clip


def clip_ring_rect(ring: np.ndarray, rect: tuple[float, float, float, float]) -> np.ndarray:
    """Clip a closed ring to an axis-aligned rectangle (convex clip —
    Sutherland–Hodgman, exact & robust). Returns closed ring (possibly
    empty). Used for dissolve clip-to-tile (_geoops_gpd.py:2070-2083)."""
    minx, miny, maxx, maxy = rect
    pts = _open(ring)

    def clip_half(pts, inside, intersect):
        if len(pts) == 0:
            return pts
        keep = inside(pts)
        out = []
        n = len(pts)
        for k in range(n):
            cur, nxt = pts[k], pts[(k + 1) % n]
            cin, nin = keep[k], keep[(k + 1) % n]
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return np.array(out) if out else np.empty((0, 2))

    def ix(axis, val):
        def f(a, b):
            t = (val - a[axis]) / (b[axis] - a[axis])
            p = a + t * (b - a)
            p[axis] = val
            return p

        return f

    pts = clip_half(pts, lambda p: p[:, 0] >= minx, ix(0, minx))
    pts = clip_half(pts, lambda p: p[:, 0] <= maxx, ix(0, maxx))
    pts = clip_half(pts, lambda p: p[:, 1] >= miny, ix(1, miny))
    pts = clip_half(pts, lambda p: p[:, 1] <= maxy, ix(1, maxy))
    if len(pts) < 3:
        return np.empty((0, 2))
    return ensure_closed(pts)


# ------------------------------------------------------- Greiner–Hormann core


class _Vtx:
    __slots__ = ("xy", "nxt", "prv", "inter", "entry", "neighbor", "alpha", "visited")

    def __init__(self, xy):
        self.xy = xy
        self.nxt = None
        self.prv = None
        self.inter = False
        self.entry = True
        self.neighbor = None
        self.alpha = 0.0
        self.visited = False


def _build_list(ring: np.ndarray) -> _Vtx:
    verts = [_Vtx(ring[k].copy()) for k in range(len(ring))]
    n = len(verts)
    for k in range(n):
        verts[k].nxt = verts[(k + 1) % n]
        verts[k].prv = verts[(k - 1) % n]
    return verts[0]


def _iter_ring(head: _Vtx):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _edge_pairs(head: _Vtx):
    """Yield (v, v_next_nonintersection) original edges."""
    v = head
    while True:
        if not v.inter:
            w = v.nxt
            while w.inter:
                w = w.nxt
            yield v, w
        v = v.nxt
        if v is head:
            break


def _seg_intersect(p1, p2, q1, q2):
    """Proper intersection params (t, u) in (0,1) or None; degenerate -> 'DEGEN'."""
    r = p2 - p1
    s = q2 - q1
    denom = r[0] * s[1] - r[1] * s[0]
    qp = q1 - p1
    if abs(denom) < _EPS:
        # parallel: check collinear overlap -> degenerate
        if abs(qp[0] * r[1] - qp[1] * r[0]) < _EPS * max(1.0, np.abs(r).max()):
            # collinear — overlap test
            rr = (r * r).sum()
            if rr > 0:
                t0 = (qp * r).sum() / rr
                t1 = ((q2 - p1) * r).sum() / rr
                if max(min(t0, t1), 0) <= min(max(t0, t1), 1):
                    return "DEGEN"
        return None
    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    u = (qp[0] * r[1] - qp[1] * r[0]) / denom
    tol = 1e-11
    if -tol < t < tol or 1 - tol < t < 1 + tol or -tol < u < tol or 1 - tol < u < 1 + tol:
        if -tol <= t <= 1 + tol and -tol <= u <= 1 + tol:
            return "DEGEN"
        return None
    if 0 < t < 1 and 0 < u < 1:
        return (t, u)
    return None


class _Degenerate(Exception):
    pass


def _insert_sorted(v_from: _Vtx, v_to: _Vtx, newv: _Vtx):
    """Insert newv between v_from..v_to ordered by alpha."""
    cur = v_from
    while cur.nxt is not v_to and cur.nxt.inter and cur.nxt.alpha < newv.alpha:
        cur = cur.nxt
    newv.nxt = cur.nxt
    newv.prv = cur
    cur.nxt.prv = newv
    cur.nxt = newv


def _gh_clip(subj: np.ndarray, clip: np.ndarray, op: str) -> list[np.ndarray]:
    """Greiner–Hormann on two simple CCW open rings. op in
    {intersection, union, difference}. Returns list of closed rings.
    Raises _Degenerate when input is in special position."""
    s_head = _build_list(subj)
    c_head = _build_list(clip)

    any_inter = False
    for sv, sw in list(_edge_pairs(s_head)):
        for cv, cw in list(_edge_pairs(c_head)):
            res = _seg_intersect(sv.xy, sw.xy, cv.xy, cw.xy)
            if res == "DEGEN":
                raise _Degenerate()
            if res is None:
                continue
            t, u = res
            xy = sv.xy + t * (sw.xy - sv.xy)
            a = _Vtx(xy.copy())
            b = _Vtx(xy.copy())
            a.inter = b.inter = True
            a.neighbor, b.neighbor = b, a
            a.alpha, b.alpha = t, u
            _insert_sorted(sv, sw, a)
            _insert_sorted(cv, cw, b)
            any_inter = True

    s_in_c = point_in_ring(subj[0], clip)
    c_in_s = point_in_ring(clip[0], subj)

    if not any_inter:
        # containment / disjoint cases
        if op == "intersection":
            if s_in_c:
                return [ensure_closed(subj)]
            if c_in_s:
                return [ensure_closed(clip)]
            return []
        if op == "union":
            if s_in_c:
                return [ensure_closed(clip)]
            if c_in_s:
                return [ensure_closed(subj)]
            return [ensure_closed(subj), ensure_closed(clip)]
        if op == "difference":
            if s_in_c:
                return []
            if c_in_s:
                # subject with clip as hole — return both, caller classifies
                return [ensure_closed(subj), ensure_closed(clip[::-1].copy())]
            return [ensure_closed(subj)]

    # entry/exit marking
    def mark(head, start_inside, invert):
        inside = start_inside
        for v in _iter_ring(head):
            if v.inter:
                v.entry = (not inside) ^ invert
                inside = not inside

    if op == "intersection":
        mark(s_head, s_in_c, invert=False)
        mark(c_head, c_in_s, invert=False)
    elif op == "union":
        mark(s_head, s_in_c, invert=True)
        mark(c_head, c_in_s, invert=True)
    else:  # difference: subject normal, clip inverted
        mark(s_head, s_in_c, invert=False)
        mark(c_head, c_in_s, invert=True)

    results = []
    while True:
        start = None
        for v in _iter_ring(s_head):
            if v.inter and not v.visited:
                start = v
                break
        if start is None:
            break
        ring = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    ring.append(cur.xy)
                    cur = cur.nxt
                    if cur.inter:
                        break
            else:
                while True:
                    ring.append(cur.xy)
                    cur = cur.prv
                    if cur.inter:
                        break
            cur = cur.neighbor
            if cur.visited:
                break
        if len(ring) >= 3:
            results.append(ensure_closed(np.array(ring)))
    return results


def _perturb(ring: np.ndarray, eps: float, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return ring + rng.uniform(-eps, eps, size=ring.shape)


def overlay_rings(
    subj: np.ndarray, clip: np.ndarray, op: str
) -> list[np.ndarray]:
    """Robust wrapper: GH with deterministic perturbation retries."""
    subj = ensure_ccw(_open(subj))
    clip = ensure_ccw(_open(clip))
    if len(subj) < 3:
        return [ensure_closed(clip)] if op == "union" and len(clip) >= 3 else []
    if len(clip) < 3:
        if op in ("difference",) or op == "union":
            return [ensure_closed(subj)]
        return []
    scale = max(
        np.abs(subj).max(), np.abs(clip).max(), 1.0
    )
    for attempt in range(4):
        try:
            s = subj if attempt == 0 else _perturb(subj, scale * 1e-9 * (10 ** attempt), 42 + attempt)
            return _gh_clip(s, clip, op)
        except _Degenerate:
            continue
    # final fallback: coarser perturbation
    s = _perturb(subj, scale * 1e-6, 99)
    try:
        return _gh_clip(s, clip, op)
    except _Degenerate:
        # give up: conservative answers
        if op == "union":
            return [ensure_closed(subj), ensure_closed(clip)]
        if op == "difference":
            return [ensure_closed(subj)]
        return []


# ------------------------------------------------- polygon-level operations


def _rings_to_parts(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Classify closed rings into polygon parts with holes by containment
    (a ring inside an odd number of others is a hole of its smallest
    container)."""
    if not rings:
        return []
    areas = [abs(ring_signed_area(r)) for r in rings]
    order = np.argsort(areas)[::-1]  # big to small
    parts: list[list[np.ndarray]] = []
    part_outer_idx: list[int] = []
    for oi in order:
        r = rings[oi]
        probe = r[:-1].mean(axis=0)
        # choose a point inside r for container tests
        container = None
        for pi in range(len(parts) - 1, -1, -1):
            outer = rings[part_outer_idx[pi]]
            if point_in_ring(probe, outer[:-1]):
                inside_hole = any(
                    point_in_ring(probe, h[:-1]) for h in parts[pi][1:]
                )
                if not inside_hole:
                    container = pi
                    break
        if container is None:
            parts.append([ensure_ccw(r)])
            part_outer_idx.append(oi)
        else:
            parts[container].append(ensure_ccw(r)[::-1].copy())  # hole: CW
    return parts


def _poly_parts(arr: GeometryArray, i: int) -> list[list[np.ndarray]]:
    """Parts (rings lists) of polygon geometry i."""
    return arr._parts_of(i)


def polygon_overlay(
    a_parts: list[list[np.ndarray]],
    b_parts: list[list[np.ndarray]],
    op: str,
) -> list[list[np.ndarray]]:
    """Overlay two (multi)polygons given as lists of parts (each part =
    [outer, hole...]). Returns result parts. Holes on input are applied by
    subtracting them after the outer-ring overlay."""
    a_parts = [p for p in a_parts if len(p) and len(p[0]) >= 4]
    b_parts = [p for p in b_parts if len(p) and len(p[0]) >= 4]

    def subtract_holes(rings: list[np.ndarray], holes: list[np.ndarray]):
        """difference of ring-set minus each hole ring."""
        cur = rings
        for h in holes:
            nxt: list[np.ndarray] = []
            for r in cur:
                nxt.extend(overlay_rings(r, h, "difference"))
            cur = nxt
        return cur

    if op == "intersection":
        out_rings: list[np.ndarray] = []
        for pa in a_parts:
            for pb in b_parts:
                rings = overlay_rings(pa[0], pb[0], "intersection")
                rings = subtract_holes(rings, pa[1:] + pb[1:])
                out_rings.extend(rings)
        return _rings_to_parts(out_rings)

    if op == "difference":
        out_rings = []
        for pa in a_parts:
            cur = [ensure_closed(ensure_ccw(_open(pa[0])))]
            for pb in b_parts:
                nxt = []
                for r in cur:
                    res = overlay_rings(r, pb[0], "difference")
                    # re-add the part of r overlapped by pb's holes
                    for hb in pb[1:]:
                        res.extend(overlay_rings(r, hb, "intersection"))
                    nxt.extend(res)
                cur = nxt
            # subject's own holes
            cur = subtract_holes(cur, pa[1:])
            out_rings.extend(cur)
        return _rings_to_parts(out_rings)

    if op == "union":
        # incremental component union; each component = [outer, holes...].
        # Merging part B into component A maintains the exact hole set:
        #   holes' = gaps(outer', A0∪B0)
        #          ∪ {hA − B0} ∪ {hA ∩ hB} ∪ {hB − A0}
        # (gaps from different merge steps are disjoint by construction).
        pending: list[list[np.ndarray]] = [
            [ensure_closed(ensure_ccw(_open(p[0])))]
            + [ensure_closed(r) for r in p[1:]]
            for p in a_parts + b_parts
        ]
        components: list[list[np.ndarray]] = []
        while pending:
            cur = pending.pop()
            changed = True
            while changed:
                changed = False
                for k in range(len(pending) - 1, -1, -1):
                    other = pending[k]
                    if not _bbox_overlap(cur[0], other[0]):
                        continue
                    res = overlay_rings(cur[0], other[0], "union")
                    if len(res) == 1:
                        outer, gaps = res[0], []
                    elif len(res) >= 2:
                        big = max(res, key=lambda r: abs(ring_signed_area(r)))
                        others = [r for r in res if r is not big]
                        if all(
                            point_in_ring(o[:-1].mean(axis=0), big[:-1])
                            for o in others
                        ):
                            outer, gaps = big, others
                        else:
                            continue  # genuinely disjoint
                    else:
                        continue
                    new_holes: list[np.ndarray] = list(gaps)
                    for h in cur[1:]:
                        new_holes.extend(overlay_rings(h, other[0], "difference"))
                        for hb in other[1:]:
                            new_holes.extend(overlay_rings(h, hb, "intersection"))
                    for hb in other[1:]:
                        new_holes.extend(overlay_rings(hb, cur[0], "difference"))
                    cur = [outer] + [
                        h for h in new_holes if abs(ring_signed_area(h)) > 1e-300
                    ]
                    pending.pop(k)
                    changed = True
            components.append(cur)
        final: list[list[np.ndarray]] = []
        for comp in components:
            if len(comp) == 1:
                final.append([ensure_ccw(comp[0])])
            else:
                final.extend(
                    _rings_to_parts([comp[0]] + [ensure_ccw(h) for h in comp[1:]])
                )
        return final

    raise ValueError(op)


def _bbox_overlap(r1: np.ndarray, r2: np.ndarray) -> bool:
    return bool(
        r1[:, 0].min() <= r2[:, 0].max()
        and r1[:, 0].max() >= r2[:, 0].min()
        and r1[:, 1].min() <= r2[:, 1].max()
        and r1[:, 1].max() >= r2[:, 1].min()
    )


def parts_to_geom(parts: list[list[np.ndarray]]) -> tuple[int, list[list[np.ndarray]]]:
    """(type_code, parts) for GeometryArray.from_parts."""
    parts = [p for p in parts if len(p) and len(p[0]) >= 4]
    if not parts:
        return POLYGON, []
    closed = [[ensure_closed(r) for r in p] for p in parts]
    return (POLYGON if len(closed) == 1 else MULTIPOLYGON), closed


def union_all_parts(parts_list: list[list[list[np.ndarray]]]) -> list[list[np.ndarray]]:
    """Union many (multi)polygons: flatten to parts and run polygon_overlay
    union with an empty second operand."""
    flat = [p for parts in parts_list for p in parts]
    if not flat:
        return []
    return polygon_overlay(flat, [], "union")
