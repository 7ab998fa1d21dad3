"""Robust polygon boolean operations via winding-number trapezoid sweep.

This is the engine's replacement for GEOS overlay (ST_Intersection /
ST_Difference / ST_Union / aggregate ST_Union — the kernels behind the
reference's intersection (_geoops_sql.py:1805-2102), difference
(:1058-1356), union (:3089-3292) and dissolve's shapely.union_all
(_geoops_gpd.py:2341-2346)).

Algorithm (robust by construction — no perturbation):
1. Collect oriented segments of both inputs (outer rings CCW, holes CW).
2. Horizontal slab decomposition: breakpoints = every endpoint y plus the
   y of every proper pairwise segment crossing (segments are never split —
   a crossing only adds a slab boundary, so within a slab active segments
   are x-ordered consistently).
3. Per slab, sort active segments by x at the slab midline and accumulate
   winding numbers per input (downward segment = +1, upward = -1 when
   walking +x, matching CCW-outer orientation). A strip between adjacent
   segments is kept iff ``keep(windA, windB)``.
4. Kept strips merge into trapezoids; trapezoid boundary edges cancel on
   shared horizontal slab lines by exact interval arithmetic; remaining
   directed edges chain into rings with a leftmost-turn rule (interior on
   the left), so touching-at-a-point components stay separate rings.

Degenerate incidences (shared edges, T-junctions, identical polygons)
produce zero-width strips that are dropped exactly — results are exact
for inputs whose crossings are exactly representable (e.g. the integer /
half-integer lattices of our test layers) and accurate to ~1e-12·extent
otherwise.

The n-ary ``union_many`` runs the same sweep once over all inputs with
keep = (winding > 0): O((n + k) log n) for the whole dissolve group, not
an incremental pairwise loop.
"""

from __future__ import annotations

import math

import numpy as np

from .overlay import ensure_ccw, ensure_closed, ring_signed_area

Parts = list  # list[list[np.ndarray]] — [ [outer, hole, ...], ... ]


# ------------------------------------------------------- segment collection


def _parts_to_segments(parts: Parts) -> np.ndarray:
    """(m, 4) array x0,y0,x1,y1 of oriented ring segments; outers forced
    CCW, holes forced CW."""
    chunks = []
    for part in parts:
        for k, ring in enumerate(part):
            ring = ensure_closed(np.asarray(ring, dtype=np.float64))
            if len(ring) < 4:
                continue
            ring = ensure_ccw(ring)
            if k > 0:  # hole: clockwise
                ring = ring[::-1]
            seg = np.empty((len(ring) - 1, 4))
            seg[:, 0:2] = ring[:-1]
            seg[:, 2:4] = ring[1:]
            chunks.append(seg)
    if not chunks:
        return np.empty((0, 4))
    return np.concatenate(chunks, axis=0)


def _crossing_ys(segs: np.ndarray) -> np.ndarray:
    """Y coordinates of proper interior crossings between segments
    (candidates pruned by a bbox sort-sweep)."""
    m = len(segs)
    if m < 2:
        return np.empty(0)
    boxes = np.empty((m, 4))
    boxes[:, 0] = np.minimum(segs[:, 0], segs[:, 2])
    boxes[:, 1] = np.minimum(segs[:, 1], segs[:, 3])
    boxes[:, 2] = np.maximum(segs[:, 0], segs[:, 2])
    boxes[:, 3] = np.maximum(segs[:, 1], segs[:, 3])
    # sort-sweep on minx, candidate pairs enumerated fully vectorized
    # (one repeat/arange for all (i, j>i, minx_j <= maxx_i) windows)
    order = np.argsort(boxes[:, 0], kind="stable")
    b = boxes[order]
    hi = np.searchsorted(b[:, 0], b[:, 2], side="right")
    counts = np.maximum(hi[: m - 1] - np.arange(1, m), 0)
    P = int(counts.sum())
    if P == 0:
        return np.empty(0)
    ii = np.repeat(np.arange(m - 1, dtype=np.int64), counts)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    jj = (ii + 1) + (np.arange(P, dtype=np.int64) - np.repeat(base, counts))
    mask = (b[jj, 1] <= b[ii, 3]) & (b[jj, 3] >= b[ii, 1])
    if not mask.any():
        return np.empty(0)
    ig = order[ii[mask]]
    jg = order[jj[mask]]
    p1 = segs[ig, 0:2]
    r = segs[ig, 2:4] - p1
    q1 = segs[jg, 0:2]
    s = segs[jg, 2:4] - q1
    denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    ok = np.abs(denom) > 1e-300
    qp = q1 - p1
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / denom
        u = (qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) / denom
    tol = 1e-12
    proper = ok & (t > tol) & (t < 1 - tol) & (u > tol) & (u < 1 - tol)
    if not proper.any():
        return np.empty(0)
    return p1[proper, 1] + t[proper] * r[proper, 1]


# ----------------------------------------------------------------- the sweep


def _x_at(segs: np.ndarray, idx: np.ndarray, y: float) -> np.ndarray:
    """Exact-at-endpoints interpolation of x on segments idx at height y."""
    y0 = segs[idx, 1]
    y1 = segs[idx, 3]
    t = (y - y0) / (y1 - y0)
    return segs[idx, 0] * (1.0 - t) + segs[idx, 2] * t


def _sweep(segs: np.ndarray, tags: np.ndarray, keep) -> Parts:
    """Core sweep. ``tags`` ∈ {0,1} assigns segments to input A/B;
    ``keep(windA, windB) -> bool array`` decides strip membership."""
    if len(segs) == 0:
        return []
    dy = segs[:, 3] - segs[:, 1]
    nz = dy != 0
    segs = segs[nz]
    tags = tags[nz]
    if len(segs) == 0:
        return []
    dy = segs[:, 3] - segs[:, 1]
    ymin = np.minimum(segs[:, 1], segs[:, 3])
    ymax = np.maximum(segs[:, 1], segs[:, 3])
    ys = np.concatenate([segs[:, 1], segs[:, 3], _crossing_ys(segs)])
    ys = np.unique(ys)
    # merge breakpoints closer than 1e-9 (float noise from crossings)
    if len(ys) > 1:
        keep_y = np.empty(len(ys), dtype=bool)
        keep_y[0] = True
        keep_y[1:] = np.diff(ys) > 1e-9
        ys = ys[keep_y]

    delta = np.where(dy < 0, 1, -1)  # walking +x: downward edge enters CCW
    dA = np.where(tags == 0, delta, 0)
    dB = np.where(tags == 1, delta, 0)

    side_edges: list[tuple[float, float, float, float]] = []  # directed p0->p1
    hline: dict[float, list[tuple[float, float, int]]] = {}

    # strip→segment incidence lists, built vectorized (replaces an O(m)
    # active-set scan PER STRIP — quadratic on big unions — with one
    # repeat/argsort over total incidences)
    nstrips = len(ys) - 1
    mids = 0.5 * (ys[:-1] + ys[1:])
    si0 = np.searchsorted(mids, ymin, side="right")
    si1 = np.searchsorted(mids, ymax, side="left")
    counts = np.maximum(si1 - si0, 0)
    seg_of_inc = np.repeat(np.arange(len(segs), dtype=np.int64), counts)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    strip_of_inc = np.repeat(si0, counts) + (
        np.arange(len(seg_of_inc), dtype=np.int64) - np.repeat(base, counts)
    )
    inc_order = np.argsort(strip_of_inc, kind="stable")
    inc_seg = seg_of_inc[inc_order]
    inc_strip = strip_of_inc[inc_order]
    strip_starts = np.searchsorted(inc_strip, np.arange(nstrips + 1))

    for si in range(nstrips):
        lo_i, hi_i = strip_starts[si], strip_starts[si + 1]
        if hi_i - lo_i < 2:
            continue
        y0, y1 = ys[si], ys[si + 1]
        mid = mids[si]
        act = inc_seg[lo_i:hi_i]
        xm = _x_at(segs, act, mid)
        order = np.argsort(xm, kind="stable")
        sa = act[order]
        wA = np.cumsum(dA[sa])
        wB = np.cumsum(dB[sa])
        kf = keep(wA[:-1], wB[:-1])  # strip between seg k and k+1
        if not kf.any():
            continue
        # maximal kept runs
        padded = np.concatenate([[False], kf, [False]])
        starts = np.flatnonzero(~padded[:-1] & padded[1:])
        ends = np.flatnonzero(padded[:-1] & ~padded[1:])  # exclusive
        for s, e in zip(starts, ends):
            li, ri = sa[s], sa[e]
            xl0 = float(_x_at(segs, np.array([li]), y0)[0])
            xl1 = float(_x_at(segs, np.array([li]), y1)[0])
            xr0 = float(_x_at(segs, np.array([ri]), y0)[0])
            xr1 = float(_x_at(segs, np.array([ri]), y1)[0])
            area2 = (xr0 - xl0) + (xr1 - xl1)
            if area2 <= 0:
                continue  # zero-width / degenerate strip
            # CCW: bottom →, right ↑, top ←, left ↓
            side_edges.append((xr0, y0, xr1, y1))
            side_edges.append((xl1, y1, xl0, y0))
            if xr0 > xl0:
                hline.setdefault(y0, []).append((xl0, xr0, 1))
            if xr1 > xl1:
                hline.setdefault(y1, []).append((xl1, xr1, -1))

    edges = list(side_edges)
    for y, ivals in hline.items():
        edges.extend(_resolve_horizontal(y, ivals))
    return _chain_rings(edges)


def _resolve_horizontal(y: float, ivals) -> list[tuple[float, float, float, float]]:
    """Cancel bottom (+1, rightward) vs top (-1, leftward) intervals on one
    horizontal line; emit surviving directed edges."""
    xs = sorted({round(x, 9) for a, b, _ in ivals for x in (a, b)})
    if len(xs) < 2:
        return []
    xs_arr = np.asarray(xs)
    net = np.zeros(len(xs) - 1, dtype=np.int64)
    for a, b, sgn in ivals:
        i0 = np.searchsorted(xs_arr, round(a, 9))
        i1 = np.searchsorted(xs_arr, round(b, 9))
        net[i0:i1] += sgn
    out = []
    for k in range(len(net)):
        if net[k] > 0:  # rightward (interior above)
            out.append((xs[k], y, xs[k + 1], y))
        elif net[k] < 0:  # leftward (interior below)
            out.append((xs[k + 1], y, xs[k], y))
    return out


def _vkey(x: float, y: float) -> tuple[float, float]:
    return (round(x, 9), round(y, 9))


def _chain_rings(edges) -> Parts:
    """Chain directed edges into rings (leftmost-turn at junctions: rotate
    CCW from the incoming direction, take the first outgoing edge — keeps
    interior on the left, separates point-touching components)."""
    # drop zero-length (after rounding) edges — they arise from exact
    # crossings where two segments evaluate to the same x at a slab line
    # and would corrupt the turn-angle logic at junction vertices
    edges = [e for e in edges if _vkey(e[0], e[1]) != _vkey(e[2], e[3])]
    if not edges:
        return []
    out_map: dict[tuple[float, float], list[int]] = {}
    for k, (x0, y0, x1, y1) in enumerate(edges):
        out_map.setdefault(_vkey(x0, y0), []).append(k)
    used = np.zeros(len(edges), dtype=bool)
    rings: list[np.ndarray] = []
    for start in range(len(edges)):
        if used[start]:
            continue
        ring_pts = []
        cur = start
        while True:
            used[cur] = True
            x0, y0, x1, y1 = edges[cur]
            ring_pts.append((x0, y0))
            key = _vkey(x1, y1)
            cands = [k for k in out_map.get(key, []) if not used[k]]
            if not cands:
                break
            if len(cands) == 1:
                cur = cands[0]
            else:
                din = math.atan2(y1 - y0, x1 - x0)
                best, best_ang = None, None
                for k in cands:
                    a0, b0, a1, b1 = edges[k]
                    ang = (math.atan2(b1 - b0, a1 - a0) - din) % (2 * math.pi)
                    if ang <= 1e-12:
                        ang += 2 * math.pi
                    if best is None or ang < best_ang:
                        best, best_ang = k, ang
                cur = best
            if cur == start:
                break
        if len(ring_pts) >= 3:
            ring = _drop_collinear(np.asarray(ring_pts))
            if len(ring) >= 3 and abs(ring_signed_area(ring)) > 1e-300:
                rings.append(ensure_closed(ring))
    return _assemble_parts(rings)


def _drop_collinear(pts: np.ndarray) -> np.ndarray:
    """Remove vertices collinear with their neighbours (trapezoid stacking
    produces runs of collinear corners along one source segment).

    Collinearity is ANGLE-based (|cross| ≤ eps·|e1|·|e2|, i.e. sin of the
    turn angle below eps) — an absolute threshold scaled by coordinate
    magnitude deletes genuinely non-collinear micro-corners (e.g. the
    wall↔arc junctions of a finely sampled circle), visibly deforming
    rings."""
    n = len(pts)
    if n < 3:
        return pts
    prv = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    e1 = pts - prv
    e2 = nxt - pts
    cross = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    l1 = np.hypot(e1[:, 0], e1[:, 1])
    l2 = np.hypot(e2[:, 0], e2[:, 1])
    dup = (l1 == 0) | (l2 == 0)
    keep = (np.abs(cross) > 1e-10 * l1 * l2) & ~dup
    if keep.sum() < 3:
        return pts[keep]
    return pts[keep]


def _assemble_parts(rings: list[np.ndarray]) -> Parts:
    """Outer/hole classification by signed area (the chaining rule emits
    outers CCW and holes CW), then hole→outer assignment by containment."""
    outers = []
    holes = []
    for r in rings:
        if ring_signed_area(r) >= 0:
            outers.append(r)
        else:
            holes.append(r)
    if not outers:
        return []
    parts: Parts = [[o] for o in outers]
    if holes:
        from .overlay import point_in_ring

        areas = [abs(ring_signed_area(o)) for o in outers]
        order = np.argsort(areas)  # smallest enclosing outer wins
        for h in holes:
            probe = h[:-1].mean(axis=0)
            for oi in order:
                if point_in_ring(probe, outers[oi][:-1]):
                    parts[oi].append(h)
                    break
    return parts


# ------------------------------------------------------------ public surface


def _keep_fn(op: str):
    if op == "intersection":
        return lambda wa, wb: (wa > 0) & (wb > 0)
    if op == "union":
        return lambda wa, wb: (wa > 0) | (wb > 0)
    if op == "difference":
        return lambda wa, wb: (wa > 0) & (wb <= 0)
    if op == "symmetric_difference":
        return lambda wa, wb: (wa > 0) != (wb > 0)
    raise ValueError(op)


def boolean_op(a_parts: Parts, b_parts: Parts, op: str) -> Parts:
    """Overlay two (multi)polygons given as parts lists."""
    sa = _parts_to_segments(a_parts)
    sb = _parts_to_segments(b_parts)
    segs = np.concatenate([sa, sb], axis=0) if len(sb) else sa
    tags = np.concatenate(
        [np.zeros(len(sa), dtype=np.int8), np.ones(len(sb), dtype=np.int8)]
    )
    return _sweep(segs, tags, _keep_fn(op))


def union_many(parts_list: list[Parts]) -> Parts:
    """One-shot n-ary union (dissolve kernel): winding > 0 over the whole
    segment soup."""
    segs_list = [_parts_to_segments(p) for p in parts_list]
    segs_list = [s for s in segs_list if len(s)]
    if not segs_list:
        return []
    segs = np.concatenate(segs_list, axis=0)
    tags = np.zeros(len(segs), dtype=np.int8)
    return _sweep(segs, tags, lambda wa, wb: wa > 0)
