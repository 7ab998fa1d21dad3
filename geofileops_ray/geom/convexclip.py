"""Vectorized Sutherland-Hodgman clipping of convex single-ring polygons
by axis-aligned rectangles.

This is the batched fast path for convex x rect overlay pairs (the
reference computes each such pair with a GEOS ST_Intersection call inside
its SQL templates, _geoops_sql.py:1000-1028; here ONE numpy pass handles
every pair in a batch). The general trapezoid sweep in boolops.py remains
the fallback for non-convex / multi-ring operands.
"""

from __future__ import annotations

import numpy as np

from .array import POLYGON, GeometryArray

# pairs whose polygon has more open vertices than this skip the padded
# kernel (padding cost grows with the max, and huge convex rings are rare)
MAX_CONVEX_VERTS = 64


def convex_single_ring(ga: GeometryArray) -> np.ndarray:
    """bool[n]: row is a single-part, single-ring POLYGON whose ring is
    convex (consecutive-edge cross products never change sign).
    Memoized per array — every two-layer fast-path probe calls this on
    the same (broadcast) array."""
    cached = getattr(ga, "_convex_single_ring_cache", None)
    if cached is None:
        cached = _convex_single_ring_impl(ga)
        try:
            ga._convex_single_ring_cache = cached
        except AttributeError:
            pass
    return cached


def _convex_single_ring_impl(ga: GeometryArray) -> np.ndarray:
    n = len(ga)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    geo, po, ro = ga.geom_offsets, ga.part_offsets, ga.ring_offsets
    one_part = (geo[1:] - geo[:-1]) == 1
    cand = (ga.types == POLYGON) & one_part
    if not cand.any():
        return out
    p0 = geo[:-1]
    one_ring = np.zeros(n, dtype=bool)
    one_ring[cand] = (po[p0[cand] + 1] - po[p0[cand]]) == 1
    cand &= one_ring
    if not cand.any():
        return out
    ci = np.flatnonzero(cand)
    r0 = po[p0[ci]]
    s = ro[r0]
    e = ro[r0 + 1]
    m = e - s  # closed point count
    ok = m >= 4
    ci, s, m = ci[ok], s[ok], m[ok]
    if not len(ci):
        return out
    # open vertex sequence per ring: coords[s : s+m-1]; edges are cyclic
    k = m - 1
    tot = int(k.sum())
    starts = np.zeros(len(ci), dtype=np.int64)
    np.cumsum(k[:-1], out=starts[1:])
    local = np.arange(tot, dtype=np.int64) - np.repeat(starts, k)
    base = np.repeat(s, k)
    kk = np.repeat(k, k)
    cur = base + local
    nxt = base + np.where(local + 1 < kk, local + 1, 0)
    nx2 = base + np.where(local + 2 < kk, local + 2, local + 2 - kk)
    xy = ga.coords
    e1x = xy[nxt, 0] - xy[cur, 0]
    e1y = xy[nxt, 1] - xy[cur, 1]
    e2x = xy[nx2, 0] - xy[nxt, 0]
    e2y = xy[nx2, 1] - xy[nxt, 1]
    cross = e1x * e2y - e1y * e2x
    pos = cross > 1e-300
    neg = cross < -1e-300
    rid = np.repeat(np.arange(len(ci), dtype=np.int64), k)
    npos = np.bincount(rid, weights=pos, minlength=len(ci))
    nneg = np.bincount(rid, weights=neg, minlength=len(ci))
    out[ci] = (npos == 0) | (nneg == 0)
    return out


def _gather_open_rings(
    ga: GeometryArray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(P, cnt): padded (n, V, 2) open-vertex rings of single-ring rows
    ``idx``, oriented CCW."""
    geo, po, ro = ga.geom_offsets, ga.part_offsets, ga.ring_offsets
    r0 = po[geo[idx]]
    s = ro[r0]
    e = ro[r0 + 1]
    cnt = (e - s - 1).astype(np.int64)  # open count
    n = len(idx)
    V = int(cnt.max())
    P = np.zeros((n, V, 2))
    slot = np.arange(V)
    valid = slot[None, :] < cnt[:, None]
    src = s[:, None] + slot[None, :]
    P[valid] = ga.coords[src[valid]]
    # orient CCW: shoelace over the padded cyclic ring
    area2 = _shoelace2(P, cnt)
    cw = area2 < 0
    if cw.any():
        rev = cnt[:, None] - 1 - slot[None, :]
        sel = cw[:, None] & valid
        Pr = P.copy()
        rows = np.nonzero(sel)
        Pr[rows[0], rows[1]] = P[rows[0], rev[rows]]
        P = Pr
    return P, cnt


def _shoelace2(P: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Twice the signed area of each padded cyclic ring."""
    n, V, _ = P.shape
    slot = np.arange(V)
    valid = slot[None, :] < cnt[:, None]
    nxt = np.where(slot[None, :] + 1 < cnt[:, None], slot[None, :] + 1, 0)
    rows = np.arange(n)[:, None].repeat(V, axis=1)
    xn = P[rows, nxt, 0]
    yn = P[rows, nxt, 1]
    term = (P[:, :, 0] * yn - xn * P[:, :, 1]) * valid
    return term.sum(axis=1)


def _clip_halfplane(
    P: np.ndarray, cnt: np.ndarray, c: np.ndarray, axis: int, keep_ge: bool
) -> tuple[np.ndarray, np.ndarray]:
    """One Sutherland-Hodgman pass: keep coord[axis] >= c (or <= c).
    ``c`` is per-row. Returns a (n, V+1, 2) padded array + new counts."""
    n, V, _ = P.shape
    slot = np.arange(V)
    valid = slot[None, :] < cnt[:, None]
    a = P[:, :, axis]
    inside = (a >= c[:, None]) if keep_ge else (a <= c[:, None])
    inside &= valid
    prev_slot = np.where(slot[None, :] > 0, slot[None, :] - 1, cnt[:, None] - 1)
    prev_slot = np.clip(prev_slot, 0, V - 1)
    rows = np.arange(n)[:, None].repeat(V, axis=1)
    prev_in = inside[rows, prev_slot]
    crossing = (inside != prev_in) & valid
    emit = crossing.astype(np.int64) + inside.astype(np.int64)
    flat = emit.reshape(-1)
    pos = np.cumsum(flat) - flat
    pos = pos.reshape(n, V)
    row_base = pos[:, 0]
    local = pos - row_base[:, None]
    new_cnt = emit.sum(axis=1)
    Vo = V + 1
    out = np.zeros((n, Vo, 2))
    # intersection points (prev -> cur crosses the line)
    if crossing.any():
        r, sl = np.nonzero(crossing)
        ps = prev_slot[r, sl]
        p0 = P[r, ps]
        p1 = P[r, sl]
        cc = c[r]
        denom = p1[:, axis] - p0[:, axis]
        denom = np.where(np.abs(denom) < 1e-300, 1.0, denom)
        t = (cc - p0[:, axis]) / denom
        ip = p0 + t[:, None] * (p1 - p0)
        ip[:, axis] = cc  # exact on the clip line
        out[r, local[r, sl]] = ip
    if inside.any():
        r, sl = np.nonzero(inside)
        out[r, local[r, sl] + crossing[r, sl]] = P[r, sl]
    new_cnt = np.where(new_cnt >= 3, new_cnt, 0)
    return out, new_cnt


def clip_convex_by_rects(
    ga: GeometryArray, idx: np.ndarray, rects: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Clip convex single-ring polygons ``ga[idx[k]]`` by axis-aligned
    rectangle ``rects[k] = (minx, miny, maxx, maxy)``, all pairs at once.

    Returns (P, cnt): padded (n, V, 2) CCW open rings and per-pair vertex
    counts (0 = empty intersection). Caller guarantees each idx row
    passes convex_single_ring()."""
    P, cnt = _gather_open_rings(ga, idx)
    P, cnt = _clip_halfplane(P, cnt, rects[:, 0], 0, True)
    P, cnt = _clip_halfplane(P, cnt, rects[:, 2], 0, False)
    P, cnt = _clip_halfplane(P, cnt, rects[:, 1], 1, True)
    P, cnt = _clip_halfplane(P, cnt, rects[:, 3], 1, False)
    # degenerate (zero-area) clips are empty
    area2 = _shoelace2(P, cnt)
    cnt = np.where(area2 > 1e-300, cnt, 0)
    return P, cnt


def clip_areas(P: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Area per padded ring (0 where cnt == 0)."""
    return 0.5 * np.where(cnt > 0, _shoelace2(P, cnt), 0.0)


def convex_rect_predicates(
    ga: GeometryArray,
    idx: np.ndarray,
    rects: np.ndarray,
    preds: set[str],
    swapped: bool = False,
) -> dict[str, np.ndarray]:
    """Exact named spatial predicates for (convex single-ring polygon,
    axis-aligned rect) pairs, fully vectorized via separating-axis tests
    (axes = rect's x/y + every polygon edge normal — complete SAT for a
    convex pair). ``swapped=True`` reports predicates for (rect, polygon)
    pair order (within↔contains, covers↔coveredby swap).

    Semantics mirror _rect_pair_predicates (stages/relation.py:324) and
    the generic pair predicates: inclusive boundaries, touches = boundary
    contact without interior overlap, overlaps requires mutual
    non-containment. All comparisons carry the generic path's 1e-12
    distance tolerance (geom/predicates._EPS) — sweep-produced vertices
    sit O(1e-14) off the lattice, and an exact test here would disagree
    with the generic predicates on which path a pair happens to take."""
    eps = 1e-12  # keep in sync with geom.predicates._EPS
    P, cnt = _gather_open_rings(ga, idx)  # CCW
    n, V, _ = P.shape
    slot = np.arange(V)
    valid = slot[None, :] < cnt[:, None]
    rows = np.arange(n)[:, None].repeat(V, axis=1)
    nxt = np.where(slot[None, :] + 1 < cnt[:, None], slot[None, :] + 1, 0)
    ex = P[rows, nxt, 0] - P[:, :, 0]
    ey = P[rows, nxt, 1] - P[:, :, 1]
    # inward normal of a CCW edge: polygon lies on n·p >= n·v_i; scale
    # the tolerance by |edge| so it stays a *distance* eps
    nx_ = -ey
    ny_ = ex
    elen = np.hypot(ex, ey)
    etol = eps * elen
    ref = nx_ * P[:, :, 0] + ny_ * P[:, :, 1]
    x0, y0, x1, y1 = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    rmax = nx_ * np.where(nx_ > 0, x1[:, None], x0[:, None]) + ny_ * np.where(
        ny_ > 0, y1[:, None], y0[:, None]
    )
    # zero-length edges (duplicate consecutive vertices pass
    # convex_single_ring since their cross products are 0) have a (0,0)
    # normal with ref=etol=0, so rmax<=ref+etol holds vacuously — they
    # must not vote in the separation tests
    edge_ok = valid & (elen > 0)
    sep_strict = ((rmax < ref - etol) & edge_ok).any(axis=1)
    sep_touch = ((rmax <= ref + etol) & edge_ok).any(axis=1)
    pinf = np.where(valid, P[:, :, 0], np.inf)
    pminx = pinf.min(axis=1)
    pmaxx = np.where(valid, P[:, :, 0], -np.inf).max(axis=1)
    pminy = np.where(valid, P[:, :, 1], np.inf).min(axis=1)
    pmaxy = np.where(valid, P[:, :, 1], -np.inf).max(axis=1)
    bb_inter = (
        (pminx <= x1 + eps) & (pmaxx >= x0 - eps)
        & (pminy <= y1 + eps) & (pmaxy >= y0 - eps)
    )
    bb_strict = (
        (pminx < x1 - eps) & (pmaxx > x0 + eps)
        & (pminy < y1 - eps) & (pmaxy > y0 + eps)
    )
    inter = bb_inter & ~sep_strict
    interiors = bb_strict & ~sep_touch
    # polygon within closed rect: every vertex inside
    vin = (
        (P[:, :, 0] >= x0[:, None] - eps)
        & (P[:, :, 0] <= x1[:, None] + eps)
        & (P[:, :, 1] >= y0[:, None] - eps)
        & (P[:, :, 1] <= y1[:, None] + eps)
    )
    cov_rect_over_poly = (vin | ~valid).all(axis=1)  # poly coveredby rect
    # rect within closed polygon: all 4 corners on the inward side of
    # every edge
    cov_poly_over_rect = np.ones(n, dtype=bool)
    for cx, cy in ((x0, y0), (x1, y0), (x1, y1), (x0, y1)):
        inside = (
            (nx_ * cx[:, None] + ny_ * cy[:, None] >= ref - etol) | ~valid
        ).all(axis=1)
        cov_poly_over_rect &= inside
    eq = cov_poly_over_rect & cov_rect_over_poly
    # pair order: A = the convex polygon, B = the rect (swap afterwards)
    covAB, covBA = cov_poly_over_rect, cov_rect_over_poly
    out: dict[str, np.ndarray] = {}
    for p in preds:
        if p == "intersects":
            v = inter
        elif p == "disjoint":
            v = ~inter
        elif p == "touches":
            v = inter & ~interiors
        elif p == "covers":
            v = covBA if swapped else covAB
        elif p == "coveredby":
            v = covAB if swapped else covBA
        elif p == "contains":
            v = (covBA if swapped else covAB) & interiors
        elif p == "within":
            v = (covAB if swapped else covBA) & interiors
        elif p == "equals":
            v = eq
        elif p == "overlaps":
            v = interiors & ~covAB & ~covBA
        elif p == "crosses":
            v = np.zeros(n, dtype=bool)
        else:  # pragma: no cover - caller filters to NAMED_PREDICATES
            raise KeyError(p)
        out[p] = v
    return out


def convex_convex_interiors(
    ga1: GeometryArray, ia: np.ndarray, ga2: GeometryArray, ib: np.ndarray
) -> np.ndarray:
    """bool per pair: the two convex single-ring polygons' INTERIORS
    intersect ('intersects and not touches') — complete SAT over both
    polygons' edge normals, vectorized with pair chunking so the
    (pairs × edges × vertices) projection temporaries stay bounded.
    Same 1e-12 distance tolerance as convex_rect_predicates / the
    generic predicates. Callers guarantee convex_single_ring() rows."""
    eps = 1e-12
    m = len(ia)
    if m == 0:
        return np.zeros(0, dtype=bool)
    out = np.zeros(m, dtype=bool)
    b1 = ga1.bounds()[ia]
    b2 = ga2.bounds()[ib]
    bb_strict = (
        (b1[:, 0] < b2[:, 2] - eps)
        & (b1[:, 2] > b2[:, 0] + eps)
        & (b1[:, 1] < b2[:, 3] - eps)
        & (b1[:, 3] > b2[:, 1] + eps)
    )
    cand = np.flatnonzero(bb_strict)
    if len(cand) == 0:
        return out
    P1, c1 = _gather_open_rings(ga1, ia[cand])
    P2, c2 = _gather_open_rings(ga2, ib[cand])

    def _sep_touch(PA, cA, PB, cB):
        """True per pair: some edge normal of A separates (allowing
        boundary contact within eps) A from B."""
        n, V, _ = PA.shape
        VB = PB.shape[1]
        slot = np.arange(V)
        validA = slot[None, :] < cA[:, None]
        rows = np.arange(n)[:, None].repeat(V, axis=1)
        nxt = np.where(slot[None, :] + 1 < cA[:, None], slot[None, :] + 1, 0)
        ex = PA[rows, nxt, 0] - PA[:, :, 0]
        ey = PA[rows, nxt, 1] - PA[:, :, 1]
        nx_, ny_ = -ey, ex  # inward normal of a CCW edge
        elen = np.hypot(ex, ey)
        # a zero-length edge (duplicate consecutive vertex) has a (0,0)
        # normal with ref=etol=0 — bmax<=ref always holds, falsely
        # declaring the pair separated; mask it out of the vote
        validA = validA & (elen > 0)
        etol = eps * elen
        ref = nx_ * PA[:, :, 0] + ny_ * PA[:, :, 1]
        res = np.zeros(n, dtype=bool)
        chunk = max(1, (1 << 22) // max(V * VB, 1))
        validB = np.arange(VB)[None, :] < cB[:, None]
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            proj = (
                nx_[s:e, :, None] * PB[s:e, None, :, 0]
                + ny_[s:e, :, None] * PB[s:e, None, :, 1]
            )
            proj = np.where(validB[s:e, None, :], proj, -np.inf)
            bmax = proj.max(axis=2)
            res[s:e] = ((bmax <= ref[s:e] + etol[s:e]) & validA[s:e]).any(
                axis=1
            )
        return res

    sep = _sep_touch(P1, c1, P2, c2) | _sep_touch(P2, c2, P1, c1)
    out[cand] = ~sep
    return out


def padded_to_wkb(P: np.ndarray, cnt: np.ndarray) -> list[bytes | None]:
    """WKB POLYGON per padded ring via the vectorized slab encoder;
    None where cnt == 0. Consecutive duplicate vertices (a vertex exactly
    on a clip line emits twice) are dropped first."""
    from .wkb import to_wkb

    n, V, _ = P.shape
    slot = np.arange(V)
    valid = slot[None, :] < cnt[:, None]
    prev_slot = np.where(slot[None, :] > 0, slot[None, :] - 1, cnt[:, None] - 1)
    prev_slot = np.clip(prev_slot, 0, V - 1)
    rows = np.arange(n)[:, None].repeat(V, axis=1)
    dup = (
        (P[:, :, 0] == P[rows, prev_slot, 0])
        & (P[:, :, 1] == P[rows, prev_slot, 1])
        & valid
        & (cnt[:, None] > 1)
    )
    keep = valid & ~dup
    kcnt = keep.sum(axis=1)
    nonempty = kcnt >= 3
    if not nonempty.any():
        return [None] * n
    # flat closed rings: kept vertices in slot order + repeat of first
    ne = np.flatnonzero(nonempty)
    closed = kcnt[ne] + 1
    total = int(closed.sum())
    coords = np.empty((total, 2))
    ring_off = np.zeros(len(ne) + 1, dtype=np.int64)
    np.cumsum(closed, out=ring_off[1:])
    r, sl = np.nonzero(keep[ne])
    # position within each ring = running index minus the ring's start
    starts = np.zeros(len(ne), dtype=np.int64)
    np.cumsum(kcnt[ne][:-1], out=starts[1:])
    within = np.arange(len(r), dtype=np.int64) - starts[r]
    coords[ring_off[r] + within] = P[ne[r], sl]
    first_rows = np.arange(len(ne))
    coords[ring_off[first_rows + 1] - 1] = coords[ring_off[first_rows]]
    m = len(ne)
    arr = GeometryArray(
        types=np.full(m, POLYGON, dtype=np.int8),
        geom_offsets=np.arange(m + 1, dtype=np.int64),
        part_offsets=np.arange(m + 1, dtype=np.int64),
        ring_offsets=ring_off,
        coords=coords,
    )
    blobs = to_wkb(arr)
    out: list[bytes | None] = [None] * n
    for pos, i in enumerate(ne):
        out[int(i)] = blobs[pos]
    return out
